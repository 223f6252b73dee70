"""Pallas TPU kernels for the belief-propagation inner loop.

The XLA/jnp decoders (ops/decode.py) materialize every message array in HBM
each iteration, which caps throughput at HBM bandwidth. These kernels keep
the whole BP state VMEM-resident across all iterations: per grid program a
batch tile of frames is loaded once, iterated to completion, and only the
hard decisions leave the chip.

Layout (chosen for the VPU/MXU, not a translation of the reference):
  - messages live "edge-slot major, batch minor": (M*Wr, Bt) f32, so a batch
    of frames occupies the 128-wide lane dimension and each check's Wr padded
    edge slots are adjacent sublanes -> check-node reductions (min, sign
    product) are cheap cross-sublane ops on a (M, Wr, Bt) view;
  - the variable-node step uses the identity Lq(e) = LQ(var(e)) - Lr(e)
    (exactly the reference's update form, lib/ldpc_decoder_cb_impl.cc:390)
    so no per-edge permutation between check/variable layouts is needed:
    one segment-sum matmul (B_cm: edge->variable) and one broadcast matmul
    (B_cm^T: variable->edge) per iteration, both tiny one-hot f32 matmuls
    on the MXU with exact (HIGHEST) precision.

The kernel reproduces decodeLogDomainSimple's arithmetic including sign(0)=0
and the DBL_MAX min identity (float32 max here); hard-decision equivalence to
the jnp float32 path is asserted in tests/test_pallas.py.

Known deviation: on real TPU hardware the MXU's f32 accumulation order in the
segment-sum matmul differs from the XLA path's ordered 3-term sums, so after
many iterations (~20) a rare NON-CONVERGED frame can round to different hard
decisions (measured 1/4096 frames at Eb/N0=4dB, min-sum, 20 iters; both
outputs had nonzero syndrome, i.e. the frame is a decode failure either way).
Converged frames are bit-exact across Pallas/XLA/C++-double paths — see the
TPU parity sweep in the commit history and tests/test_pallas.py (interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes import LdpcCode
from .layout import edge_layout

__all__ = ["pallas_decode_minsum", "pallas_decode_sumproduct"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _excl_prefix_sum(x: jax.Array) -> jax.Array:
    """Exclusive prefix sum along axis 1, unrolled (cumsum has no Pallas TPU
    lowering). x: (M, W, Bt) -> out[:, w] = sum of x[:, :w]."""
    W = x.shape[1]
    parts = [jnp.zeros_like(x[:, :1])]
    acc = x[:, 0:1]
    for w in range(1, W):
        parts.append(acc)
        acc = acc + x[:, w : w + 1]
    return jnp.concatenate(parts, axis=1)


def _excl_prefix_prod(x: jax.Array) -> jax.Array:
    """Exclusive prefix product along axis 1, unrolled."""
    W = x.shape[1]
    parts = [jnp.ones_like(x[:, :1])]
    acc = x[:, 0:1]
    for w in range(1, W):
        parts.append(acc)
        acc = acc * x[:, w : w + 1]
    return jnp.concatenate(parts, axis=1)


def _excl_suffix_prod(x: jax.Array) -> jax.Array:
    """Exclusive suffix product along axis 1, unrolled."""
    W = x.shape[1]
    parts = [jnp.ones_like(x[:, :1])]
    acc = x[:, W - 1 : W]
    for w in range(W - 2, -1, -1):
        parts.append(acc)
        acc = acc * x[:, w : w + 1]
    return jnp.concatenate(parts[::-1], axis=1)


def _minsum_kernel(iterations: int, M: int, Wr: int, N: int,
                   rx_ref, bcm_ref, cmask_ref, out_ref):
    """One batch tile: rx (N, Bt) -> vhat (N, Bt), fully VMEM-resident.

    Pass-count tuned: pad slots carry +FLT_MAX through the whole loop (so no
    per-iteration masking of beta/min is needed — a padded |Lq| can never win
    a minimum and its positive sign is the product identity), and the min.gt
    excluding self uses the min1/min2/first-argmin trick with an unrolled
    exclusive prefix count for the C++ first-occurrence tie rule.
    """
    Bt = rx_ref.shape[1]
    E = M * Wr
    big = jnp.float32(np.finfo(np.float32).max)

    Lci = -rx_ref[:]                      # (N, Bt)
    bcm = bcm_ref[:]                      # (N, E) one-hot: edge -> its variable
    cmask = cmask_ref[:]                  # (E, 1) 1.0 on real edges
    mask3 = cmask.reshape(M, Wr, 1) > 0

    # init: Lq(e) = Lci[var(e)] on real edges, +big on pads
    Lq0 = jax.lax.dot_general(
        bcm, Lci, (((0,), (0,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)  # (E, Bt)
    Lq0 = jnp.where(mask3.reshape(E, 1), Lq0, big)

    def body(_i, carry):
        Lq, _LQ = carry
        t = Lq.reshape(M, Wr, Bt)
        beta = jnp.abs(t)                                   # pads: +big
        neg = t < 0                                         # pads: False
        # row sign product = parity of negative count; sign(0)=0 zeroes the
        # whole row's messages (m1 == 0 iff some edge has Lq == 0)
        negcnt = jnp.sum(neg.astype(jnp.float32), axis=1, keepdims=True)
        min1 = jnp.min(beta, axis=1, keepdims=True)
        parity = 1.0 - 2.0 * (negcnt - 2.0 * jnp.floor(negcnt * 0.5))
        prod_alpha = jnp.where(min1 == 0, 0.0, parity)      # (M, 1, Bt)
        # min excluding self: first argmin slot gets the second minimum
        is_min = (beta == min1).astype(jnp.float32)
        first_min = jnp.logical_and(is_min > 0, _excl_prefix_sum(is_min) < 1.0)
        min2 = jnp.min(jnp.where(first_min, big, beta), axis=1, keepdims=True)
        min_excl = jnp.where(first_min, min2, min1)
        # Lr = prod_alpha * sign(t) * min_excl, fused as a signed select
        pame = prod_alpha * min_excl
        Lr3 = jnp.where(neg, -pame, pame)
        Lr3 = jnp.where(beta == 0, 0.0, Lr3)                # sign(0) = 0
        # pad-slot Lr values are finite garbage, but bcm's pad columns are
        # all-zero so they contribute exactly 0 to A; no masking needed here
        Lr = Lr3.reshape(E, Bt)
        # variable step: A_j = sum of Lr over the variable's checks (segment
        # sum as one-hot matmul), LQ = Lci + A, Lq(e) = LQ[var(e)] - Lr(e)
        A = jnp.dot(bcm, Lr, precision=_HIGHEST,
                    preferred_element_type=jnp.float32)     # (N, Bt)
        LQ = Lci + A
        LQE = jax.lax.dot_general(
            bcm, LQ, (((0,), (0,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)             # (E, Bt)
        Lq_new = jnp.where(mask3.reshape(E, 1), LQE - Lr, big)
        return Lq_new, LQ

    _, LQ = jax.lax.fori_loop(0, iterations, body, (Lq0, Lci))
    out_ref[:] = (LQ < 0).astype(jnp.int8)


def _sumproduct_kernel(iterations: int, M: int, Wr: int, N: int,
                       rx_ref, bcm_ref, cmask_ref, out_ref):
    """Tanh-rule SPA tile kernel (decodeSumProductSoft semantics at fixed
    iteration count; the nonstandard +r(i) per connected check is kept)."""
    Bt = rx_ref.shape[1]
    E = M * Wr
    r = -rx_ref[:]                        # (N, Bt)
    bcm = bcm_ref[:]                      # (N, E)
    cmask = cmask_ref[:]                  # (E, 1)
    mask3 = cmask.reshape(M, Wr, 1)
    # per-variable degree (number of connected checks), for the +deg*r term
    deg = jnp.sum(bcm, axis=1, keepdims=True)  # (N, 1)

    Mmsg0 = jax.lax.dot_general(
        bcm, r, (((0,), (0,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)   # (E, Bt)
    rE = jax.lax.dot_general(
        bcm, r, (((0,), (0,)), ((), ())), precision=_HIGHEST,
        preferred_element_type=jnp.float32)   # r broadcast to edges

    def body(_i, carry):
        Mmsg, _L = carry
        t = jnp.where(mask3 > 0, jnp.tanh(Mmsg.reshape(M, Wr, Bt) / 2.0), 1.0)
        # product over the row excluding self, via unrolled exclusive
        # prefix/suffix products (no division, so exact zeros are safe)
        T = _excl_prefix_prod(t) * _excl_suffix_prod(t)
        E_msg = jnp.log((1.0 + T) / (1.0 - T)).reshape(E, Bt) * cmask
        # tentative decision: L_i = sum_j (E + r_i) over connected checks
        AE = jnp.dot(bcm, E_msg, precision=_HIGHEST,
                     preferred_element_type=jnp.float32)          # (N, Bt)
        L = AE + deg * r
        # bit messages: M(e) = (sum over var's checks of (E + r)) - (E(e) + r)
        LE = jax.lax.dot_general(
            bcm, L, (((0,), (0,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)
        Mnew = (LE - E_msg - rE) * cmask
        return Mnew, L

    _, L = jax.lax.fori_loop(0, iterations, body, (Mmsg0, r))
    out_ref[:] = (L <= 0).astype(jnp.int8)


def _run(kernel_body, rx: jax.Array, code: LdpcCode, iterations: int,
         block_b: int, interpret: bool) -> jax.Array:
    lay = edge_layout(code)
    M, N, Wr = lay.M, lay.N, lay.Wr
    E = M * Wr
    B = rx.shape[0]
    # pad batch to a multiple of the tile
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    bcm = jnp.asarray(lay.B_cm, jnp.float32)                  # (N, E)
    cmask = jnp.asarray(lay.chk_mask.reshape(E, 1), jnp.float32)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(kernel_body, iterations, M, Wr, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int8),
        interpret=interpret,
    )(rx_t, bcm, cmask)
    return out[:, :B].T  # (B, N) int8


def pallas_decode_minsum(
    rx: jax.Array, code: LdpcCode, iterations: int = 20,
    block_b: int = 512, interpret: bool = False,
) -> jax.Array:
    """VMEM-resident fixed-iteration min-sum decode. rx (B, N) -> vhat (B, N)."""
    return _run(_minsum_kernel, rx, code, iterations, block_b, interpret)


def pallas_decode_sumproduct(
    rx: jax.Array, code: LdpcCode, iterations: int = 20,
    block_b: int = 512, interpret: bool = False,
) -> jax.Array:
    """VMEM-resident fixed-iteration tanh-rule SPA decode."""
    return _run(_sumproduct_kernel, rx, code, iterations, block_b, interpret)
