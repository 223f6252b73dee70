"""Prototype fast BP kernels (honest-timed). Iterated here, shipped in ops/pallas_bp.py.

Layout: w-major edge slots. Slot (w, m) = w-th edge of check m, flat index
e = w*M + m, giving arrays (Wr, M, Bt) whose reshape from (Wr*M, Bt) is a
free retiling (plane rows are whole sublane-tile groups when M % 8 == 0).
Wr = max row weight (6 for the reference code) with NO power-of-2 padding:
per-check pad slots only where row weight < Wr (24 slots vs 88 in the old
check-major Wr->8 layout), so every VPU op touches 192 rows, not 256.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bench import time_decode, _make_inputs  # noqa: E402
from gr_ldpc_ece535a_tpu.codes import get_code  # noqa: E402
from gr_ldpc_ece535a_tpu.ops import decode_sumproduct, decode_minsum  # noqa: E402

BIG = np.float32(1e30)
PHI_CLAMP = np.float32(1e4)


def _tree_prod0(x):
    """Product over axis 0 via pairwise tree (any width), keepdims."""
    w = x.shape[0]
    while w > 1:
        h = w // 2
        x = jnp.concatenate([x[:h] * x[h:2 * h], x[2 * h:]], axis=0) \
            if w % 2 else x[:h] * x[h:]
        w = x.shape[0]
    return x


def _tree_sum0(x):
    w = x.shape[0]
    while w > 1:
        h = w // 2
        x = jnp.concatenate([x[:h] + x[h:2 * h], x[2 * h:]], axis=0) \
            if w % 2 else x[:h] + x[h:]
        w = x.shape[0]
    return x


def _tree_min0(x):
    w = x.shape[0]
    while w > 1:
        h = w // 2
        x = jnp.concatenate([jnp.minimum(x[:h], x[h:2 * h]), x[2 * h:]], axis=0) \
            if w % 2 else jnp.minimum(x[:h], x[h:])
        w = x.shape[0]
    return x


def fast_layout_wmajor(code):
    """(bcm, padbig, Wr): one-hot edge->variable matrix in w-major slot order."""
    H = code.H
    M, N = H.shape
    Wr = int(H.sum(1).max())
    E = Wr * M
    bcm = np.zeros((N, E), np.float32)
    for m in range(M):
        js = np.flatnonzero(H[m])
        for w, j in enumerate(js):
            bcm[j, w * M + m] = 1.0
    pad = (bcm.sum(0) == 0).astype(np.float32)
    return bcm, (pad * BIG).reshape(E, 1), Wr


def _sp_fast_kernel(iterations, M, Wr, N, rx_ref, bcm_ref, padbig_ref, out_ref):
    """Tanh-rule SPA, log-phi domain exclusion, w-major slots.

    phi(x) = -log(tanh(x/2)) is its own inverse; check messages are
      |E(e)| = phi(sum_k phi(|M_k|) - phi(|M_e|)),  sign = prod sign excl self.
    Pads carry +BIG (phi -> 0, sign +1): self-neutral in both reductions.
    """
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]                          # (N, Bt)
    bcm = bcm_ref[:]                        # (N, E)
    padbig = padbig_ref[:]                  # (E, 1)
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r

    rE = jax.lax.dot_general(
        bcm, r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    Mmsg0 = rE + padbig

    def body(_i, carry):
        Mmsg, _L = carry
        t = Mmsg.reshape(Wr, M, Bt)
        sg = jnp.where(t < 0, -1.0, 1.0)
        # w = log(tanh(|t|/2)) <= 0; pads: log(tanh(BIG)) = 0
        w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)), -PHI_CLAMP)
        U = _tree_sum0(w)                   # (1, M, Bt)
        negP = -_tree_prod0(sg)
        v = w - U                           # phi-sum excluding self, >= 0
        # |E| = phi(v) = -log(tanh(v/2)); sign folded into negP
        Em = ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(E, Bt)
        AE = jnp.dot(bcm, Em, preferred_element_type=jnp.float32)  # (N, Bt)
        L = AE + degr
        LEr = jax.lax.dot_general(
            bcm, L - r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Mnew = (LEr + padbig) - Em
        return Mnew, L

    _, L = jax.lax.fori_loop(0, iterations, body, (Mmsg0, r))
    out_ref[:] = (L <= 0).astype(jnp.int8)


def _ms_fast_kernel(iterations, M, Wr, N, rx_ref, bcm_ref, padbig_ref, out_ref):
    """Min-sum with iota-based first-argmin, w-major slots."""
    Bt = rx_ref.shape[1]
    E = Wr * M
    big = jnp.float32(np.finfo(np.float32).max)
    Lci = -rx_ref[:]
    bcm = bcm_ref[:]
    padbig = padbig_ref[:]

    LciE = jax.lax.dot_general(
        bcm, Lci, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    Lq0 = LciE + padbig
    ii = jax.lax.broadcasted_iota(jnp.int32, (Wr, M, Bt), 0)

    def body(_i, carry):
        Lq, _LQ = carry
        t = Lq.reshape(Wr, M, Bt)
        beta = jnp.abs(t)
        sg = jnp.where(t < 0, -1.0, 1.0)
        P = _tree_prod0(sg)
        min1 = _tree_min0(beta)
        prod_alpha = jnp.where(min1 == 0, 0.0, P)       # sign(0)=0 zeroes row
        cand = jnp.where(beta == min1, ii, jnp.int32(Wr))
        amin = _tree_min0(cand)
        firstmin = ii == amin                           # first-occurrence min
        min2 = _tree_min0(jnp.where(firstmin, big, beta))
        min_excl = jnp.where(firstmin, min2, min1)
        Lr = (sg * (prod_alpha * min_excl)).reshape(E, Bt)
        A = jnp.dot(bcm, Lr, preferred_element_type=jnp.float32)
        LQ = Lci + A
        LQE = jax.lax.dot_general(
            bcm, LQ, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Lq_new = (LQE + padbig) - Lr
        return Lq_new, LQ

    _, LQ = jax.lax.fori_loop(0, iterations, body, (Lq0, Lci))
    out_ref[:] = (LQ < 0).astype(jnp.int8)


def run_fast(kernel, rx, code, iterations=20, block_b=1024, interpret=False):
    bcm_np, padbig_np, Wr = fast_layout_wmajor(code)
    N, E = bcm_np.shape
    M = code.M
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    bcm = jnp.asarray(bcm_np)
    padbig = jnp.asarray(padbig_np)
    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(kernel, M, Wr, N) if False else
        functools.partial(kernel, iterations, M, Wr, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int8),
        interpret=interpret,
    )(rx_t, bcm, padbig)
    return out[:, :B].T


def main():
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)

    rx_small = rx[:4096]
    for name, kern, ref in (
        ("sp", _sp_fast_kernel,
         lambda r: decode_sumproduct(r, code, iterations=20, early_exit=False)),
        ("ms", _ms_fast_kernel,
         lambda r: decode_minsum(r, code, iterations=20, early_exit=False)),
    ):
        vf = np.asarray(jax.jit(lambda r: run_fast(kern, r, code))(rx_small))
        vj = np.asarray(jax.jit(ref)(rx_small))
        frame_agree = (vf == vj).all(axis=1).mean()
        print(f"{name}: frame agreement vs jnp f32 = {frame_agree:.5f}")

    for bb in (512, 1024, 2048):
        ts = time_decode(lambda r, bb=bb: run_fast(_sp_fast_kernel, r, code, block_b=bb), rx)
        tm = time_decode(lambda r, bb=bb: run_fast(_ms_fast_kernel, r, code, block_b=bb), rx)
        print(f"block_b={bb:5d}: SPfast {ts*1e3:7.2f} ms ({B*32/ts/1e9:.3f} G) "
              f"| MSfast {tm*1e3:7.2f} ms ({B*32/tm/1e9:.3f} G)")


if __name__ == "__main__":
    main()
