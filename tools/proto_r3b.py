"""Round-3b prototypes: push the parity-grade ("precise") sum-product
kernel decisively past 1e9 info bits/s (VERDICT round-2 item 1).

Measured structure of the shipped precise SPA kernel (131072 frames,
20 iterations, block 2048, v5e): per-iteration MXU work (the stacked
hi/lo Gram matmul, contraction 2E=384) ~= 2.0 ms/batch and VPU work
(check step: 2x log.tanh per edge + hi/lo split) ~= 2.2 ms/batch,
SERIALIZED by the check->split->matmul->check dependency chain: total
~4.1 ms (~0.98-1.02 Gbit/s, right on the target line).

Variants (all parity-candidates; frame agreement is checked against the
shipped precise output):

  base      — shipped phi-domain kernel, re-timed here as the control.
  skew2     — the batch tile is split into two independent half-tiles
              and the loop body interleaves them (check(A); mm(A) issued
              before check(B); mm(B)): the halves' chains are
              independent, so the Mosaic scheduler may overlap half A's
              MXU matmul with half B's VPU check step. Ideal celling
              max(MXU, VPU) instead of MXU + VPU.
  explog    — phi evaluated as u = exp(-x); w = log1p(-u) - log1p(u)
              (same function log tanh(x/2), one exp + two log1p instead
              of tanh + log per eval; fewer VPU ops if Mosaic's tanh
              lowering is exp-based anyway).
  skewlog   — skew2 + explog combined.

Run: python tools/proto_r3b.py [block_b ...]
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
from gr_ldpc_ece535a_tpu.ops.pallas_bp import (  # noqa: E402
    _wmajor_layout, _tree, pallas_decode_sumproduct)

PHI_CLAMP = np.float32(1e4)


def _gather(bcm, x):
    return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, x - hi], axis=0)


def _check_phi(Mmsg, Wr, M, Bt):
    t = Mmsg.reshape(Wr, M, Bt)
    sg = jnp.where(t < 0, -1.0, 1.0)
    w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)), -PHI_CLAMP)
    U = _tree(jnp.add, w)
    negP = -_tree(jnp.multiply, sg)
    v = w - U
    return ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(Wr * M, Bt)


def _check_explog(Mmsg, Wr, M, Bt):
    # log tanh(x/2) = log1p(-e^-x) - log1p(e^-x), x >= 0
    t = Mmsg.reshape(Wr, M, Bt)
    sg = jnp.where(t < 0, -1.0, 1.0)
    u = jnp.exp(-jnp.abs(t))
    w = jnp.maximum(jnp.log1p(-u) - jnp.log1p(u), -PHI_CLAMP)
    U = _tree(jnp.add, w)
    negP = -_tree(jnp.multiply, sg)
    v = w - U                        # v >= 0 (phi-sum excluding self)
    u2 = jnp.exp(-v)
    w2 = jnp.log1p(-u2) - jnp.log1p(u2)   # = log tanh(v/2) <= 0
    return ((negP * sg) * w2).reshape(Wr * M, Bt)


def kernel(variant, iterations, M, Wr, N,
           rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]
    bcm2 = bcm_ref[:]
    bcm = bcm2[:, :E]
    G2 = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r
    base = _gather(bcm, (deg - 1.0) * r) + padbig
    Mmsg0 = _gather(bcm, r) + padbig

    check = _check_explog if variant in ("explog", "skewlog") else _check_phi
    skew = variant in ("skew2", "skewlog")

    if not skew:
        def body(_i, carry):
            Mmsg, _Em = carry
            Em = check(Mmsg, Wr, M, Bt)
            return base + jnp.dot(G2, _split(Em),
                                  preferred_element_type=jnp.float32), Em
        _, Em = jax.lax.fori_loop(0, iterations, body,
                                  (Mmsg0, jnp.zeros_like(Mmsg0)))
        L = jnp.dot(bcm2, _split(Em), preferred_element_type=jnp.float32) + degr
        out_ref[:] = (L <= 0).astype(jnp.int8)
        return

    H = Bt // 2
    Ma0, Mb0 = Mmsg0[:, :H], Mmsg0[:, H:]
    ba, bb = base[:, :H], base[:, H:]

    def body(_i, carry):
        Ma, Mb, _Ea, _Eb = carry
        Ea = check(Ma, Wr, M, H)
        Sa = _split(Ea)
        Eb = check(Mb, Wr, M, H)          # VPU, independent of mm(Sa)
        Ma_new = ba + jnp.dot(G2, Sa, preferred_element_type=jnp.float32)
        Sb = _split(Eb)
        Mb_new = bb + jnp.dot(G2, Sb, preferred_element_type=jnp.float32)
        return Ma_new, Mb_new, Ea, Eb

    z = jnp.zeros((E, H), jnp.float32)
    _, _, Ea, Eb = jax.lax.fori_loop(0, iterations, body, (Ma0, Mb0, z, z))
    Em = jnp.concatenate([Ea, Eb], axis=1)
    L = jnp.dot(bcm2, _split(Em), preferred_element_type=jnp.float32) + degr
    out_ref[:] = (L <= 0).astype(jnp.int8)


def run(variant, rx, code, iterations=20, block_b=2048):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    bcm2 = np.concatenate([bcm_np, bcm_np], axis=1)
    gram2 = np.concatenate([gram_np, gram_np], axis=1)
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    k = functools.partial(kernel, variant, iterations, code.M, Wr, N)
    consts = [(jnp.asarray(bcm2), bcm2.shape),
              (jnp.asarray(gram2), gram2.shape),
              (jnp.asarray(padbig_np), (E, 1))]
    out = pl.pallas_call(
        k,
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
                  for _, s in consts],
        out_specs=pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int8),
    )(rx_t, *[a for a, _ in consts])
    return out[:, :B].T


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K
    ref = np.asarray(pallas_decode_sumproduct(rx, code, iterations=20,
                                              mode="precise"))
    for bb in blocks:
        for variant in ("base", "skew2", "explog", "skewlog"):
            try:
                out = np.asarray(run(variant, rx, code, block_b=bb))
                agree = float((out == ref).all(axis=1).mean())
                t = time_decode(
                    lambda r, v=variant, b=bb: run(v, r, code, block_b=b), rx)
                print(f"b{bb} spa-precise {variant:8s}: {t*1e3:.3f} ms "
                      f"({B*K/t/1e9:.3f} Gbit/s) agree={agree:.5f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"b{bb} spa-precise {variant:8s}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)




# ---------------------------------------------------------------------------
# ablation: where does the time go? (cost attribution, not parity variants)
# ---------------------------------------------------------------------------

def kernel_abl(variant, iterations, M, Wr, N,
               rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]
    bcm2 = bcm_ref[:]
    bcm = bcm2[:, :E]
    G2 = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r
    base = _gather(bcm, (deg - 1.0) * r) + padbig
    Mmsg0 = _gather(bcm, r) + padbig

    def body(_i, carry):
        Mmsg, _Em = carry
        if variant == "nocheck":     # drop transcendental check step
            Em = Mmsg * 0.9
        else:
            Em = _check_phi(Mmsg, Wr, M, Bt)
        if variant == "nomm":        # drop the MXU matmul, keep the split
            S = _split(Em)
            Mnew = base + S[:E] + S[E:]
        elif variant == "nosplit":   # single-width bf16 matmul (fast form)
            Mnew = base + jnp.dot(G2[:, :E], Em,
                                  preferred_element_type=jnp.float32)
        else:
            Mnew = base + jnp.dot(G2, _split(Em),
                                  preferred_element_type=jnp.float32)
        return Mnew, Em

    _, Em = jax.lax.fori_loop(0, iterations, body,
                              (Mmsg0, jnp.zeros_like(Mmsg0)))
    L = jnp.dot(bcm2, _split(Em), preferred_element_type=jnp.float32) + degr
    out_ref[:] = (L <= 0).astype(jnp.int8)


def run_abl(variant, rx, code, iterations=20, block_b=3072):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    bcm2 = np.concatenate([bcm_np, bcm_np], axis=1)
    gram2 = np.concatenate([gram_np, gram_np], axis=1)
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    k = functools.partial(kernel_abl, variant, iterations, code.M, Wr, N)
    consts = [(jnp.asarray(bcm2), bcm2.shape),
              (jnp.asarray(gram2), gram2.shape),
              (jnp.asarray(padbig_np), (E, 1))]
    out = pl.pallas_call(
        k,
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
                  for _, s in consts],
        out_specs=pl.BlockSpec((N, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), jnp.int8),
    )(rx_t, *[a for a, _ in consts])
    return out[:, :B].T


def main_abl():
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K
    for variant in ("full", "nocheck", "nomm", "nosplit"):
        t = time_decode(lambda r, v=variant: run_abl(v, r, code), rx)
        print(f"abl b3072 {variant:8s}: {t*1e3:.3f} ms "
              f"({B*K/t/1e9:.3f} Gbit/s)", flush=True)


if __name__ == "__main__":
    if "abl" in sys.argv[1:]:
        main_abl(); sys.exit(0)
    main()
