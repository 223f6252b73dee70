"""Round-4 prototype: close the last 2% on pallas_sumproduct_precise.

VERDICT r3 #1: the precise (stacked hi/lo) sum-product kernel measured
0.980e9 info bits/s — 2% under the 1e9 target. Levers swept here, all on
the REAL kernel arithmetic (stacked hi/lo split, doubled [G | G] matrix):

  * fori_loop unroll (1/2/4): a longer straight-line region lets Mosaic
    software-pipeline the check step's VPU transcendentals against the
    neighboring iteration's Gram MXU matmul (tools/proto_r3c.py swept this
    for the FAST kernels only and its result was never recorded).
  * batch tile 2048/3072/3584: docs/kernels.md records 3072 as the round-3
    winner; re-swept per unroll (pipelining changes the VMEM live-set).

Run serially on the TPU box (one device process at a time):

    python tools/proto_r4.py [minsum]
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
    _wmajor_layout, _excl_min_axis0, _tree, _make_split_mm,
    pallas_decode_minsum, pallas_decode_sumproduct)


def kernel(kind, precise, unroll, iterations, M, Wr, N,
           rx_ref, bcm2_ref, gram2_ref, padbig_ref, out_ref):
    """Kernel body with a tunable unroll — same arithmetic as
    ops/pallas_bp.py's fast kernels at the given precision mode."""
    Bt = rx_ref.shape[1]
    E = Wr * M
    big = jnp.float32(np.finfo(np.float32).max)
    split, mm = _make_split_mm(precise)
    r_in = rx_ref[:]
    bcm2 = bcm2_ref[:]                       # (N, 2E)
    bcm = bcm2[:, :E]
    G2 = gram2_ref[:]                        # (E, 2E)
    padbig = padbig_ref[:]

    def gather(x):
        return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    if kind == "minsum":
        Lci = -r_in
        base = gather(Lci) + padbig

        def check_step(Lq):
            t = Lq.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, -1.0, 1.0)
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, big)
            prod_alpha = jnp.where(min1 == 0, 0.0, P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)

        def body(_i, Lq):
            return base + mm(G2, split(check_step(Lq)))

        Lqlast = jax.lax.fori_loop(0, iterations - 1, body, base,
                                   unroll=unroll)
        Lr = check_step(Lqlast)
        LQ = Lci + mm(bcm2, split(Lr))
        out_ref[:] = (LQ < 0).astype(jnp.int8)
    else:
        r = -r_in
        deg = jnp.sum(bcm, axis=1, keepdims=True)
        degr = deg * r
        base = gather((deg - 1.0) * r) + padbig
        Mmsg0 = gather(r) + padbig

        def check_step(Mm):
            t = Mm.reshape(Wr, M, Bt)
            sg = jnp.where(t < 0, -1.0, 1.0)
            w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)),
                            -jnp.float32(1e4))
            U = _tree(jnp.add, w)
            negP = -_tree(jnp.multiply, sg)
            v = w - U
            return ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(E, Bt)

        def body(_i, Mm):
            return base + mm(G2, split(check_step(Mm)))

        Mlast = jax.lax.fori_loop(0, iterations - 1, body, Mmsg0,
                                  unroll=unroll)
        Em = check_step(Mlast)
        L = mm(bcm2, split(Em)) + degr
        out_ref[:] = (L <= 0).astype(jnp.int8)


def run(kind, unroll, rx, code, iterations=20, block_b=3072, precise=True):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    if precise:
        bcm2 = np.concatenate([bcm_np, bcm_np], axis=1)
        gram2 = np.concatenate([gram_np, gram_np], axis=1)
    else:
        bcm2, gram2 = bcm_np, gram_np
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    k = functools.partial(kernel, kind, precise, unroll, iterations,
                          code.M, Wr, N)
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
    specs = sys.argv[1:] or ["sumprod", "minsum", "sumprod_fast",
                             "minsum_fast"]
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K
    ref_fns = {"minsum": pallas_decode_minsum,
               "sumprod": pallas_decode_sumproduct}
    for spec in specs:
        kind, _, fastq = spec.partition("_")
        precise = fastq != "fast"
        mode = "precise" if precise else "fast"
        ref = np.asarray(ref_fns[kind](rx, code, iterations=20, mode=mode))
        # Mosaic's fori_loop supports only unroll=1 or full unroll
        # (= trip count, 19 at 20 iterations)
        blocks = (2048, 3072) if precise else (3072, 4096)
        for block_b in blocks:
            for unroll in (1, 19):
                try:
                    out = np.asarray(run(kind, unroll, rx, code,
                                         block_b=block_b, precise=precise))
                    agree = float((out == ref).all(axis=1).mean())
                    t = time_decode(
                        lambda r, k=kind, u=unroll, b=block_b, p=precise:
                        run(k, u, r, code, block_b=b, precise=p), rx)
                    print(f"{kind} {mode} b{block_b} unroll={unroll}: "
                          f"{t*1e3:.3f} ms ({B*K/t/1e9:.3f} Gbit/s) "
                          f"agree={agree:.5f}", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{kind} {mode} b{block_b} unroll={unroll}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
