"""Round-3c prototype: does unrolling the BP iteration loop help Mosaic?

The shipped fast kernels run a fori_loop of iterations-1 steps; an unrolled
body gives the scheduler a longer straight-line region to software-pipeline
(check-step VPU work against the Gram MXU matmul of the neighboring
iteration). jax.lax.fori_loop(unroll=k) is semantics-preserving.

Run: python tools/proto_r3c.py
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
    _wmajor_layout, _excl_min_axis0, _tree, pallas_decode_minsum,
    pallas_decode_sumproduct)


def kernel(kind, unroll, iterations, M, Wr, N,
           rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    big = jnp.float32(np.finfo(np.float32).max)
    Lci = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]

    def gather(x):
        return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    base = gather(Lci) + padbig

    if kind == "minsum":
        def check_step(Lq):
            t = Lq.reshape(Wr, M, Bt)
            beta = jnp.abs(t)
            sg = jnp.where(t < 0, -1.0, 1.0)
            P = _tree(jnp.multiply, sg)
            min_excl, min1 = _excl_min_axis0(beta, big)
            prod_alpha = jnp.where(min1 == 0, 0.0, P)
            return (sg * (prod_alpha * min_excl)).reshape(E, Bt)
    else:
        def check_step(Mm):
            t = Mm.reshape(Wr, M, Bt)
            sg = jnp.where(t < 0, -1.0, 1.0)
            w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)),
                            -jnp.float32(1e4))
            U = _tree(jnp.add, w)
            negP = -_tree(jnp.multiply, sg)
            v = w - U
            return ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(E, Bt)

    def body(_i, Lq):
        return base + jnp.dot(G, check_step(Lq),
                              preferred_element_type=jnp.float32)

    Lqlast = jax.lax.fori_loop(0, iterations - 1, body, base,
                               unroll=unroll)
    Lr = check_step(Lqlast)
    LQ = Lci + jnp.dot(bcm, Lr, preferred_element_type=jnp.float32)
    out_ref[:] = (LQ < 0).astype(jnp.int8)


def run(kind, unroll, rx, code, iterations=20, block_b=4096):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    k = functools.partial(kernel, kind, unroll, iterations, code.M, Wr, N)
    consts = [(jnp.asarray(bcm_np), bcm_np.shape),
              (jnp.asarray(gram_np), gram_np.shape),
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
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)
    K = code.K
    ref_ms = np.asarray(pallas_decode_minsum(rx, code, iterations=20,
                                             mode="fast"))
    ref_sp = np.asarray(pallas_decode_sumproduct(rx, code, iterations=20,
                                                 mode="fast"))
    for kind, ref in (("minsum", ref_ms), ("sumprod", ref_sp)):
        for unroll in (1, 2, 4):
            try:
                out = np.asarray(run(kind, unroll, rx, code))
                agree = float((out == ref).all(axis=1).mean())
                t = time_decode(
                    lambda r, k=kind, u=unroll: run(k, u, r, code), rx)
                print(f"{kind} fast b4096 unroll={unroll}: {t*1e3:.3f} ms "
                      f"({B*K/t/1e9:.3f} Gbit/s) agree={agree:.5f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{kind} fast b4096 unroll={unroll}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
