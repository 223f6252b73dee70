"""Round-4b prototype: SPA fast check-step A/B under the unrolled schedule.

The shipped SPA fast kernel evaluates the tanh rule in the phi domain
(two log-tanh blocks per iteration); the prefix/suffix tanh-PRODUCT
formulation (one tanh + one log(1+T)/(1-T) with a divide) lost the
round-3 A/B by ~15% — but full loop unroll (round 4) changed what the
scheduler can hide, so the ordering deserves a re-measurement. Both
variants run the identical aggregation (single-pass bf16 one-hot
matmuls, unroll = iterations-1, b4096) and are checked frame-for-frame
against the shipped kernel.

Run serially on the TPU box: python tools/proto_r4b.py
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
    _excl_prefix_prod, _excl_suffix_prod, _tree, _wmajor_layout,
    pallas_decode_sumproduct)


def kernel(variant, iterations, M, Wr, N,
           rx_ref, bcm_ref, gram_ref, padbig_ref, out_ref):
    Bt = rx_ref.shape[1]
    E = Wr * M
    r = -rx_ref[:]
    bcm = bcm_ref[:]
    G = gram_ref[:]
    padbig = padbig_ref[:]
    deg = jnp.sum(bcm, axis=1, keepdims=True)
    degr = deg * r

    def gather(x):
        return jax.lax.dot_general(bcm, x, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

    base = gather((deg - 1.0) * r) + padbig
    Mmsg0 = gather(r) + padbig

    if variant == "phi":
        def check_step(Mm):
            t = Mm.reshape(Wr, M, Bt)
            sg = jnp.where(t < 0, -1.0, 1.0)
            w = jnp.maximum(jnp.log(jnp.tanh(jnp.abs(t) * 0.5)),
                            -jnp.float32(1e4))
            U = _tree(jnp.add, w)
            negP = -_tree(jnp.multiply, sg)
            v = w - U
            return ((negP * sg) * jnp.log(jnp.tanh(v * 0.5))).reshape(E, Bt)
    else:  # tanh-product with prefix/suffix exclusion
        def check_step(Mm):
            t3 = jnp.tanh(Mm.reshape(1, Wr * M, Bt).reshape(Wr, M, Bt) * 0.5)
            t = jnp.transpose(t3, (1, 0, 2))          # (M, Wr, Bt)
            T = _excl_prefix_prod(t) * _excl_suffix_prod(t)
            T = jnp.clip(T, -1.0 + 1e-12, 1.0 - 1e-12)
            Em = jnp.log((1.0 + T) / (1.0 - T))
            return jnp.transpose(Em, (1, 0, 2)).reshape(E, Bt)

    def body(_i, Mm):
        return base + jnp.dot(G, check_step(Mm),
                              preferred_element_type=jnp.float32)

    Mlast = jax.lax.fori_loop(0, iterations - 1, body, Mmsg0,
                              unroll=iterations - 1)
    Em = check_step(Mlast)
    L = jnp.dot(bcm, Em, preferred_element_type=jnp.float32) + degr
    out_ref[:] = (L <= 0).astype(jnp.int8)


def run(variant, rx, code, iterations=20, block_b=4096):
    bcm_np, gram_np, padbig_np, Wr = _wmajor_layout(code)
    N, E = bcm_np.shape
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    k = functools.partial(kernel, variant, iterations, code.M, Wr, N)
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
    ref = np.asarray(pallas_decode_sumproduct(rx, code, iterations=20,
                                              mode="fast"))
    for variant in ("phi", "tanhprod"):
        try:
            out = np.asarray(run(variant, rx, code))
            agree = float((out == ref).all(axis=1).mean())
            t = time_decode(lambda r, v=variant: run(v, r, code), rx)
            print(f"spa fast {variant} b4096 unroll=19: {t*1e3:.3f} ms "
                  f"({B*code.K/t/1e9:.3f} Gbit/s) agree={agree:.5f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"spa fast {variant}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
