"""Ablation study of the Pallas BP kernels (honest timing). Not shipped API.

Builds variants of the sum-product kernel with individual pieces stubbed out
to attribute per-iteration cost: transcendentals (tanh, log), the one-hot
matmul precision, the exclusion products, and the reshape layout changes.
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
from gr_ldpc_ece535a_tpu.ops.layout import edge_layout  # noqa: E402
from gr_ldpc_ece535a_tpu.ops.pallas_bp import (  # noqa: E402
    _excl_prefix_prod, _excl_suffix_prod)


def make_sp_kernel(opts):
    precision = opts.get("precision", jax.lax.Precision.HIGHEST)

    def kernel(iterations, M, Wr, N, rx_ref, bcm_ref, cmask_ref, out_ref):
        Bt = rx_ref.shape[1]
        E = M * Wr
        r = -rx_ref[:]
        bcm = bcm_ref[:]
        cmask = cmask_ref[:]
        mask3 = cmask.reshape(M, Wr, 1)
        deg = jnp.sum(bcm, axis=1, keepdims=True)

        def mm(a, b, dims=None):
            if dims is None:
                return jnp.dot(a, b, precision=precision,
                               preferred_element_type=jnp.float32)
            return jax.lax.dot_general(a, b, dims, precision=precision,
                                       preferred_element_type=jnp.float32)

        Mmsg0 = mm(bcm, r, (((0,), (0,)), ((), ())))
        rE = Mmsg0

        def body(_i, carry):
            Mmsg, _L = carry
            x = Mmsg.reshape(M, Wr, Bt)
            if opts.get("no_tanh"):
                t = jnp.where(mask3 > 0, x * 0.4, 1.0)
            else:
                t = jnp.where(mask3 > 0, jnp.tanh(x / 2.0), 1.0)
            if opts.get("no_excl"):
                T = t * 0.9
            else:
                T = _excl_prefix_prod(t) * _excl_suffix_prod(t)
            if opts.get("no_log"):
                E_msg = (T * 1.9).reshape(E, Bt) * cmask
            else:
                E_msg = jnp.log((1.0 + T) / (1.0 - T)).reshape(E, Bt) * cmask
            if opts.get("no_matmul"):
                AE = E_msg[:N]
            else:
                AE = mm(bcm, E_msg)
            L = AE + deg * r
            if opts.get("no_matmul"):
                LE = jnp.concatenate([L, L, L], axis=0)
            else:
                LE = mm(bcm, L, (((0,), (0,)), ((), ())))
            Mnew = (LE - E_msg - rE) * cmask
            return Mnew, L

        _, L = jax.lax.fori_loop(0, iterations, body, (Mmsg0, r))
        out_ref[:] = (L <= 0).astype(jnp.int8)

    return kernel


def run_variant(kernel_body, rx, code, iterations=20, block_b=512):
    lay = edge_layout(code)
    M, N, Wr = lay.M, lay.N, lay.Wr
    E = M * Wr
    B = rx.shape[0]
    Bp = max(block_b, ((B + block_b - 1) // block_b) * block_b)
    rx_t = jnp.zeros((N, Bp), jnp.float32).at[:, :B].set(
        jnp.asarray(rx, jnp.float32).T)
    bcm = jnp.asarray(lay.B_cm, jnp.float32)
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
    )(rx_t, bcm, cmask)
    return out[:, :B].T


def main():
    code = get_code("block_32_64")
    B = 1 << 17
    rx = _make_inputs(code, B, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)

    variants = {
        "baseline": {},
        "no_tanh": {"no_tanh": True},
        "no_log": {"no_log": True},
        "no_tanh_log": {"no_tanh": True, "no_log": True},
        "no_excl": {"no_excl": True},
        "no_matmul": {"no_matmul": True},
        "prec_high": {"precision": jax.lax.Precision.HIGH},
        "prec_default": {"precision": jax.lax.Precision.DEFAULT},
        "all_off": {"no_tanh": True, "no_log": True, "no_excl": True,
                    "no_matmul": True},
    }
    for name, opts in variants.items():
        k = make_sp_kernel(opts)
        try:
            t = time_decode(lambda r, k=k: run_variant(k, r, code), rx)
            print(f"{name:14s}: {t*1e3:7.2f} ms  ({B*32/t/1e9:.3f} Gbit/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
