"""Pallas BP kernels vs the jnp float32 reference path (interpret mode on CPU).

The kernels must produce identical hard decisions to the jnp f32 decoders
(which in turn match the float64 oracle — see test_decoders.py), at any batch
size including non-multiples of the block size.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gr_ldpc_ece535a_tpu.codes import get_code
from gr_ldpc_ece535a_tpu.ops import decode_minsum, decode_sumproduct
from gr_ldpc_ece535a_tpu.ops.pallas_bp import (
    pallas_decode_minsum,
    pallas_decode_sumproduct,
)


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_pallas_minsum_matches_jnp_f32(iters):
    code = get_code("block_32_64")
    rx = np.random.default_rng(0).standard_normal((300, 64)).astype(np.float32)
    vp = np.asarray(pallas_decode_minsum(
        jnp.asarray(rx), code, iterations=iters, block_b=128, interpret=True))
    vj = np.asarray(decode_minsum(
        jnp.asarray(rx), code, iterations=iters, early_exit=False, dtype=jnp.float32))
    assert np.array_equal(vp, vj)


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_pallas_sumproduct_matches_jnp_f32(iters):
    code = get_code("block_32_64")
    rx = np.random.default_rng(1).standard_normal((300, 64)).astype(np.float32)
    vp = np.asarray(pallas_decode_sumproduct(
        jnp.asarray(rx), code, iterations=iters, block_b=128, interpret=True))
    vj = np.asarray(decode_sumproduct(
        jnp.asarray(rx), code, iterations=iters, early_exit=False, dtype=jnp.float32))
    assert np.array_equal(vp, vj)


def test_pallas_nonaligned_batch():
    """Batch smaller than the block and non-multiple batches must both work."""
    code = get_code("block_32_64")
    rng = np.random.default_rng(2)
    for B in (1, 100, 257):
        rx = rng.standard_normal((B, 64)).astype(np.float32)
        vp = np.asarray(pallas_decode_minsum(
            jnp.asarray(rx), code, iterations=5, block_b=128, interpret=True))
        vj = np.asarray(decode_minsum(
            jnp.asarray(rx), code, iterations=5, early_exit=False, dtype=jnp.float32))
        assert np.array_equal(vp, vj), B


def test_pallas_zero_input_sign_convention():
    """rx rows containing exact zeros exercise sign(0)=0 handling."""
    code = get_code("block_32_64")
    rx = np.zeros((8, 64), dtype=np.float32)
    rx[4:, :32] = 1.0
    vp = np.asarray(pallas_decode_minsum(
        jnp.asarray(rx), code, iterations=5, block_b=128, interpret=True))
    vj = np.asarray(decode_minsum(
        jnp.asarray(rx), code, iterations=5, early_exit=False, dtype=jnp.float32))
    assert np.array_equal(vp, vj)
