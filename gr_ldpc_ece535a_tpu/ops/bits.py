"""Bit/byte packing (MSB-first) as batched device ops.

The reference unpacks each input byte MSB-first into 8 data bits
(/root/reference/lib/ldpc_encoder_bc_impl.cc:138-147) and repacks decoded bits
the same way (/root/reference/lib/ldpc_decoder_cb_impl.cc:207-225).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["unpack_bits", "pack_bits", "unpack_bits_np", "pack_bits_np"]

_SHIFTS = tuple(7 - j for j in range(8))  # MSB first


def unpack_bits(data: jax.Array) -> jax.Array:
    """uint8 (..., n_bytes) -> int8 bits (..., n_bytes*8), MSB-first."""
    d = data.astype(jnp.int32)
    bits = jnp.stack([(d >> s) & 1 for s in _SHIFTS], axis=-1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8).astype(jnp.int8)


def pack_bits(bits: jax.Array) -> jax.Array:
    """int bits (..., n_bits) -> uint8 (..., n_bits//8), MSB-first."""
    n = bits.shape[-1]
    assert n % 8 == 0, "bit count must be a multiple of 8"
    b = bits.reshape(*bits.shape[:-1], n // 8, 8).astype(jnp.int32)
    weights = jnp.asarray([1 << s for s in _SHIFTS], dtype=jnp.int32)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_bits_np(data: np.ndarray) -> np.ndarray:
    """Host-side equivalent (numpy)."""
    return np.unpackbits(np.asarray(data, dtype=np.uint8), axis=-1).astype(np.int8)


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, dtype=np.uint8), axis=-1)
