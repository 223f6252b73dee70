"""Channel models: AWGN and the GRC channel-model equivalent.

AWGN follows the reference simulator's convention exactly
(/root/reference/apps/ldpc_lapack.cpp:635-642):

    N0 = 10^(-EbN0_dB / 10)
    rx = tx + sqrt(N0) * normal()

(no rate or Es normalization — reproduced as-is so BER curves line up).

``channel_model`` mirrors the GRC ``channels_channel_model`` block used by
example4/5/6.grc: complex AWGN of given noise voltage, a carrier frequency
offset, and a static phase rotation. Timing recovery is out of scope for the
BPSK real-part decode path; the decoder's sync state machine handles the
180-degree phase ambiguity (see blocks/sync.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["awgn", "ebn0_to_n0", "channel_model"]


def ebn0_to_n0(ebn0_db) -> jax.Array:
    return jnp.power(10.0, -jnp.asarray(ebn0_db, jnp.float32) / 10.0)


def awgn(key: jax.Array, tx: jax.Array, ebn0_db) -> jax.Array:
    """Real AWGN with the simulator's N0 convention."""
    n0 = ebn0_to_n0(ebn0_db).astype(tx.dtype)
    noise = jax.random.normal(key, tx.shape, dtype=tx.dtype)
    return tx + jnp.sqrt(n0) * noise


def channel_model(
    key: jax.Array,
    tx: jax.Array,
    noise_voltage: float = 0.0,
    freq_offset: float = 0.0,
    phase_offset: float = 0.0,
) -> jax.Array:
    """Complex channel: AWGN + frequency/phase rotation (GRC channel_model).

    tx may be real (BPSK symbols) or complex; returns complex64.
    noise_voltage follows the GRC convention (amplitude, not power in dB);
    example4.grc sets noise_voltage = 10^(noise_dB/10) with slider default
    -12 dB.
    """
    tx = tx.astype(jnp.complex64)
    n = tx.shape[-1]
    kr, ki = jax.random.split(key)
    noise = (
        jax.random.normal(kr, tx.shape, jnp.float32)
        + 1j * jax.random.normal(ki, tx.shape, jnp.float32)
    ) * (noise_voltage / jnp.sqrt(2.0))
    t = jnp.arange(n, dtype=jnp.float32)
    rot = jnp.exp(1j * (2 * jnp.pi * freq_offset * t + phase_offset))
    return tx * rot + noise.astype(jnp.complex64)
