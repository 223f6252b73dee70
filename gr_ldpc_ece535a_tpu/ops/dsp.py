"""DSP ops for the full receiver chain: pulse shaping, AGC, carrier/timing
recovery.

The reference's example4/5/6.grc route the BPSK symbols through GNU Radio
stock DSP at 2 samples/symbol — pfb_arb_resampler with RRC taps, channel
model, agc2, fll_band_edge, pfb_clock_sync, costas_loop (SURVEY.md §3.4) —
none of which live in the reference module itself (they are L0 externals).
These are TPU-native equivalents sufficient to close that chain at baseband:
filters and pulse shaping are batched convolutions; the sequential feedback
loops (AGC, Costas) are ``lax.scan`` recurrences compiled on device; timing
recovery exploits the integer-phase structure of the synthetic channel (no
fractional resampling) by matched-filtering and picking the max-energy
polyphase branch.

The Costas loop follows the GR control-loop parameterization (critically
damped 2nd-order PLL; alpha/beta from loop bandwidth) with the BPSK
re*im error detector; its residual pi-phase ambiguity is exactly what the
decoder's IN_SYNC_INVERTED state absorbs downstream.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rrc_taps",
    "fir_filter",
    "pulse_shape",
    "agc",
    "costas_loop",
    "symbol_sync",
]


def rrc_taps(sps: int, excess_bw: float = 0.35, ntaps: int = 45,
             gain: float = 1.0) -> np.ndarray:
    """Root-raised-cosine FIR taps (firdes.root_raised_cosine equivalent).

    sps = samples/symbol; taps normalized to unit energy then scaled by gain.
    """
    beta = float(excess_bw)
    n = int(ntaps)
    t = (np.arange(n) - (n - 1) / 2) / sps  # time in symbol periods
    h = np.zeros(n)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-9:
            h[i] = 1.0 - beta + 4 * beta / math.pi
        elif beta > 0 and abs(abs(ti) - 1 / (4 * beta)) < 1e-9:
            h[i] = (beta / math.sqrt(2)) * (
                (1 + 2 / math.pi) * math.sin(math.pi / (4 * beta))
                + (1 - 2 / math.pi) * math.cos(math.pi / (4 * beta)))
        else:
            num = (math.sin(math.pi * ti * (1 - beta))
                   + 4 * beta * ti * math.cos(math.pi * ti * (1 + beta)))
            den = math.pi * ti * (1 - (4 * beta * ti) ** 2)
            h[i] = num / den
    h = h / np.sqrt(np.sum(h * h))
    return (gain * h).astype(np.float32)


def fir_filter(x: jax.Array, taps: np.ndarray, decim: int = 1) -> jax.Array:
    """'same'-aligned FIR filter of a 1D (complex or real) stream; optional
    decimation keeps every decim-th output."""
    t = jnp.asarray(taps, jnp.float32)
    if jnp.iscomplexobj(x):
        y = (jnp.convolve(jnp.real(x), t, mode="same")
             + 1j * jnp.convolve(jnp.imag(x), t, mode="same"))
        y = y.astype(jnp.complex64)
    else:
        y = jnp.convolve(x, t, mode="same")
    return y[::decim] if decim > 1 else y


def pulse_shape(symbols: jax.Array, sps: int, taps: np.ndarray) -> jax.Array:
    """Transmit pulse shaping: zero-stuff to sps samples/symbol + RRC filter
    (the pfb_arb_resampler-with-RRC-taps role of example4.grc at rate=sps)."""
    n = symbols.shape[0]
    up = jnp.zeros(n * sps, symbols.dtype).at[::sps].set(symbols * sps)
    return fir_filter(up, taps)


@partial(jax.jit, static_argnames=("rate", "reference"))
def agc(x: jax.Array, rate: float = 1e-2, reference: float = 1.0,
        gain0: float = 1.0):
    """agc_cc-style automatic gain control: out = x*g; g += rate*(ref-|out|).

    Returns (out, final_gain) so streaming blocks can carry gain across
    chunks.
    """
    def step(g, xi):
        yi = xi * g
        g = g + rate * (reference - jnp.abs(yi))
        return g, yi

    gF, y = jax.lax.scan(step, jnp.float32(gain0), x)
    return y, gF


@partial(jax.jit, static_argnames=("loop_bw",))
def costas_loop(x: jax.Array, loop_bw: float = 6.28 / 100.0,
                phase0: float = 0.0, freq0: float = 0.0):
    """2nd-order BPSK Costas loop (GR costas_loop_cc order=2 equivalent).

    error = Re(y)*Im(y); critically damped gains from loop_bw. Returns
    (y, (final_phase, final_freq)); converges to the carrier up to a 180-deg
    ambiguity the LDPC decoder's inverted-sync state resolves.
    """
    damping = math.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * damping * loop_bw + loop_bw * loop_bw
    alpha = jnp.float32(4 * damping * loop_bw / denom)
    beta = jnp.float32(4 * loop_bw * loop_bw / denom)
    two_pi = jnp.float32(2 * math.pi)
    fmax = jnp.float32(1.0)

    def step(carry, xi):
        phase, freq = carry
        yi = xi * jnp.exp(-1j * phase).astype(jnp.complex64)
        err = jnp.clip(jnp.real(yi) * jnp.imag(yi), -1.0, 1.0)
        freq = jnp.clip(freq + beta * err, -fmax, fmax)
        phase = phase + freq + alpha * err
        phase = jnp.mod(phase + jnp.pi, two_pi) - jnp.pi
        return (phase, freq), yi

    (phaseF, freqF), y = jax.lax.scan(
        step, (jnp.float32(phase0), jnp.float32(freq0)), x)
    return y, (phaseF, freqF)


def symbol_sync(x: jax.Array, sps: int, taps: np.ndarray):
    """Matched filter + integer-phase timing: downsample at the polyphase
    branch with maximum mean energy (pfb_clock_sync's role for channels
    without fractional timing drift, which is all the synthetic channel
    model produces). Returns (symbols, chosen_phase)."""
    mf = fir_filter(x, taps)
    n = (mf.shape[0] // sps) * sps
    branches = mf[:n].reshape(-1, sps)          # (n_sym, sps)
    energy = jnp.mean(jnp.abs(branches) ** 2, axis=0)
    phase = jnp.argmax(energy)
    return jnp.take(branches, phase, axis=1), phase
