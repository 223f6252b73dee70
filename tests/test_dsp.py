"""Receiver-chain DSP tests: RRC, AGC, Costas, timing, and the full chain.

The full-chain test is the example4.grc-equivalent integration case: LDPC
encode -> 2 sps RRC pulse shaping -> channel (noise + phase rotation +
carrier offset) -> AGC -> Costas -> matched-filter symbol sync -> LDPC
decode with the sync state machine -> original bytes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gr_ldpc_ece535a_tpu.blocks import (
    AgcBlock2,
    ChannelModelBlock,
    CostasLoopBlock,
    FlowGraph,
    LdpcDecoderBlock,
    LdpcEncoderBlock,
    PulseShapeBlock,
    SymbolSyncBlock,
    VectorSink,
    VectorSource,
)
from gr_ldpc_ece535a_tpu.ops import dsp


def test_rrc_taps_properties():
    taps = dsp.rrc_taps(sps=2, excess_bw=0.35, ntaps=45)
    assert taps.shape == (45,)
    assert np.argmax(taps) == 22  # symmetric, peak at center
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-6)
    np.testing.assert_allclose(np.sum(taps**2), 1.0, atol=1e-5)
    # matched pair at sps=2 is ~ISI-free: raised-cosine at symbol spacing
    rc = np.convolve(taps, taps)
    center = len(rc) // 2
    symbol_taps = rc[center % 2 :: 2]
    peak = np.argmax(symbol_taps)
    others = np.delete(symbol_taps, peak)
    assert np.abs(others).max() < 0.05 * symbol_taps[peak]


def test_agc_converges():
    x = jnp.asarray(np.full(4000, 0.1 + 0.0j, np.complex64) * 5.0)
    y, gain = dsp.agc(x, rate=1e-2, reference=1.0)
    assert abs(float(jnp.abs(y[-1])) - 1.0) < 0.05
    assert float(gain) == pytest.approx(2.0, rel=0.1)


def test_costas_locks_phase_and_freq():
    rng = np.random.default_rng(0)
    sym = np.sign(rng.standard_normal(6000)).astype(np.complex64)
    f0, p0 = 1e-3, 0.7
    t = np.arange(len(sym))
    rx = sym * np.exp(1j * (2 * np.pi * f0 * t + p0)).astype(np.complex64)
    y, (phase, freq) = dsp.costas_loop(jnp.asarray(rx), loop_bw=0.06)
    tail = np.asarray(y[-2000:])
    # after lock, symbols are real up to a sign ambiguity
    assert np.abs(tail.imag).mean() < 0.1
    assert np.abs(np.abs(tail.real) - 1.0).mean() < 0.1
    # loop integrator must have found the carrier (freq in rad/sample)
    assert float(freq) == pytest.approx(2 * np.pi * f0, rel=0.15)


def test_symbol_sync_picks_energy_phase():
    rng = np.random.default_rng(1)
    sym = np.sign(rng.standard_normal(400)).astype(np.complex64)
    taps = dsp.rrc_taps(2, 0.35, 45)
    shaped = np.asarray(dsp.pulse_shape(jnp.asarray(sym), 2, taps))
    out, phase = dsp.symbol_sync(jnp.asarray(shaped), 2, taps)
    out = np.asarray(out)
    # 'same'-mode filters are zero-delay, so recovered symbols align 1:1
    # (edges trimmed to avoid filter startup transients)
    assert int(phase) == 0
    match = np.mean(np.sign(out.real[50:-50]) == np.sign(sym[50:-50].real))
    assert match == 1.0


def test_full_example4_chain_streaming():
    msg = (b"Full receiver chain with carrier recovery! " * 24)[:1024]
    fg = FlowGraph()
    src = VectorSource(np.frombuffer(msg, np.uint8), chunk=300)
    enc = LdpcEncoderBlock()
    tx = PulseShapeBlock(sps=2)
    chan = ChannelModelBlock(noise_voltage=0.05, freq_offset=5e-4,
                             phase_offset=2.5, seed=4)
    agc = AgcBlock2(rate=2e-2)
    costas = CostasLoopBlock(loop_bw=0.08)
    timing = SymbolSyncBlock(sps=2)
    dec = LdpcDecoderBlock(method=0, error_threshold=0, verbose=False)
    snk = VectorSink(np.uint8)
    fg.connect(src, enc, tx, chan, agc, costas, timing, dec, snk)
    fg.run()
    out = bytes(snk.data())
    # the loops need some symbols to lock, so the head of the message may be
    # lost before IN_SYNC; require the tail 3/4 to be recovered contiguously
    assert msg[len(msg) // 4 :] in out
    assert dec.state in (1, 2)  # locked (possibly phase-inverted)
