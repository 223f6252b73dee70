#!/usr/bin/env python3
"""Device-resident receive-chain throughput: dsp.rx_chain_pairs + StreamReceiver.

Measures the full example4-equivalent chain — block AGC, matmul-DFT coarse
CFO, polyphase clock recovery (block-scan), Viterbi&Viterbi carrier — over an
impaired sample stream (50 ppm clock drift, 0.01 cycles/sample carrier
offset, AWGN), then the end-to-end payload recovery through the mesh
StreamReceiver. Everything runs in PAIR form ((2, T) f32 planes): this
platform's TPU backend supports no complex dtype at all (probed op-by-op,
round 3), so the complex-free chain is the only one that can be
device-resident here — and it is the faster layout on any TPU. The chain is
timed with the same two-length slope method as bench.py (the tunnel RTT
cancels in the difference); the receive step is a single wall-clock pipeline
measure through the fused single-dispatch receiver.

Writes one JSON line; `python tools/bench_chain.py --save` records it to
results/chain_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _impaired_stream_pairs(code, n_frames, key, f_off=0.01, ppm=50e-6,
                           noise=0.05, sps=2):
    """(2, T) impaired sample planes + the transmitted payload bytes."""
    from gr_ldpc_ece535a_tpu.ops import dsp, encode_to_symbols

    kd, kn = jax.random.split(key)
    data = jax.random.randint(kd, (n_frames, code.K // 8), 0, 256,
                              jnp.int32).astype(jnp.uint8)
    tx = encode_to_symbols(data, code).reshape(-1)
    taps = dsp.rrc_taps(sps, 0.35, 45)
    shaped = dsp.pulse_shape(tx, sps, taps)          # real f32
    drifted = dsp.fractional_resample(shaped, 1.0 + ppm)
    xp = jnp.stack([drifted, jnp.zeros_like(drifted)])
    xp = dsp.mix_pairs(xp, -f_off)                   # inject +f_off carrier
    n = jax.random.normal(kn, (2, xp.shape[1]), jnp.float32)
    return xp + noise * n, data


def main() -> None:
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import dsp
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver

    code = get_code("block_32_64")
    sps = 2
    n_frames = 1 << 13                      # 8192 frames -> 524288 symbols
    key = jax.random.PRNGKey(3)
    rx, data = _impaired_stream_pairs(code, n_frames, key, sps=sps)
    rx_half = rx[:, : rx.shape[1] // 2]
    jax.block_until_ready((rx, rx_half))

    def best_time(chain, x, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chain(x)[:, :4])
            best = min(best, time.perf_counter() - t0)
        return best

    # the clock-tracking scan's sequential step latency bounds throughput;
    # since round 4 the tracker interpolates the sampling phase per symbol
    # with a self-calibrating discriminant, so blocks up to 4096 symbols
    # hold lock at +-50 ppm (pinned by tests) — the sweep keeps the r3
    # winner (256) for continuity plus the large-block regime
    rates = {}
    chains = {}
    for tbs in (256, 1024, 2048, 4096, 8192):
        chain = jax.jit(lambda x, t=tbs: dsp.rx_chain_pairs(
            x, sps=sps, timing_block_syms=t))
        chains[tbs] = chain
        # warm both lengths, then slope-time: per-sample cost from the
        # length difference (fixed dispatch/RTT overheads cancel)
        np.asarray(chain(rx)[:, :4])
        np.asarray(chain(rx_half)[:, :4])
        t_full, t_half = best_time(chain, rx), best_time(chain, rx_half)
        n_samp = int(rx.shape[1] - rx_half.shape[1])
        # guard degenerate slopes: tunnel jitter can make the two walls
        # cross, which turns the quotient into garbage (a 5e14 "rate" was
        # recorded once and silently won the sweep); clamp the denominator
        # to a physically meaningful floor (10% of the full wall)
        den = t_full - t_half
        if den < 0.1 * t_full:
            den = 0.1 * t_full
        rates[tbs] = n_samp / den
    tbs_best = max(rates, key=rates.get)
    chain = chains[tbs_best]
    samples_per_s = rates[tbs_best]

    # the composed-path configuration: block 8192 with the rate clip at
    # the +-50 ppm impairment spec (the default 0.002 covers +-500 ppm
    # and pays for it in tap-window span) — recorded separately so the
    # claimed spec-clip chain rate traces to this artifact
    chain_sc = jax.jit(lambda x: dsp.rx_chain_pairs(
        x, sps=sps, timing_block_syms=8192, timing_rate_clip=2.5e-4))
    np.asarray(chain_sc(rx)[:, :4])
    np.asarray(chain_sc(rx_half)[:, :4])
    t_full, t_half = best_time(chain_sc, rx), best_time(chain_sc, rx_half)
    den = t_full - t_half
    if den < 0.1 * t_full:
        den = 0.1 * t_full
    samples_per_s_spec_clip = (rx.shape[1] - rx_half.shape[1]) / den

    # end-to-end: chain + frame sync + fused decode + payload fetch
    syms = chain(rx)[0]                     # real plane feeds frame sync
    recv = StreamReceiver(code=code, iterations=8)
    recv.receive(syms, fetch_weights=False)  # warm compile at this shape
    jax.block_until_ready(syms)
    t0 = time.perf_counter()
    syms = chain(rx)[0]
    out = recv.receive(syms, fetch_weights=False)
    wall = time.perf_counter() - t0
    payload = np.asarray(data).tobytes()
    ok = out.data and out.data[len(out.data) // 2:] in payload

    # SEGMENTED composition (round-5 VERDICT item 2): the same chain and
    # receiver programs over a longer stream split into segments, with
    # every segment's receive DISPATCHED (async payload copies issued)
    # before any collect — each segment's wire transfer overlaps the next
    # segments' chain + decode compute, so the composed wall approaches
    # chain-compute + one RTT + one segment's wire instead of
    # chain + decode + full wire in series.
    n_seg = 4
    seg_frames = 1 << 17   # 131072 frames (16.8 Msamples) per segment:
    # big enough that the per-call RTT, dispatch, and acquisition costs
    # amortize (the continuous-pipeline regime this measures). Segments
    # are generated independently (one huge impairment injection OOMs
    # the generation-side gather); each is a self-contained stream with
    # its own lock, exactly what the segmented receiver handles.
    seg_data = []
    segs = []
    for s in range(n_seg):
        rx_s, data_s = _impaired_stream_pairs(
            code, seg_frames, jax.random.PRNGKey(100 + s), sps=sps)
        segs.append(rx_s)
        seg_data.append(np.asarray(data_s).tobytes())
    jax.block_until_ready(segs)
    # composed chain: the 8192-symbol tracking block with the rate clip
    # tightened to the +-50 ppm impairment spec (measured optimum, round
    # 5 — never the sweep's pick, which can glitch) and the reference's
    # default 5 decode iterations (the examples' setting)
    chain_c = jax.jit(lambda x: dsp.rx_chain_pairs(
        x, sps=sps, timing_block_syms=8192, timing_rate_clip=2.5e-4))
    recv_c = StreamReceiver(code=code, iterations=5)

    def run_segmented():
        states = [recv_c.receive_dispatch(chain_c(xp)[0]) for xp in segs]
        return recv_c.receive_collect_many(states)

    run_segmented()                          # warm (chain shape differs)
    t0 = time.perf_counter()
    outs = run_segmented()
    wall_seg = time.perf_counter() - t0
    bits_seg = sum(len(o.data) for o in outs) * 8
    seg_ok = all(o.acquisition is not None for o in outs) and all(
        o.data[len(o.data) // 2:] in pl
        for o, pl in zip(outs, seg_data) if o.data)

    line = json.dumps({
        "metric": "rx_chain_samples_per_s",
        "value": samples_per_s,
        "unit": "samples/s",
        "symbols_per_s": samples_per_s / sps,
        "samples_per_s_block8192_spec_rate_clip": samples_per_s_spec_clip,
        "chain_plus_receive_info_bits_per_s": len(out.data) * 8 / wall,
        "chain_plus_receive_segmented_info_bits_per_s": bits_seg / wall_seg,
        "segmented": {"segments": n_seg, "frames_per_segment": seg_frames,
                      "total_frames": n_seg * seg_frames,
                      "wall_s": wall_seg, "locked_all": bool(seg_ok),
                      "frames_recovered": sum(o.n_frames for o in outs)},
        "frames": n_frames,
        "locked": bool(out.acquisition is not None),
        "payload_tail_recovered": bool(ok),
        "impairments": {"freq_offset": 0.01, "clock_ppm": 50,
                        "noise": 0.05, "sps": sps},
        "timing_block_syms": tbs_best,
        "samples_per_s_by_timing_block": rates,
        "form": "pairs (complex-free; backend has no complex dtype)",
        "backend": jax.devices()[0].platform,
    })
    print(line)
    if "--save" in sys.argv[1:]:
        out_path = Path(__file__).resolve().parents[1] / "results" / "chain_r5.json"
        out_path.write_text(line + "\n")
        print(f"saved -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
