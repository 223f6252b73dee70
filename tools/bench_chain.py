#!/usr/bin/env python3
"""Device-resident receive-chain throughput: ops.dsp.rx_chain + StreamReceiver.

Measures the full example4-equivalent chain — block AGC, squaring-FFT coarse
CFO, polyphase clock recovery (block-scan), Viterbi&Viterbi carrier — over an
impaired sample stream (50 ppm clock drift, 0.01 cycles/sample carrier
offset, AWGN), then the end-to-end payload recovery through the mesh
StreamReceiver. The chain is timed with the same two-length slope method as
bench.py (the tunnel RTT cancels in the difference); the receive step is a
single wall-clock pipeline measure.

Writes one JSON line; `python tools/bench_chain.py --save` records it to
results/chain_r3.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _impaired_stream(code, n_frames, key, f_off=0.01, ppm=50e-6,
                     noise=0.05, sps=2):
    from gr_ldpc_ece535a_tpu.ops import dsp, encode_to_symbols

    kd, kn = jax.random.split(key)
    data = jax.random.randint(kd, (n_frames, code.K // 8), 0, 256,
                              jnp.int32).astype(jnp.uint8)
    tx = encode_to_symbols(data, code).reshape(-1)
    taps = dsp.rrc_taps(sps, 0.35, 45)
    shaped = dsp.pulse_shape(tx, sps, taps)
    drifted = dsp.fractional_resample(shaped, 1.0 + ppm)
    rot = dsp.mix(drifted, -f_off)
    n = (jax.random.normal(kn, (rot.shape[0],), jnp.float32)
         + 1j * jax.random.normal(jax.random.fold_in(kn, 1),
                                  (rot.shape[0],), jnp.float32))
    return (rot + noise * n.astype(jnp.complex64)), data


def main() -> None:
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import dsp
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver

    code = get_code("block_32_64")
    sps = 2
    n_frames = 1 << 13                      # 8192 frames -> 524288 symbols
    key = jax.random.PRNGKey(3)
    rx, data = _impaired_stream(code, n_frames, key, sps=sps)
    rx_half = rx[: rx.shape[0] // 2]
    jax.block_until_ready((rx, rx_half))

    chain = jax.jit(lambda x: dsp.rx_chain(x, sps=sps))
    # warm both lengths, then slope-time: per-sample cost from the length
    # difference (fixed dispatch/RTT overheads cancel)
    np.asarray(chain(rx)[:4])
    np.asarray(chain(rx_half)[:4])

    def best_time(x, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chain(x)[:4])
            best = min(best, time.perf_counter() - t0)
        return best

    t_full, t_half = best_time(rx), best_time(rx_half)
    n_samp = int(rx.shape[0] - rx_half.shape[0])
    samples_per_s = n_samp / max(t_full - t_half, 1e-9)

    # end-to-end: chain + frame sync + sharded decode + payload fetch
    syms = chain(rx)
    recv = StreamReceiver(code=code, iterations=5)
    recv.receive(syms)  # warm compile at this shape/offset
    jax.block_until_ready(syms)
    t0 = time.perf_counter()
    syms = chain(rx)
    out = recv.receive(syms)
    wall = time.perf_counter() - t0
    payload = np.asarray(data).tobytes()
    ok = out.data and out.data[len(out.data) // 2:] in payload
    line = json.dumps({
        "metric": "rx_chain_samples_per_s",
        "value": samples_per_s,
        "unit": "samples/s",
        "symbols_per_s": samples_per_s / sps,
        "chain_plus_receive_info_bits_per_s": len(out.data) * 8 / wall,
        "frames": n_frames,
        "locked": bool(out.acquisition is not None),
        "payload_tail_recovered": bool(ok),
        "impairments": {"freq_offset": 0.01, "clock_ppm": 50,
                        "noise": 0.05, "sps": sps},
        "backend": jax.devices()[0].platform,
    })
    print(line)
    if "--save" in sys.argv[1:]:
        out_path = Path(__file__).resolve().parents[1] / "results" / "chain_r3.json"
        out_path.write_text(line + "\n")
        print(f"saved -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
