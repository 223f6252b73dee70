"""North-star benchmark: decoded info bits/s/chip, 20 BP iterations.

Measures the belief-propagation decoders (min-sum = the reference's default
method 0, /root/reference/lib/ldpc_decoder_cb_impl.cc:309; sum-product =
method 1, :478) on the reference 32x64 code at a fixed 20 iterations over a
large resident batch — the BASELINE.json configuration ">=1e9 decoded info
bits/s per v5e chip at 20 BP iterations". Input frames are generated on
device (encode + AWGN) and stay on device.

Timing methodology (IMPORTANT): on the axon-tunneled TPU platform,
``jax.block_until_ready`` returns once the dispatch is acknowledged, NOT when
the computation finishes — naive timing measures dispatch latency and
over-reports throughput by orders of magnitude (measured: a 4096^3 bf16
matmul "completing" at 1358 TFLOP/s on a 197 TFLOP/s chip). This harness
therefore times K data-dependent chained decodes inside one jitted
``fori_loop`` and fetches a scalar reduction to host (a true sync point),
then takes the SLOPE between two chain lengths so the fixed ~23 ms tunnel
round-trip latency cancels:

    t_per_decode = (t(k2 chained) - t(k1 chained)) / (k2 - k1)

The chain's data dependency is a +1e-30 * sum(vhat) perturbation of rx —
exactly 0 after f32 rounding (rx values are O(1)), so every link decodes the
identical problem, but XLA cannot hoist the decode out of the loop.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: the early-exit pallas programs used by the
# parity section are the slowest compiles in the repo (~1-4 min each through
# the remote-compile daemon, cold; one was observed to crash the daemon's
# compile-helper subprocess on a long compile). Warm runs skip all of it.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

BASELINE = 1.0e9  # info bits/s/chip target (BASELINE.md)


def _retry_transient(fn, *args, **kwargs):
    """Run fn, retrying once after a short pause on a transient
    remote-compile daemon failure (observed: HTTP 500 'tpu_compile_helper
    subprocess exit code 1' poisons a few subsequent requests too)."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001
        if "remote_compile" not in str(e) and "INTERNAL" not in str(e):
            raise
        time.sleep(10.0)
        return fn(*args, **kwargs)


def _make_inputs(code, batch, key):
    from gr_ldpc_ece535a_tpu.ops import awgn, encode_bits, bpsk_map

    kd, kn = jax.random.split(key)
    d = jax.random.bernoulli(kd, 0.5, (batch, code.K)).astype(jnp.int8)
    tx = bpsk_map(encode_bits(d, code))
    return awgn(kn, tx, ebn0_db=4.0)


def _chained(decode_fn):
    """Chain of k data-dependent decodes of the same rx; returns a scalar.

    The chain length k is a TRACED argument (the fori_loop lowers to a
    while_loop with a dynamic trip count), so ONE compiled program serves
    every chain length — round 3 compiled a separate program per length,
    and those duplicate cold remote compiles are what ate the driver's
    bench budget before the precise/parity sections ran (VERDICT r3 #2).
    """

    def run(rx, k):
        def body(_i, carry):
            rx, acc = carry
            vhat = decode_fn(rx)
            s = jnp.sum(vhat.astype(jnp.int32))
            # scalar feedback: 1e-30 * s rounds to +0 against O(1) symbols,
            # but forms a true data dependency between links
            rx = rx + jnp.float32(1e-30) * s.astype(jnp.float32)
            return rx, acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (rx, jnp.int32(0)))
        return acc

    return jax.jit(run)


def _fetch_time(fn, rx, k, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(rx, k))  # host fetch = true synchronization
        best = min(best, time.perf_counter() - t0)
    return best


def time_decode(decode_fn, rx, k1: int = 1, k2: int = 25, reps: int = 4) -> float:
    """Seconds per decode call, tunnel-latency-cancelled (slope method).

    k2 - k1 = 24 chained links per slope and best-of-4 fetches: the ~23 ms
    tunnel round-trip is ~10x one decode, so a long chain keeps the slope's
    signal-to-noise high against RTT jitter (widened from 8 links in round
    2 after observing ~±4% run-to-run spread on the ~4 ms kernels — jitter
    divides by the link count)."""
    f = _chained(decode_fn)
    k1a, k2a = jnp.int32(k1), jnp.int32(k2)
    np.asarray(f(rx, k1a))  # one compile serves both chain lengths
    np.asarray(f(rx, k2a))  # warm the long chain too
    t1 = _fetch_time(f, rx, k1a, reps)
    t2 = _fetch_time(f, rx, k2a, reps)
    return max((t2 - t1) / (k2 - k1), 1e-12)


def _bench_receiver(code, n_frames: int = 1 << 19, offset: int = 17):
    """End-to-end streaming receive of an offset, phase-inverted stream.

    The stream is generated and stays ON DEVICE (the production regime: the
    symbol source feeds device memory; only acquisition's head window, the
    packed payload bytes, and per-frame syndrome weights cross the host
    boundary). Timed region = acquisition + sharded decode + on-device byte
    repack + result fetch + host accept-filtering.
    """
    import numpy as np

    from gr_ldpc_ece535a_tpu.ops import awgn, encode_to_symbols
    from gr_ldpc_ece535a_tpu.parallel import StreamReceiver

    kd, kn = jax.random.split(jax.random.PRNGKey(1))
    data = jax.random.randint(kd, (n_frames, code.K // 8), 0, 256, jnp.int32
                              ).astype(jnp.uint8)
    tx = encode_to_symbols(data, code).reshape(-1)

    def make_stream(key):  # offset + 180-degree phase flip to acquire
        return jnp.concatenate(
            [jnp.zeros(offset, jnp.float32), -awgn(key, tx, ebn0_db=6.0)])

    stream = make_stream(kn)
    recv = StreamReceiver(code=code, iterations=5)  # kernel_mode="fast"
    # warm the compile caches with an identical-shape, identical-OFFSET
    # stream (jit caches per shape, and the sharded runner bakes the lock
    # offset in): different warmup shapes/offsets would leave the real
    # configuration compiling inside the timed region (~30 s through the
    # remote-compile daemon)
    warm = make_stream(jax.random.PRNGKey(9))
    jax.block_until_ready((stream, warm))
    recv.receive(warm, fetch_weights=False)
    t0 = time.perf_counter()
    out = recv.receive(stream, fetch_weights=False)  # accept bitmask fetch
    dt = time.perf_counter() - t0
    ok = out.acquisition is not None and out.acquisition.offset == offset
    # second, PROFILED pass: a scalar-sync fetch splits decode from wire
    # time (costs one extra round trip, so it is not the headline number)
    # and records the payload wire rate — the evidence for where the
    # remaining gap to the bulk-decode rate is (round-2 VERDICT item 3).
    # Run it twice and keep the warm pass: the profile-only sync program
    # compiles during the first one, which would otherwise be booked as
    # decode time.
    recv.receive(stream, fetch_weights=False, profile=True)
    prof = recv.receive(stream, fetch_weights=False, profile=True)
    tt = prof.timings
    wall = sum(tt.get(k, 0.0) for k in
               ("acquire_s", "dispatch_s", "decode_s", "decode_fetch_s",
                "fetch_s", "host_s"))
    return {
        "stream_receiver_info_bits_per_s": len(out.data) * 8 / dt,
        "stream_receiver_frames": out.n_frames,
        "stream_receiver_locked": bool(ok and out.acquisition.inverted),
        "stream_receiver_breakdown": tt,
        # share of the SERIALIZED profile wall that is wire (the profile
        # pass syncs decode before fetching, so this is an honest split
        # that cannot book decode time as wire)
        "stream_receiver_wire_frac": tt.get("fetch_s", 0.0) / max(wall, 1e-9),
        # share of the HEADLINE (pipelined) wall explained by wire at the
        # measured rate — the chunked path overlaps decode under the
        # fetch, so this is the wire-floor fraction of the number above
        "stream_receiver_pipelined_wire_frac": (
            tt.get("fetch_s", 0.0) / max(dt, 1e-9)),
    }


def _bench_parity(code, iterations: int = 20, batch: int = 1 << 17,
                  n_batches: int = 8, remaining=None):
    """On-TPU hard-decision parity counters (round-2 VERDICT item 2).

    NEVER skipped outright: the caller shrinks n_batches when the budget
    is tight, and the per-method loop below records whatever it measured
    with an honest frame count.

    Decodes n_batches * batch fresh AWGN frames (Eb/N0 4 dB) with the
    pallas precise and fast kernels and the XLA f32 reference path under
    the REFERENCE's early-exit semantics (syndrome checked every iteration,
    converged frames freeze — lib/ldpc_decoder_cb_impl.cc:534-537), and
    counts frame-level hard-decision mismatches on device. Separately
    records the fixed-iteration "wander" count on one batch: with no early
    exit, a converged frame keeps iterating and can drift to a different
    valid codeword under any 1-ulp arithmetic difference — a regime the
    reference never enters (it breaks on convergence), reported for
    transparency.
    """
    from gr_ldpc_ece535a_tpu.ops import decode_minsum, decode_sumproduct
    from gr_ldpc_ece535a_tpu.ops.pallas_bp import (
        pallas_decode_minsum, pallas_decode_sumproduct)

    Hd = jnp.asarray(code.H.astype(np.float32))

    @jax.jit
    def mism(a, b):
        return jnp.sum(jnp.any(a != b, axis=1).astype(jnp.int32))

    @jax.jit
    def mism_decomp(vp, vx):
        """Mismatch count + syndrome decomposition, on device (5 scalars).

        Every observed precise-vs-XLA disagreement sits at the decoding
        limit: either both outputs fail the syndrome (flagged garbage on
        both sides) or exactly one side converged on a marginal frame.
        'both_valid_diff' (two different valid codewords) is the only
        decomposition bin that could silently corrupt accepted data —
        recorded so each round's JSON proves whether it stayed at 0.
        """
        diff = jnp.any(vp != vx, axis=1)
        ok_p = jnp.sum(jnp.mod(jnp.dot(Hd, vp.T.astype(jnp.float32)), 2.0),
                       axis=0) == 0
        ok_x = jnp.sum(jnp.mod(jnp.dot(Hd, vx.T.astype(jnp.float32)), 2.0),
                       axis=0) == 0
        cnt = lambda m: jnp.sum(jnp.logical_and(diff, m).astype(jnp.int32))
        return (jnp.sum(diff.astype(jnp.int32)),
                cnt(~ok_p & ~ok_x), cnt(ok_p & ok_x),
                cnt(ok_x & ~ok_p), cnt(ok_p & ~ok_x))

    out = {"parity_frames": batch * n_batches,
           "parity_semantics": "early_exit(reference)",
           "parity_ebn0_db": 4.0, "parity_iterations": iterations}
    for name, pfn, xfn in (
        ("sumproduct", pallas_decode_sumproduct, decode_sumproduct),
        ("minsum", pallas_decode_minsum, decode_minsum),
    ):
        # sum-product is the north-star method: it always runs at least one
        # batch, over budget if need be; only minsum yields to the budget
        if (name != "sumproduct" and remaining is not None
                and remaining() < 60.0):
            out[f"mismatch_precise_{name}"] = "skipped: budget"
            continue
        pf = jax.jit(lambda r, f=pfn: f(r, code, iterations=iterations,
                                        mode="precise", early_exit=True))
        ff = jax.jit(lambda r, f=pfn: f(r, code, iterations=iterations,
                                        mode="fast", early_exit=True))
        xf = jax.jit(lambda r, f=xfn: f(r, code, iterations=iterations,
                                        early_exit=True))
        mf = done = 0
        dec = np.zeros(5, np.int64)
        for i in range(n_batches):
            if done and remaining is not None and remaining() < 20.0:
                break  # record what we measured; count below is honest
            rx = _make_inputs(code, batch, jax.random.PRNGKey(1000 + i))
            vx = xf(rx)
            dec += np.asarray([int(v) for v in mism_decomp(pf(rx), vx)])
            mf += int(mism(ff(rx), vx))
            done += 1
        out[f"mismatch_precise_{name}"] = int(dec[0])
        out[f"mismatch_precise_{name}_decomp"] = {
            "both_syndrome_fail": int(dec[1]),
            "both_valid_different": int(dec[2]),
            "only_xla_valid": int(dec[3]),
            "only_pallas_valid": int(dec[4]),
        }
        out[f"mismatch_fast_{name}"] = mf
        out[f"parity_frames_{name}"] = done * batch
        out["parity_frames"] = min(out["parity_frames"], done * batch)
    # fixed-iteration wander (one batch, sum-product)
    if remaining is not None and remaining() < 45.0:
        return out
    pfix = jax.jit(lambda r: pallas_decode_sumproduct(
        r, code, iterations=iterations, mode="precise"))
    xfix = jax.jit(lambda r: decode_sumproduct(
        r, code, iterations=iterations, early_exit=False))
    rx = _make_inputs(code, batch, jax.random.PRNGKey(1000))
    out["fixed20_wander_precise_sumproduct"] = int(mism(pfix(rx), xfix(rx)))
    out["fixed20_wander_frames"] = batch
    return out


def main() -> None:
    import sys

    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import decode_minsum, decode_sumproduct
    from gr_ldpc_ece535a_tpu.ops.pallas_bp import (
        pallas_decode_minsum, pallas_decode_sumproduct)

    # Wall-clock budget. The driver's round-3 capture proved it runs this
    # script COLD (a checkout whose .jax_cache is empty), so the section
    # order below is ranked by evidence value — pallas timings, then the
    # parity counters (never skipped, only shrunk), then receiver/XLA —
    # and a cumulative partial JSON line lands on stderr after EVERY
    # section so a timeout or crash still records what ran (VERDICT r3
    # #2). stdout carries exactly one final line as before.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "600"))
    t_start = time.perf_counter()

    def remaining() -> float:
        return budget_s - (time.perf_counter() - t_start)

    code = get_code("block_32_64")
    iterations = 20
    batch = 1 << 17  # 131072 frames resident
    platform = jax.devices()[0].platform

    paths: dict = {}
    errors: dict = {}
    receiver: dict = {}
    parity: dict = {}

    def state() -> dict:
        bits = {k: batch * code.K / v for k, v in paths.items()}
        best_name = max(bits, key=bits.get) if bits else "none"
        sp_bits = {k: v for k, v in bits.items() if "sumproduct" in k}
        return {
            "metric": "decoded_info_bits_per_s_per_chip_20bp_iters",
            "value": bits.get(best_name, 0.0),
            "unit": "bits/s",
            "vs_baseline": bits.get(best_name, 0.0) / BASELINE,
            "backend": platform,
            "best_path": best_name,
            "batch": batch,
            "best_sumproduct_bits_per_s": max(sp_bits.values(), default=0.0),
            "all_paths_bits_per_s": bits,
            "elapsed_s": round(time.perf_counter() - t_start, 1),
            **receiver,
            **parity,
            **({"errors": errors} if errors else {}),
        }

    def checkpoint() -> None:
        print(json.dumps(state()), file=sys.stderr, flush=True)

    rx = _make_inputs(code, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(rx)

    # Pallas VMEM-resident kernels (the production path on TPU):
    # "fast" = bf16 aggregation (max throughput), "precise" = hi/lo split
    # (matched jnp-f32 hard decisions on every tested frame) — see
    # gr_ldpc_ece535a_tpu/ops/pallas_bp.py module docstring. One compiled
    # program per path (traced chain length) keeps the cold-compile count
    # at 4 for all four pallas timings; all four run unconditionally.
    for name, fn in (
        ("pallas_minsum_fast", lambda r: pallas_decode_minsum(
            r, code, iterations=iterations, mode="fast")),
        ("pallas_sumproduct_fast", lambda r: pallas_decode_sumproduct(
            r, code, iterations=iterations, mode="fast")),
        ("pallas_minsum_precise", lambda r: pallas_decode_minsum(
            r, code, iterations=iterations, mode="precise")),
        ("pallas_sumproduct_precise", lambda r: pallas_decode_sumproduct(
            r, code, iterations=iterations, mode="precise")),
    ):
        try:
            paths[name] = _retry_transient(time_decode, fn, rx)
        except Exception as e:  # noqa: BLE001 - fall back off-TPU
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        checkpoint()

    # exactness evidence: on-TPU parity counters over up to 1e6 frames
    # under the reference's early-exit semantics. Runs UNCONDITIONALLY on
    # TPU — the batch count shrinks with the budget instead of skipping
    # (sum-product always measures at least one 131072-frame batch).
    if platform != "tpu":
        errors["parity"] = "skipped: not on TPU"
    else:
        rem = remaining()
        n_batches = 8 if rem > 300 else (4 if rem > 180 else 2)
        try:
            parity = _retry_transient(_bench_parity, code,
                                      iterations=iterations,
                                      n_batches=n_batches,
                                      remaining=remaining)
        except Exception as e:  # noqa: BLE001
            errors["parity"] = f"{type(e).__name__}: {e}"[:200]
    checkpoint()

    # system-level: the mesh streaming receiver end-to-end (acquisition +
    # sharded decode + host repack), BASELINE configs[5]'s single-chip
    # slice. Includes host IO and result fetch, so it is a pipeline
    # number, not a kernel number; its wire-floor breakdown
    # (decode_s/fetch_s/wire_mb_s/wire_frac) is part of the record.
    if remaining() < 45.0:
        errors["receiver"] = "skipped: bench budget exhausted"
    else:
        try:
            receiver = _bench_receiver(code)
        except Exception as e:  # noqa: BLE001
            errors["receiver"] = f"{type(e).__name__}: {e}"[:200]
    checkpoint()

    # XLA reference timings last: the least perishable numbers, refreshed
    # when budget allows so the pallas speedup stays honestly computable
    for name, fn in (
        ("xla_minsum", lambda r: decode_minsum(
            r, code, iterations=iterations, early_exit=False)),
        ("xla_sumproduct", lambda r: decode_sumproduct(
            r, code, iterations=iterations, early_exit=False)),
    ):
        if remaining() < 45.0:
            errors[name] = "skipped: bench budget exhausted"
            continue
        try:
            paths[name] = _retry_transient(time_decode, fn, rx)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        checkpoint()

    print(json.dumps(state()))


if __name__ == "__main__":
    main()
