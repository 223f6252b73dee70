"""Round-5 evidence: XLA-f32 (and pallas-precise) vs C++-double hard-decision
parity at million-frame scale (VERDICT r4 item 1).

Closes the last open leg of the bit-exactness chain: BENCH r4 already
quantifies pallas<->XLA-f32 at 1,048,576 frames on TPU; this tool decodes the
SAME frames (same keys, same Eb/N0 4 dB, same 20-iteration early-exit
semantics) with the native C++ double-precision batch oracle
(runtime/native/ldpc_native.cc, ldpc_decode_batch — the behavioral replica of
/root/reference/lib/ldpc_decoder_cb_impl.cc:309-412 minsum and :478-557
sumproduct) and records XLA-f32<->C++-double and pallas<->C++-double mismatch
counts with syndrome decompositions in results/parity_f64_r5.json.

Two phases (the TPU tunnel serializes to one client, so device work is
front-loaded and the long CPU decode releases the chip):

    python tools/parity_f64_r5.py tpu    # generate rx + XLA/pallas decodes
    python tools/parity_f64_r5.py cpu    # C++ f64 oracle decode + compare

The tpu phase stages (rx, vx, vp) per batch under results/tmp_parity_r5/;
the cpu phase consumes and deletes them.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
TMP = REPO / "results" / "tmp_parity_r5"
OUT = REPO / "results" / "parity_f64_r5.json"

BATCH = 1 << 17
N_BATCHES = 8
ITERATIONS = 20
EBN0_DB = 4.0
METHODS = (("minsum", 0), ("sumproduct", 1))


def phase_tpu() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import _make_inputs
    from gr_ldpc_ece535a_tpu.codes import get_code
    from gr_ldpc_ece535a_tpu.ops import decode_minsum, decode_sumproduct
    from gr_ldpc_ece535a_tpu.ops.pallas_bp import (
        pallas_decode_minsum, pallas_decode_sumproduct)

    code = get_code("block_32_64")
    on_tpu = jax.devices()[0].platform == "tpu"
    fns = {
        "minsum": (decode_minsum, pallas_decode_minsum),
        "sumproduct": (decode_sumproduct, pallas_decode_sumproduct),
    }
    TMP.mkdir(parents=True, exist_ok=True)
    for i in range(N_BATCHES):
        path = TMP / f"batch_{i}.npz"
        if path.exists():
            continue
        rx = _make_inputs(code, BATCH, jax.random.PRNGKey(1000 + i))
        save = {"rx": np.asarray(rx)}
        for name, (xfn, pfn) in fns.items():
            xf = jax.jit(lambda r, f=xfn: f(r, code, iterations=ITERATIONS,
                                            early_exit=True))
            save[f"vx_{name}"] = np.asarray(xf(rx)).astype(np.int8)
            if on_tpu:
                pf = jax.jit(lambda r, f=pfn: f(
                    r, code, iterations=ITERATIONS, mode="precise",
                    early_exit=True))
                save[f"vp_{name}"] = np.asarray(pf(rx)).astype(np.int8)
        np.savez(path, **save)
        print(f"[tpu] batch {i} staged ({path.stat().st_size / 1e6:.1f} MB)",
              flush=True)
    print("[tpu] done", flush=True)


def _decode_chunk(args):
    rx64, H, method = args
    sys.path.insert(0, str(REPO))
    from gr_ldpc_ece535a_tpu.runtime import decode_batch

    return decode_batch(rx64, H, iterations=ITERATIONS, method=method)


def _syndrome_ok(v: np.ndarray, H: np.ndarray) -> np.ndarray:
    return ((v.astype(np.int32) @ H.T.astype(np.int32)) % 2 == 0).all(axis=1)


def _decomp(va: np.ndarray, vb: np.ndarray, H: np.ndarray) -> dict:
    """Mismatch count + syndrome decomposition of va (ours) vs vb (oracle)."""
    diff = (va != vb).any(axis=1)
    idx = np.nonzero(diff)[0]
    ok_a = _syndrome_ok(va[idx], H)
    ok_b = _syndrome_ok(vb[idx], H)
    return {
        "mismatch": int(diff.sum()),
        "both_syndrome_fail": int((~ok_a & ~ok_b).sum()),
        "both_valid_different": int((ok_a & ok_b).sum()),
        "only_f64_valid": int((ok_b & ~ok_a).sum()),
        "only_ours_valid": int((ok_a & ~ok_b).sum()),
    }


def phase_cpu() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from concurrent.futures import ProcessPoolExecutor

    sys.path.insert(0, str(REPO))
    from gr_ldpc_ece535a_tpu.codes import get_code

    code = get_code("block_32_64")
    H = code.H.astype(np.int8)
    nproc = min(2, os.cpu_count() or 1)
    acc: dict = {m: {"xla_vs_f64": None, "pallas_vs_f64": None, "frames": 0}
                 for m, _ in METHODS}

    def add(dst, d):
        if dst is None:
            return dict(d)
        for k in d:
            dst[k] += d[k]
        return dst

    t_start = time.perf_counter()
    with ProcessPoolExecutor(max_workers=nproc) as pool:
        for i in range(N_BATCHES):
            path = TMP / f"batch_{i}.npz"
            data = np.load(path)
            rx64 = data["rx"].astype(np.float64)
            for name, method in METHODS:
                chunks = np.array_split(rx64, nproc * 4)
                t0 = time.perf_counter()
                v64 = np.concatenate(list(pool.map(
                    _decode_chunk, [(c, H, method) for c in chunks])))
                dt = time.perf_counter() - t0
                acc[name]["xla_vs_f64"] = add(
                    acc[name]["xla_vs_f64"],
                    _decomp(data[f"vx_{name}"], v64, H))
                if f"vp_{name}" in data.files:
                    acc[name]["pallas_vs_f64"] = add(
                        acc[name]["pallas_vs_f64"],
                        _decomp(data[f"vp_{name}"], v64, H))
                acc[name]["frames"] += len(rx64)
                print(f"[cpu] batch {i} {name}: {dt:.0f}s, "
                      f"cum {json.dumps(acc[name]['xla_vs_f64'])}",
                      flush=True)
            data.close()
            path.unlink()
    result = {
        "what": ("hard-decision parity of the XLA f32 path (and the pallas "
                 "precise kernels) against the native C++ double-precision "
                 "batch oracle (ldpc_native.cc ldpc_decode_batch), same "
                 "frames/keys/semantics as the BENCH parity section"),
        "code": "block_32_64",
        "ebn0_db": EBN0_DB,
        "iterations": ITERATIONS,
        "semantics": "early_exit(reference)",
        "frames": {m: acc[m]["frames"] for m, _ in METHODS},
        "results": acc,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "oracle": "runtime/native/ldpc_native.cc ldpc_decode_batch (float64)",
        "reference_spec": ("/root/reference/lib/ldpc_decoder_cb_impl.cc:"
                           "309-412 (minsum), 478-557 (sumproduct)"),
    }
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    try:
        TMP.rmdir()
    except OSError:
        pass
    print(f"[cpu] wrote {OUT}", flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if phase == "tpu":
        phase_tpu()
    elif phase == "cpu":
        phase_cpu()
    else:
        raise SystemExit(f"unknown phase {phase!r}")
