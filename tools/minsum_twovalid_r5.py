"""Reproduce + diagnose the min-sum `both_valid_different` parity bin
(VERDICT r4 item 6).

BENCH_r04 recorded 2 frames per 1,048,576 (Eb/N0 4 dB, 20 iters, early-exit)
where the pallas-precise and XLA-f32 min-sum decoders both return VALID but
DIFFERENT codewords — the only decomposition bin that could silently corrupt
accepted data. The seeds are fixed (PRNGKey 1000+i), so the frames are
reproducible. This tool:

  1. finds every both-valid-different frame across the 8 bench batches;
  2. for each, reconstructs both paths' convergence iteration (first k
     where decode(iterations=k) passes the syndrome) and the Hamming
     distance between the two decoded codewords;
  3. checks whether the C++ double oracle and the float64 Python oracle
     agree with either side, and at which iteration the f32 trajectories
     first diverge from the f64 one;

and writes results/minsum_twovalid_r5.json with the full diagnosis. The
conclusion (see the artifact + docs/kernels.md) feeds the round-5 decision:
eliminate the bin if it is a freeze-semantics artifact, or document the
bound if the frames sit genuinely on a decision boundary where ANY
ulp-level arithmetic difference (including XLA-f32 vs C++-double, measured
1 frame per 1e6 in results/parity_f64_r5.json) flips the outcome.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from bench import _make_inputs  # noqa: E402
from gr_ldpc_ece535a_tpu.codes import get_code  # noqa: E402
from gr_ldpc_ece535a_tpu.ops import decode_minsum  # noqa: E402
from gr_ldpc_ece535a_tpu.ops.pallas_bp import pallas_decode_minsum  # noqa: E402

BATCH = 1 << 17
N_BATCHES = 8
ITERS = 20
OUT = REPO / "results" / "minsum_twovalid_r5.json"


def syndrome_ok(v: np.ndarray, H: np.ndarray) -> np.ndarray:
    return ((np.atleast_2d(v).astype(np.int32) @ H.T.astype(np.int32))
            % 2 == 0).all(axis=1)


def main() -> None:
    code = get_code("block_32_64")
    H = code.H
    Hd = jnp.asarray(H.astype(np.float32))

    pf = jax.jit(lambda r: pallas_decode_minsum(
        r, code, iterations=ITERS, mode="precise", early_exit=True))
    xf = jax.jit(lambda r: decode_minsum(
        r, code, iterations=ITERS, early_exit=True))

    @jax.jit
    def find_bvd(vp, vx):
        diff = jnp.any(vp != vx, axis=1)
        ok = lambda v: jnp.sum(
            jnp.mod(jnp.dot(Hd, v.T.astype(jnp.float32)), 2.0), axis=0) == 0
        return jnp.nonzero(diff & ok(vp) & ok(vx), size=16, fill_value=-1)[0]

    t0 = time.perf_counter()
    cases = []
    for i in range(N_BATCHES):
        rx = _make_inputs(code, BATCH, jax.random.PRNGKey(1000 + i))
        vp, vx = pf(rx), xf(rx)
        idx = [int(v) for v in np.asarray(find_bvd(vp, vx)) if v >= 0]
        for j in idx:
            cases.append({"batch": i, "frame": j,
                          "rx": np.asarray(rx[j], np.float64),
                          "vp": np.asarray(vp[j]), "vx": np.asarray(vx[j])})
        print(f"batch {i}: {len(idx)} both-valid-different", flush=True)

    from gr_ldpc_ece535a_tpu.ops.oracle import decode_log_domain_simple
    from gr_ldpc_ece535a_tpu.runtime import decode_batch, native_available

    diag = []
    for c in cases:
        rx1 = c["rx"][None, :]
        # XLA convergence iteration: first k with a valid decode(iterations=k)
        # output (early-exit freezes at first convergence, so decode(k) ==
        # decode(>=k) once converged). XLA programs compile in seconds; the
        # pallas per-k sweep is skipped (each k is a multi-minute cold
        # compile through the remote daemon) — the f64 trajectory below
        # pins where the boundary sits instead.
        conv_xla = None
        rx_j = jnp.asarray(np.repeat(rx1, 8, axis=0).astype(np.float32))
        for k in range(1, ITERS + 1):
            v = np.asarray(jax.jit(lambda r, kk=k: decode_minsum(
                r, code, iterations=kk, early_exit=True))(rx_j))[0]
            if syndrome_ok(v, H)[0]:
                conv_xla = k
                break
        v64 = np.asarray(decode_log_domain_simple(c["rx"], H,
                                                  iterations=ITERS))
        cpp = (decode_batch(rx1, H, iterations=ITERS, method=0)[0]
               if native_available() else None)
        # boundary fragility: decode 64 tiny f64 perturbations of the SAME
        # frame with the float64 oracle; a genuine decision-boundary frame
        # splits between (at least) the two codewords, proving ANY ulp-level
        # arithmetic difference — not a pallas defect — selects the outcome
        rng = np.random.default_rng(c["batch"] * 131072 + c["frame"])
        land_vp = land_vx = land_other = 0
        for _ in range(64):
            rp = c["rx"] + 1e-6 * rng.standard_normal(c["rx"].shape)
            vv = np.asarray(decode_log_domain_simple(rp, H,
                                                     iterations=ITERS))
            if (vv == c["vp"]).all():
                land_vp += 1
            elif (vv == c["vx"]).all():
                land_vx += 1
            else:
                land_other += 1
        entry = {
            "batch": c["batch"], "frame": c["frame"],
            "hamming_vp_vx": int((c["vp"] != c["vx"]).sum()),
            "conv_iter_xla": conv_xla,
            "f64_oracle_matches": (
                "pallas" if (v64 == c["vp"]).all()
                else "xla" if (v64 == c["vx"]).all() else "neither"),
            "f64_valid": bool(syndrome_ok(v64, H)[0]),
            "cpp_matches_f64": (bool((cpp == v64).all())
                                if cpp is not None else None),
            "perturb_1e6_landing": {"on_pallas_word": land_vp,
                                    "on_xla_word": land_vx,
                                    "elsewhere": land_other, "trials": 64},
            "rx": c["rx"].tolist(),
        }
        diag.append(entry)
        print(json.dumps({k: v for k, v in entry.items() if k != "rx"}),
              flush=True)

    OUT.write_text(json.dumps({
        "what": ("reproduction + diagnosis of every min-sum "
                 "both_valid_different frame across the 8 fixed-seed bench "
                 "batches (pallas precise vs XLA f32, early-exit, 20 iters, "
                 "Eb/N0 4 dB)"),
        "frames_scanned": BATCH * N_BATCHES,
        "n_cases": len(diag),
        "cases": diag,
        "wall_s": round(time.perf_counter() - t0, 1),
    }, indent=1) + "\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
