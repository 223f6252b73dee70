"""Compile and run the REFERENCE's own BER simulators, and anchor our
curves to them (VERDICT r4 item 4).

`/root/reference/apps/ldpc_lapack.cpp` and `ldpc_umfpack.cpp` are
framework-free (Boost.uBLAS + LAPACKE / SuiteSparse UMFPACK + the standard
library). This image ships none of those, so `tools/refshim/` provides
minimal standard-behavior shim headers for exactly the API slices the apps
use (see each header's comment); the reference SOURCES compile unmodified.
Both experiments then run as the reference's own binaries — ldpc_lapack's
(100,50) 35-point / 4-decoder run (ldpc_lapack.cpp:533-820) and
ldpc_umfpack's (16,8) 29-point / 3-decoder run (ldpc_umfpack.cpp:503-760) —
their MATLAB-format stdout is parsed, and our recorded 10^6-frames-per-
point waterfalls are asserted to fall inside Clopper-Pearson confidence
bands of the binaries' 30-frame FER estimates at every operating point.

Caveat (recorded in the artifact): the RNG shim maps boost::random onto the
std:: equivalents — same mt19937, but distribution draw order may differ
from a stock Boost build, and the binary seeds from time(0) anyway; the
anchor is statistical, which is all 30 frames/point can support.

Writes results/reference_lapack_run.json. Reused by
tests/test_reference_anchor.py.
"""

from __future__ import annotations

import json
import re
import shutil
import subprocess
import tempfile
import time
from math import comb
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_SRC = Path("/root/reference/apps/ldpc_lapack.cpp")
REF_SRC_UMF = Path("/root/reference/apps/ldpc_umfpack.cpp")
REF_INC = Path("/root/reference/apps")
SHIM = REPO / "tools" / "refshim"
OURS = REPO / "results" / "waterfall_sim_50_100_4dec_1e6.json"
OURS_UMF = REPO / "results" / "waterfall_sim_8_16_4dec_1e6.json"
OUT = REPO / "results" / "reference_lapack_run.json"
OUT_UMF = REPO / "results" / "reference_umfpack_run.json"

# reference decoder index -> our method name (ldpc_lapack.cpp:647-664;
# ldpc_umfpack.cpp runs three, :617-629 — and its "BitFlip" is a
# DIFFERENT algorithm from ldpc_lapack's/the GR module's (a Gallager-A
# message-passing decoder, ldpc_umfpack.cpp:384-470), replicated here as
# "bitflip_mp". Anchoring against the plain majority flip produced 9/87
# systematic band violations — the discovery that exposed the variant.
METHOD_MAP = {0: "hard", 1: "bitflip", 2: "minsum", 3: "sumproduct"}
METHOD_MAP_UMF = {0: "hard", 1: "bitflip_mp", 2: "minsum"}
FRAMES = 30  # ldpc_lapack.cpp:541 / ldpc_umfpack.cpp:513


def toolchain_available() -> bool:
    return (shutil.which("g++") is not None and REF_SRC.exists())


def compile_and_run(timeout: float = 600.0, src: Path = REF_SRC) -> str:
    """Build a reference binary against the shims and return its stdout."""
    with tempfile.TemporaryDirectory() as td:
        exe = Path(td) / src.stem
        cmd = ["g++", "-O2", "-std=c++14", "-I", str(SHIM), "-I",
               str(REF_INC), "-o", str(exe), str(src)]
        subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)
        run = subprocess.run([str(exe)], check=True, capture_output=True,
                             text=True, timeout=timeout)
        return run.stdout


def parse_output(text: str, method_map: dict = METHOD_MAP) -> dict:
    """Parse the MATLAB-format stdout: EbN0 grid, berK, ferK."""

    def grab(name: str) -> list[float]:
        m = re.search(rf"{name}=\[(.*?)\];", text, re.S)
        if m is None:
            raise ValueError(f"{name} not found in reference output")
        return [float(v) for v in re.split(r"[,\s]+", m.group(1).strip())
                if v]

    out = {"ebn0_db": grab("EbN0")}
    for k, name in method_map.items():
        out[f"ber_{name}"] = grab(f"ber{k}")
        out[f"fer_count_{name}"] = [int(round(v)) for v in grab(f"fer{k}")]
    npts = len(out["ebn0_db"])
    for v in out.values():
        assert len(v) == npts, "ragged reference output"
    return out


def _binom_cdf(k: int, n: int, p: float) -> float:
    return sum(comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k + 1))


def clopper_pearson(k: int, n: int, conf: float = 0.999) -> tuple[float, float]:
    """Exact binomial CI by bisection (no scipy in this image)."""
    a = (1.0 - conf) / 2.0

    def bisect(f, lo, hi):
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if f(mid):
                hi = mid
            else:
                lo = mid
        return 0.5 * (lo + hi)

    lo = 0.0 if k == 0 else bisect(
        lambda p: 1.0 - _binom_cdf(k - 1, n, p) > a, 0.0, 1.0)
    hi = 1.0 if k == n else bisect(lambda p: _binom_cdf(k, n, p) < a, 0.0, 1.0)
    return lo, hi


def compare(ref: dict, ours: dict, conf: float = 0.999,
            method_map: dict = METHOD_MAP) -> dict:
    """Per-method / per-point band check of our detected FER against the
    reference run's 30-frame counts."""
    grid_ok = [round(a, 6) == round(b, 6)
               for a, b in zip(ref["ebn0_db"], ours["ebn0_db"])]
    assert all(grid_ok) and len(ref["ebn0_db"]) == len(ours["ebn0_db"]), \
        "Eb/N0 grids differ"
    report = {"conf": conf, "frames_ref": FRAMES,
              "frames_ours": ours["frames_per_point"], "methods": {}}
    total_viol = 0
    for name in method_map.values():
        viol = []
        for i, k in enumerate(ref[f"fer_count_{name}"]):
            lo, hi = clopper_pearson(k, FRAMES, conf)
            p_ours = ours["fer_detected"][name][i]
            if not (lo <= p_ours <= hi):
                viol.append({"ebn0_db": ref["ebn0_db"][i], "ref_count": k,
                             "band": [lo, hi], "ours": p_ours})
        report["methods"][name] = {"n_points": len(ref["ebn0_db"]),
                                   "violations": viol}
        total_viol += len(viol)
    report["total_violations"] = total_viol
    return report


def _run_one(src: Path, ours_path: Path, out_path: Path,
             method_map: dict, src_lines: str) -> dict:
    t0 = time.perf_counter()
    stdout = compile_and_run(src=src)
    ref = parse_output(stdout, method_map)
    ours = json.loads(ours_path.read_text())
    report = compare(ref, ours, method_map=method_map)
    artifact = {
        "what": (f"the reference's OWN {src.name} experiment, compiled "
                 "unmodified against tools/refshim/ standard-behavior "
                 "shims, vs our 1e6-frames-per-point waterfall"),
        "reference_source": str(src) + ":" + src_lines,
        "seeded": "time(0) (the reference's own choice) — run is stochastic",
        "rng_caveat": ("boost::random shimmed to std:: equivalents: same "
                       "mt19937, draw order of the distributions may differ "
                       "from a stock Boost build; statistics identical"),
        "reference_run": ref,
        "ours_file": ours_path.name,
        "ours_ber": {m: ours["ber"][m] for m in method_map.values()},
        "ours_fer_detected": {m: ours["fer_detected"][m]
                              for m in method_map.values()},
        "band_check": report,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    out_path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps({"src": src.name,
                      "total_violations": report["total_violations"],
                      "points": len(method_map) * len(ref["ebn0_db"]),
                      "saved": str(out_path)}))
    return report


def main() -> None:
    _run_one(REF_SRC, OURS, OUT, METHOD_MAP, "533-820")
    _run_one(REF_SRC_UMF, OURS_UMF, OUT_UMF, METHOD_MAP_UMF, "503-760")


if __name__ == "__main__":
    main()
