"""BER/FER parity anchored to the REFERENCE's own binary (VERDICT r4 #4).

Compiles /root/reference/apps/ldpc_lapack.cpp unmodified against the
standard-behavior shim headers in tools/refshim/, runs its (100,50)
35-point / 30-frames-per-point experiment, and asserts our recorded
10^6-frames-per-point waterfall falls inside Clopper-Pearson bands of the
binary's frame-error counts. The binary seeds from time(0), so each test
run is a fresh independent experiment; at 99.9% bands over 140 points the
expected false-violation count is 0.14 — two violations are tolerated so
the test is deterministic-in-practice while still pinning the curve.
"""

import json
import shutil
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from run_reference_lapack import (  # noqa: E402
    OURS, REF_SRC, compare, compile_and_run, parse_output,
    toolchain_available)


@pytest.mark.skipif(not toolchain_available(),
                    reason="g++ or the reference checkout is unavailable")
def test_waterfall_inside_reference_binary_bands():
    assert OURS.exists(), "recorded waterfall artifact missing"
    ref = parse_output(compile_and_run())
    ours = json.loads(OURS.read_text())
    report = compare(ref, ours, conf=0.999)
    assert report["total_violations"] <= 2, json.dumps(report["methods"],
                                                       indent=1)
    # the run must actually have explored the waterfall: errors at low SNR,
    # BP decoders clean at high SNR
    assert ref["fer_count_minsum"][0] == 30
    assert ref["fer_count_minsum"][-1] == 0
    assert ref["fer_count_sumproduct"][-1] == 0


@pytest.mark.skipif(not toolchain_available(),
                    reason="g++ or the reference checkout is unavailable")
def test_reference_source_unmodified():
    # the anchor only counts if the binary is built from the pristine
    # reference source; the shims provide headers, never patched code
    text = REF_SRC.read_text()
    assert "decodeSumProductSoft" in text and "LAPACKE_dgesv" in text
