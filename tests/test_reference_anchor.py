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


@pytest.mark.skipif(not toolchain_available(),
                    reason="g++ or the reference checkout is unavailable")
def test_waterfall_inside_umfpack_binary_bands():
    """The SECOND reference simulator, anchored the same way. Its
    "BitFlip" is a different algorithm from ldpc_lapack's (a Gallager-A
    message-passing decoder, ldpc_umfpack.cpp:384-470) — replicated as
    decode_bitflip_mp; comparing against the majority flip instead fails
    this test with ~9 systematic band violations."""
    import json

    from run_reference_lapack import (METHOD_MAP_UMF, OURS_UMF, REF_SRC_UMF)

    assert OURS_UMF.exists(), "recorded (16,8) waterfall artifact missing"
    ref = parse_output(compile_and_run(src=REF_SRC_UMF), METHOD_MAP_UMF)
    ours = json.loads(OURS_UMF.read_text())
    report = compare(ref, ours, conf=0.999, method_map=METHOD_MAP_UMF)
    assert report["total_violations"] <= 2, json.dumps(report["methods"],
                                                       indent=1)
    # sanity: the run explored the waterfall. At -7 dB the tiny (16,8)
    # code converges many garbage frames onto SOME valid codeword, so the
    # DETECTED count sits well below 30 — assert the slope, not saturation
    assert ref["fer_count_minsum"][0] > 10
    assert ref["fer_count_minsum"][-1] == 0
