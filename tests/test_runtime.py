"""Native C++ runtime tests: decoder-oracle agreement, ring buffer, BMP scan.

The native decoders and the Python float64 oracle (ops/oracle.py) are two
independent implementations of the same behavioral spec; bit-for-bit
agreement across codes, SNRs, and methods is the cross-validation that makes
either one trustworthy as the golden-vector generator.
"""

import numpy as np
import pytest

from gr_ldpc_ece535a_tpu import runtime
from gr_ldpc_ece535a_tpu.codes import get_code
from gr_ldpc_ece535a_tpu.ops import oracle

pytestmark = pytest.mark.skipif(
    not runtime.native_available(), reason="no C++ toolchain")


@pytest.mark.parametrize("code_name", ["block_32_64", "sim_8_16", "sim_50_100"])
@pytest.mark.parametrize("method,oracle_fn", [
    (0, oracle.decode_log_domain_simple),
    (1, oracle.decode_sum_product_soft),
    (2, oracle.decode_bit_flipping),
])
def test_native_decoders_match_python_oracle(code_name, method, oracle_fn):
    code = get_code(code_name)
    rng = np.random.default_rng(7)
    B = 24
    d = rng.integers(0, 2, (B, code.K)).astype(np.int8)
    c = code.encode_ref(d.T).T
    u = np.concatenate([c, d], axis=1)
    tx = 2.0 * u - 1.0
    for snr in (2.0, 6.0):
        sigma = 10 ** (-snr / 20)
        rx = tx + sigma * rng.standard_normal(tx.shape)
        got = runtime.decode_batch(rx, code.H, iterations=5, method=method)
        want = np.stack([oracle_fn(rx[b], code.H, 5) for b in range(B)])
        np.testing.assert_array_equal(got, want)


def test_native_hard_decoder():
    rx = np.array([[-1.5, 0.0, 2.0, -0.1]])
    got = runtime.decode_batch(rx, np.zeros((1, 4), np.int8), method=3)
    np.testing.assert_array_equal(got[0], [0, 1, 1, 0])


def test_native_check_frame():
    code = get_code("block_32_64")
    d = np.random.default_rng(0).integers(0, 2, (code.K,)).astype(np.int8)
    c = code.encode_ref(d.reshape(-1, 1))[:, 0]
    u = np.concatenate([c, d])
    assert runtime.check_frame(u, code.H, 0) == 0
    bad = u.copy()
    bad[0] ^= 1
    w = runtime.check_frame(bad, code.H, code.M)
    assert w == oracle.check_frame(bad, code.H, code.M) > 0
    # early abort: threshold 0 stops counting past 1
    assert runtime.check_frame(bad, code.H, 0) == oracle.check_frame(bad, code.H, 0)


def test_ring_buffer_wraparound_stress():
    ring = runtime.RingBuffer(64)
    assert ring.capacity == 64
    rng = np.random.default_rng(1)
    model = bytearray()
    sent = bytearray()
    received = bytearray()
    src = bytes(rng.integers(0, 256, 10_000, dtype=np.uint8).tolist())
    pos = 0
    while len(received) < len(src):
        if pos < len(src) and rng.random() < 0.6:
            n = int(rng.integers(1, 100))
            pushed = ring.push(src[pos : pos + n])
            assert pushed <= min(n, len(src) - pos)
            model.extend(src[pos : pos + pushed])
            sent.extend(src[pos : pos + pushed])
            pos += pushed
        else:
            n = int(rng.integers(1, 100))
            got = ring.pop(n)
            assert bytes(model[: len(got)]) == got
            del model[: len(got)]
            received.extend(got)
        assert len(ring) == len(model)
    assert bytes(received) == src


def test_ring_buffer_peek_and_overflow():
    ring = runtime.RingBuffer(16)
    assert ring.push(b"x" * 40) == 16  # overflow clamps
    assert ring.peek(8) == b"x" * 8
    assert len(ring) == 16
    assert ring.pop(100) == b"x" * 16
    assert len(ring) == 0
    assert ring.pop(4) == b""


def _tiny_bmp(payload: bytes) -> bytes:
    size = 14 + 40 + len(payload)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
           + (54).to_bytes(4, "little"))
    return hdr + (40).to_bytes(4, "little") + b"\x00" * 36 + payload


def test_bmp_scanner_matches_python_sink():
    img1 = _tiny_bmp(b"\x11" * 64)
    img2 = _tiny_bmp(b"\x22" * 7)
    stream = b"ga" + img1 + b"rbage" + img2 + b"\x00" * 30
    sc = runtime.BmpScanner()
    # feed in awkward chunk sizes so headers split across feeds
    for i in range(0, len(stream), 5):
        sc.feed(stream[i : i + 5])
    assert sc.pop_image() == img1
    assert sc.pop_image() is None  # img2 not flushed until next header/EOF
    sc.finish()
    assert sc.pop_image() == img2
    assert sc.headers_found == 2
    sc.close()


def test_bmp_scanner_incomplete_image_dropped():
    """A header whose promised file size never arrives is dropped when the
    next header appears (same as the Python sink / reference)."""
    truncated = _tiny_bmp(b"\x33" * 100)[:60]  # promises more than present
    img = _tiny_bmp(b"\x44" * 8)
    sc = runtime.BmpScanner()
    sc.feed(truncated + img)
    sc.finish()
    assert sc.pop_image() == img
    assert sc.pop_image() is None


def test_native_pipeline_identity_loopback(tmp_path):
    """Threaded executor: file-source and BMP-sink threads around an
    identity device stage must reconstruct the image exactly."""
    from gr_ldpc_ece535a_tpu.runtime import NativePipeline, native_available
    if not native_available():
        pytest.skip("no native toolchain")
    src = tmp_path / "img.bmp"
    import numpy as np
    from gr_ldpc_ece535a_tpu.utils.bmp import make_bmp
    raw = make_bmp(np.arange(192, dtype=np.uint8).reshape(8, 8, 3))
    src.write_bytes(raw)
    out = tmp_path / "out.bmp"
    p = NativePipeline(ring_capacity=1 << 12)
    try:
        p.start_file_source(str(src), repeats=3, align=4)
        p.start_bmp_sink(str(out))
        while True:
            chunk = p.pull(257, min_bytes=7)  # odd sizes exercise wrap/rem
            if not chunk:
                break
            p.push(chunk)
        p.finish()
        assert p.images_written == 3
        assert p.headers_found == 3
        assert out.read_bytes() == raw
        assert p.bytes_in == p.bytes_out
    finally:
        p.close()


def test_native_pipeline_missing_file():
    from gr_ldpc_ece535a_tpu.runtime import NativePipeline, native_available
    if not native_available():
        pytest.skip("no native toolchain")
    p = NativePipeline()
    try:
        with pytest.raises(FileNotFoundError):
            p.start_file_source("/nonexistent/file.bmp")
    finally:
        p.close()


def test_native_concurrency_tsan_clean():
    """ThreadSanitizer pass over the SPSC ring and pipeline executor (the
    reference ships no race detection; SURVEY.md section 5). Skips when the
    toolchain can't build TSAN binaries."""
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    script = Path(__file__).resolve().parents[1] / "tools" / "tsan_check.sh"
    proc = subprocess.run(["bash", str(script)], capture_output=True,
                          text=True, timeout=240)
    if proc.returncode != 0 and ("unrecognized" in proc.stderr
                                 or "cannot find" in proc.stderr):
        pytest.skip(f"tsan unsupported: {proc.stderr[-200:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PASS" in proc.stdout


def test_cmake_build_configures():
    """The CMake scaffold (reference build-system analog) must configure and
    build the shared library + stress binary and pass ctest."""
    import shutil
    import subprocess
    import tempfile
    from pathlib import Path

    if shutil.which("cmake") is None:
        pytest.skip("no cmake")
    src = Path(__file__).resolve().parents[1] / (
        "gr_ldpc_ece535a_tpu/runtime/native")
    with tempfile.TemporaryDirectory() as bd:
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        r = subprocess.run(
            ["cmake", "-S", str(src), "-B", bd, "-DLDPC_STRESS=ON", *gen],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr[-1000:]
        r = subprocess.run(["cmake", "--build", bd], capture_output=True,
                           text=True, timeout=240)
        assert r.returncode == 0, r.stderr[-1000:]
        r = subprocess.run(["ctest", "--test-dir", bd, "--output-on-failure"],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stdout[-1000:] + r.stderr[-500:]
