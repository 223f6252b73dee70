"""Pinned golden vectors — the regenerated analog of the reference QA tests.

The reference's python/qa_ldpc_encoder_bc.py and qa_ldpc_decoder_cb.py pin
MATLAB-generated symbol/byte tuples, but those fixtures are stale (they
match the commented-out (16,8) code, not the active 32x64 H — SURVEY.md §4).
These are the regenerated equivalents for the active code, produced from the
host GF(2) reference path (codes.LdpcCode.encode_ref) and cross-checked at
generation time against the C++ double oracle; pinning the literals guards
against a simultaneous regression of every live implementation.

Input bytes 0x01..0x08 (two 4-byte frames). Each frame's 64 BPSK symbols are
stored as 8 hex bytes: bit 1 -> +1, bit 0 -> -1, MSB-first; codeword order
[check(32) | data(32)] makes the last 4 hex bytes echo the input bytes.
"""

import numpy as np

from gr_ldpc_ece535a_tpu.codes import get_code
from gr_ldpc_ece535a_tpu.ops import encode_to_symbols, make_decoder, pack_bits_np

GOLDEN_INPUT = bytes(range(1, 9))
GOLDEN_FRAMES_HEX = ["eaa4a92201020304", "65d492b605060708"]


def _golden_symbols() -> np.ndarray:
    bits = np.unpackbits(
        np.frombuffer(bytes.fromhex("".join(GOLDEN_FRAMES_HEX)), np.uint8))
    return (2.0 * bits.reshape(2, 64) - 1.0).astype(np.float32)


def test_encoder_golden_vectors():
    import jax.numpy as jnp
    code = get_code("block_32_64")
    data = np.frombuffer(GOLDEN_INPUT, np.uint8).reshape(2, 4)
    sym = np.asarray(encode_to_symbols(jnp.asarray(data), code))
    np.testing.assert_array_equal(sym, _golden_symbols())


def test_decoder_golden_vectors_all_methods():
    """Clean golden frames must decode back to the input bytes with every
    method (the reference QA decoder test, regenerated)."""
    import jax.numpy as jnp
    code = get_code("block_32_64")
    sym = jnp.asarray(_golden_symbols())
    for method in (0, 1, 2, 3):
        vhat = np.asarray(make_decoder(code, method=method)(sym))
        out = pack_bits_np(vhat[:, code.M:].astype(np.uint8)).reshape(-1)
        assert bytes(out) == GOLDEN_INPUT, f"method {method}"


def test_native_oracle_agrees_on_golden():
    from gr_ldpc_ece535a_tpu import runtime
    if not runtime.native_available():
        import pytest
        pytest.skip("no C++ toolchain")
    code = get_code("block_32_64")
    sym = _golden_symbols().astype(np.float64)
    for method in (0, 1, 2):
        vhat = runtime.decode_batch(sym, code.H, iterations=5, method=method)
        out = pack_bits_np(vhat[:, code.M:].astype(np.uint8)).reshape(-1)
        assert bytes(out) == GOLDEN_INPUT
