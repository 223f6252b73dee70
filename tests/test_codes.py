"""Codes layer: GF(2) reorder/LU, composed parity operator, generator."""

import numpy as np
import pytest

from gr_ldpc_ece535a_tpu.codes import (
    LdpcCode,
    get_code,
    get_sim_dsource,
    list_codes,
    make_ldpc,
    reorder_h,
)


@pytest.mark.parametrize("name", list_codes())
def test_reorder_factorization(name):
    """H_perm[:, :M] == L @ U over GF(2), L/U unit triangular."""
    code = get_code(name)
    M = code.M
    A = code.H[:, :M].astype(np.int64)
    LU = (code.L.astype(np.int64) @ code.U.astype(np.int64)) % 2
    assert np.array_equal(A, LU)
    assert np.all(np.diag(code.L) == 1)
    assert np.all(np.diag(code.U) == 1)
    assert np.array_equal(np.triu(code.L, 1), np.zeros_like(code.L))
    assert np.array_equal(np.tril(code.U, -1), np.zeros_like(code.U))


@pytest.mark.parametrize("name", list_codes())
def test_reorder_is_column_permutation(name):
    """Reordering only permutes columns; the multiset of columns is preserved."""
    code = get_code(name)
    orig = sorted(map(tuple, code.H_orig.T.tolist()))
    perm = sorted(map(tuple, code.H.T.tolist()))
    assert orig == perm


@pytest.mark.parametrize("name", list_codes())
def test_parity_operator_codewords(name):
    """c = P @ d mod 2 yields codewords of the reordered H."""
    code = get_code(name)
    rng = np.random.default_rng(42)
    d = rng.integers(0, 2, size=(code.K, 64), dtype=np.int8)
    c = (code.P.astype(np.int64) @ d) % 2
    u = np.concatenate([c, d], axis=0)
    syn = (code.H.astype(np.int64) @ u) % 2
    assert not syn.any()


def test_parity_operator_matches_triangular_solves():
    """P @ d equals the reference path (LU back-substitution) for all codes."""
    rng = np.random.default_rng(7)
    for name in list_codes():
        code = get_code(name)
        d = rng.integers(0, 2, size=(code.K, 16), dtype=np.int8)
        assert np.array_equal(code.encode_ref(d), (code.P.astype(np.int64) @ d) % 2)


def test_reorder_idempotent_pivot_quirk():
    """A row with no pivot at j >= i swaps with column 0 (reference quirk)."""
    # craft a matrix where row 1 has no entries at columns >= 1
    H = np.array(
        [
            [1, 0, 1, 1],
            [1, 0, 0, 0],
        ],
        dtype=np.int8,
    )
    Hp, L, U = reorder_h(H)
    # row 1 of F after eliminating col 0: [0,0,1,1]^[1,0,1,1]... the pivot
    # search finds F[1,1:] and may fall back to column 0; just assert the
    # function runs and returns triangular factors of the right shape
    assert Hp.shape == H.shape and L.shape == (2, 2) and U.shape == (2, 2)


def test_make_ldpc_properties():
    H = make_ldpc(32, 64, col_weight=3, seed=11)
    assert H.shape == (32, 64)
    assert np.all(H.sum(axis=0) == 3)
    code = LdpcCode.from_h(H, "gen_test")
    assert code.K == 32
    # encodable: random data round-trips the parity self-check in from_h
    assert code.P.shape == (32, 32)


def test_sim_dsource_fixture_shapes():
    for name, m in [("sim_50_100", 50), ("sim_8_16", 8), ("sim_32_64", 32), ("sim_24_48", 24)]:
        ds = get_sim_dsource(name)
        assert ds.shape == (m, 30)
        assert set(np.unique(ds)) <= {0, 1}


def test_block_code_identity_with_sim_32_64():
    """The block 32x64 H equals test_data.h's hData4 (SURVEY.md inventory #13)."""
    assert np.array_equal(get_code("block_32_64").H_orig, get_code("sim_32_64").H_orig)
