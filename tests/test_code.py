"""Tests for GF(2) systematization and LDPC code compilation."""

import numpy as np
import pytest

from kmldpc_tpu.code import compile_code, load_code
from kmldpc_tpu.code import gf2
from kmldpc_tpu.io.hmatrix import ParityCheckMatrix, parse_hmatrix


def _random_hmat(rng, rows, cols, deg):
    cols_per_row = np.stack(
        [rng.choice(cols, size=deg, replace=False) for _ in range(rows)]
    )
    row_idx = np.repeat(np.arange(rows, dtype=np.int32), deg)
    col_idx = cols_per_row.reshape(-1).astype(np.int32)
    return ParityCheckMatrix(
        num_row=rows, num_col=cols, rank=rows, lifting_factor=None,
        row_idx=row_idx, col_idx=col_idx,
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2, size=(13, 131)).astype(np.uint8)
    np.testing.assert_array_equal(gf2.unpack_rows(gf2.pack_rows(h), 131), h)


def test_get_set_swap_cols():
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2, size=(9, 130)).astype(np.uint8)
    hp = gf2.pack_rows(h)
    np.testing.assert_array_equal(gf2.get_col(hp, 127), h[:, 127])
    np.testing.assert_array_equal(gf2.get_col(hp, 128), h[:, 128])
    gf2.swap_cols(hp, 5, 129)
    out = gf2.unpack_rows(hp, 130)
    np.testing.assert_array_equal(out[:, 5], h[:, 129])
    np.testing.assert_array_equal(out[:, 129], h[:, 5])


def test_forward_systematize_identity_left():
    """After forward elimination, enc_h = [I | P] (full-rank case)."""
    rng = np.random.default_rng(2)
    hmat = _random_hmat(rng, 20, 40, 5)
    h = hmat.to_dense()
    enc_h, perm, rank = gf2.systematize_forward(h)
    assert rank <= 20
    np.testing.assert_array_equal(enc_h[:rank, :rank], np.eye(rank, dtype=np.uint8))
    # enc_h is the permuted H after row ops: row space must match.
    # Check column permutation consistency: enc_h columns are H[:, perm]
    # transformed by invertible row ops => same GF(2) null space.
    hp = h[:, perm]
    # every codeword of enc_h is a codeword of hp
    ns = _null_space_gf2(enc_h[:rank])
    for v in ns.T[:10]:
        assert not gf2.gf2_matvec(hp, v).any()


def test_reverse_systematize_identity_right():
    rng = np.random.default_rng(3)
    hmat = _random_hmat(rng, 20, 40, 5)
    h = hmat.to_dense()
    enc_h, perm, rank = gf2.systematize_reverse(h)
    if rank == 20:  # full rank: identity occupies the rightmost columns
        np.testing.assert_array_equal(
            enc_h[:, 20:], np.eye(20, dtype=np.uint8)
        )


def _null_space_gf2(a):
    """Basis of the GF(2) null space of a (rows independent), via rref."""
    a = a.copy().astype(np.uint8)
    rows, cols = a.shape
    pivots = []
    r = 0
    for c in range(cols):
        if r >= rows:
            break
        nz = np.nonzero(a[r:, c])[0]
        if nz.size == 0:
            continue
        i = r + nz[0]
        a[[r, i]] = a[[i, r]]
        for m in range(rows):
            if m != r and a[m, c]:
                a[m] ^= a[r]
        pivots.append(c)
        r += 1
    free = [c for c in range(cols) if c not in pivots]
    basis = np.zeros((cols, len(free)), dtype=np.uint8)
    for k, fc in enumerate(free):
        basis[fc, k] = 1
        for rr, pc in enumerate(pivots):
            if a[rr, fc]:
                basis[pc, k] = 1
    return basis


@pytest.mark.parametrize("fname", ["PEG2304regular0.5.txt", "5GLDPCBG2a3_R12_K960.txt"])
def test_compiled_code_consistency(assets, fname):
    code = load_code(str(assets / fname))
    rng = np.random.default_rng(7)
    h = code.dense_h()
    for _ in range(5):
        uu = rng.integers(0, 2, code.code_dim).astype(np.uint8)
        cc = code.encode_reference(uu)
        # valid codeword of the (permuted) decoding graph
        assert not gf2.gf2_matvec(h, cc).any()
        # info bits recoverable at the documented positions
        np.testing.assert_array_equal(cc[code.info_slice], uu)


def test_adjacency_tables(assets):
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    e = code.num_edges
    # col_edge_idx gathers exactly the edges of each column
    for c in [0, 100, code.num_col - 1]:
        idxs = code.col_edge_idx[c][code.col_mask[c]]
        assert (code.edge_col[idxs] == c).all()
    # edge_rowslot round-trips through row_edge_idx
    flat_row_idx = code.row_edge_idx.reshape(-1)
    np.testing.assert_array_equal(
        flat_row_idx[code.edge_rowslot], np.arange(e, dtype=np.int32)
    )
    # row_edge_col agrees with edge_col
    rec = code.row_edge_col.reshape(-1)[code.edge_rowslot]
    np.testing.assert_array_equal(rec, code.edge_col)


def test_5g_puncture_geometry(assets):
    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    assert code.is_5g
    assert code.lifting_factor == 96
    assert code.punct == 192
    assert code.tx_len == 1920
    assert code.code_dim == 960
    # rate convention: K / punctured length (binary5gldpccodec.cc:33)
    assert code.rate == pytest.approx(0.5)
