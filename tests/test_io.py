"""Unit tests for asset parsers (SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

from kmldpc_tpu.io import parse_constellation, parse_hmatrix


def test_peg2304_header(assets):
    h = parse_hmatrix(str(assets / "PEG2304regular0.5.txt"))
    assert (h.num_row, h.num_col, h.rank) == (1152, 2304, 1152)
    assert h.lifting_factor is None
    assert h.num_edges == 6912  # regular: 1152 rows x degree 6
    assert (h.row_degrees() == 6).all()
    assert (h.col_degrees() == 3).all()


def test_5g_header(assets):
    h = parse_hmatrix(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    assert (h.num_row, h.num_col, h.rank) == (1152, 2112, 1152)
    assert h.lifting_factor == 96
    # K = N_no_punct - chk = 960; punctured tx length = 2112 - 192 = 1920.
    assert h.num_col - h.rank == 960


def test_hmatrix_dense_roundtrip(assets):
    h = parse_hmatrix(str(assets / "PEG2304regular0.5.txt"))
    dense = h.to_dense()
    assert dense.sum() == h.num_edges
    assert (dense[h.row_idx, h.col_idx] == 1).all()


@pytest.mark.parametrize(
    "fname,bits",
    [
        ("2bits_QPSK.txt", 2),
        ("2bits_4PSK.txt", 2),
        ("4bit_16QAM_Gray.txt", 4),
        ("4bit_16QAM_phi1.txt", 4),
        ("4bit_16QAM_phi2.txt", 4),
        ("6bits_64QAM_Gray.txt", 6),
    ],
)
def test_constellation_unit_energy(assets, fname, bits):
    c = parse_constellation(str(assets / fname))
    assert c.bits_per_symbol == bits
    assert c.num_points == 1 << bits
    # Reference normalizes to unit average energy (modem.cc:125-128).
    np.testing.assert_allclose(np.mean(np.abs(c.points) ** 2), 1.0, rtol=1e-12)
    # MSB-first labels enumerate 0..M-1 in row order (modem.cc:106-118).
    labels = (c.bits * (1 << np.arange(bits - 1, -1, -1))).sum(axis=1)
    np.testing.assert_array_equal(labels, np.arange(1 << bits))


def test_qpsk_points(assets):
    c = parse_constellation(str(assets / "2bits_QPSK.txt"))
    np.testing.assert_allclose(
        c.points, np.array([1, 1j, -1j, -1], dtype=complex), atol=1e-12
    )
