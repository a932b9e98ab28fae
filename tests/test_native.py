"""Native GF(2) eliminator: exact agreement with the NumPy oracle."""

import time

import numpy as np
import pytest

from kmldpc_tpu.code import gf2

gf2_native = pytest.importorskip("kmldpc_tpu.native.gf2_native")


def _available() -> bool:
    try:
        gf2_native._load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _available(), reason="no C++ toolchain")


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_numpy_oracle(reverse, seed):
    rng = np.random.default_rng(seed)
    rows, cols = 60, 120
    h = (rng.random((rows, cols)) < 0.1).astype(np.uint8)
    if reverse:
        exp_enc, exp_perm, exp_rank = gf2.systematize_reverse(h)
    else:
        exp_enc, exp_perm, exp_rank = gf2.systematize_forward(h)
    enc, perm, rank = gf2_native.systematize(h, reverse)
    assert rank == exp_rank
    np.testing.assert_array_equal(perm, exp_perm)
    np.testing.assert_array_equal(enc, exp_enc)


def test_peg2304_agreement_and_speed(assets):
    from kmldpc_tpu.io import parse_hmatrix

    h = parse_hmatrix(str(assets / "PEG2304regular0.5.txt")).to_dense()
    t0 = time.monotonic()
    enc_n, perm_n, rank_n = gf2_native.systematize(h, False)
    native_s = time.monotonic() - t0
    enc_p, perm_p, rank_p = gf2.systematize_forward(h)
    assert rank_n == rank_p == 1152
    np.testing.assert_array_equal(perm_n, perm_p)
    np.testing.assert_array_equal(enc_n, enc_p)
    assert native_s < 5.0
