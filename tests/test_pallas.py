"""Pallas k-means kernel: interpreter-mode equivalence on CPU."""

import jax
import numpy as np
import pytest

from kmldpc_tpu.detect.kmeans import make_blind_estimator
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.ops.modem import ModemTables


@pytest.mark.parametrize(
    "fname", ["2bits_QPSK.txt", "4bit_16QAM_Gray.txt", "6bits_64QAM_Gray.txt"]
)
def test_pallas_kmeans_matches_jax(assets, fname, monkeypatch):
    """The fused kernel must agree with the pure-JAX estimator.

    On CPU the kernel runs in Pallas interpreter mode (the Mosaic TPU
    compiler is unavailable); the on-device path is exercised by bench.py
    and was validated to 2.4e-7 max deviation on a v5e chip.
    """
    from jax.experimental.pallas import tpu as pltpu

    import kmldpc_tpu.detect.kmeans_pallas as kp

    const = parse_constellation(str(assets / fname))
    tables = ModemTables.from_constellation(const)
    key = jax.random.key(0)
    yr = jax.random.normal(key, (16, 288))
    yi = jax.random.normal(jax.random.key(1), (16, 288))
    e_jax = make_blind_estimator(tables)
    with pltpu.force_tpu_interpret_mode():
        e_pal = kp.make_blind_estimator_pallas(tables)
        h4p = e_pal(yr, yi)
    h4j = e_jax(yr, yi)
    np.testing.assert_allclose(np.asarray(h4j[0]), np.asarray(h4p[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h4j[1]), np.asarray(h4p[1]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "fname", ["2bits_QPSK.txt", "6bits_64QAM_Gray.txt"]
)
def test_pallas_kmeans_early_exit_bit_identical(assets, fname):
    """Early exit on stable assignments must be BIT-identical to the full
    fixed-trip loop (round 5): the update is a deterministic function of
    the assignment, so a repeated assignment fixes the gain forever —
    exiting early skips only no-op iterations."""
    from jax.experimental.pallas import tpu as pltpu

    import kmldpc_tpu.detect.kmeans_pallas as kp

    const = parse_constellation(str(assets / fname))
    tables = ModemTables.from_constellation(const)
    yr = jax.random.normal(jax.random.key(5), (16, 288))
    yi = jax.random.normal(jax.random.key(6), (16, 288))
    with pltpu.force_tpu_interpret_mode():
        h_ee = kp.make_blind_estimator_pallas(tables, 20, "max",
                                              early_exit=True)(yr, yi)
        h_full = kp.make_blind_estimator_pallas(tables, 20, "max",
                                                early_exit=False)(yr, yi)
    np.testing.assert_array_equal(np.asarray(h_ee[0]), np.asarray(h_full[0]))
    np.testing.assert_array_equal(np.asarray(h_ee[1]), np.asarray(h_full[1]))


def test_pick_tile_minimizes_padding():
    """The fallback tile for batches no tile divides must minimize padding.

    Regression test for the round-4 advisor finding: the fallback returned
    the LARGEST in-budget tile, padding b = 12 up to 256 rows (~20x wasted
    k-means compute).  Now the in-budget tile with the least padding wins
    (smallest tile on ties); exact divisors keep preferring large tiles.
    """
    from kmldpc_tpu.detect.kmeans_pallas import _pick_tile_sublane

    # b = 12: pad 4 at t=8 (ties t=16's 4, smallest wins)
    assert _pick_tile_sublane(12, 288, 16) == 8
    # b = 100: pad 4 at t=8 beats 28 at t=32 / 156 at t=256
    assert _pick_tile_sublane(100, 288, 16) == 8
    # exact divisors still take the largest in-budget tile
    assert _pick_tile_sublane(1024, 384, 4) == 256
    # VMEM budget still caps the tile for the 64-point kernel
    assert _pick_tile_sublane(1024, 384, 64) == 64


@pytest.mark.parametrize("b", [100, 12, 7])
def test_pallas_kmeans_odd_batch(assets, b):
    """Batches not divisible by any tile must still fill EVERY output row.

    Regression test for the round-3 bug where ``grid = (b // tb,)`` with an
    unpadded batch left the last ``b mod tb`` gains unwritten (silent
    garbage for e.g. ``[tpu].batch = 100``).  The kernel now pads the batch
    to a tile multiple and slices back; every row must agree with the
    pure-JAX estimator.  Also validated on a real v5e chip (round 4): the
    Mosaic-compiled kernel matched the JAX estimator exactly (max dev 0.0)
    at b = 100 and 12 for QPSK/16QAM/64QAM.
    """
    from jax.experimental.pallas import tpu as pltpu

    import kmldpc_tpu.detect.kmeans_pallas as kp

    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    tables = ModemTables.from_constellation(const)
    yr = jax.random.normal(jax.random.key(2), (b, 288))
    yi = jax.random.normal(jax.random.key(3), (b, 288))
    e_jax = make_blind_estimator(tables)
    with pltpu.force_tpu_interpret_mode():
        h4p = kp.make_blind_estimator_pallas(tables)(yr, yi)
    h4j = e_jax(yr, yi)
    np.testing.assert_allclose(np.asarray(h4j[0]), np.asarray(h4p[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h4j[1]), np.asarray(h4p[1]), rtol=1e-5, atol=1e-6)
