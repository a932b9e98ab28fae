"""Blind detection tests: k-means estimator + ambiguity metric selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmldpc_tpu.code import load_code
from kmldpc_tpu.detect import make_ambiguity_selector, make_blind_estimator
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.decoder.bp import DecoderTables
from kmldpc_tpu.ops import ModemTables, fading_awgn_channel, make_encoder, make_mapper, random_bits
from kmldpc_tpu.ops.encode import encoder_table


@pytest.fixture(scope="module")
def setup(assets):
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    const = parse_constellation(str(assets / "2bits_QPSK.txt"))
    tables = ModemTables.from_constellation(const)
    return code, const, tables


def _tx(code, tables, key, sigma, batch=8):
    k1, k2 = jax.random.split(jax.random.key(key))
    uu = random_bits(k1, (batch, code.code_dim))
    _, cc_tx = make_encoder(code)(uu, encoder_table(code))
    xr, xi = make_mapper(tables)(cc_tx)
    yr, yi, hr, hi = fading_awgn_channel(k2, xr, xi, sigma, fading=True)
    return uu, yr, yi, hr, hi


def _best_candidate_err(h4_r, h4_i, hr, hi):
    """Distance from the closest of the 4 candidates to the true h."""
    d = np.hypot(np.asarray(h4_r) - np.asarray(hr)[:, None],
                 np.asarray(h4_i) - np.asarray(hi)[:, None])
    return d.min(axis=1)


@pytest.mark.parametrize("anchor", ["max", "first"])
def test_kmeans_recovers_h_up_to_rotation(setup, anchor):
    code, _, tables = setup
    estimate = jax.jit(make_blind_estimator(tables, anchor=anchor))
    sigma = 10 ** (-12 / 20)  # 12 dB
    uu, yr, yi, hr, hi = _tx(code, tables, 0, sigma)
    h4_r, h4_i = estimate(yr, yi)
    err = _best_candidate_err(h4_r, h4_i, hr, hi)
    hmag = np.hypot(np.asarray(hr), np.asarray(hi))
    assert (err < 0.15 * np.maximum(hmag, 0.2) + 0.05).all(), (err, hmag)


def test_kmeans_candidates_are_quadrature(setup):
    _, _, tables = setup
    estimate = make_blind_estimator(tables)
    yr = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64)), jnp.float32)
    yi = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64)), jnp.float32)
    h4_r, h4_i = estimate(yr, yi)
    h4 = np.asarray(h4_r) + 1j * np.asarray(h4_i)
    for k in range(4):
        np.testing.assert_allclose(h4[:, k], h4[:, 0] * 1j**k, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("metric_type", [False, True])
def test_selector_resolves_rotation_mod_pi(setup, metric_type):
    """QPSK + even-degree rows: the complement of a codeword is a codeword,
    so ĥ and -ĥ tie exactly (see metric.py docstring) — the selector can
    only be required to land on the best candidate *up to sign*, which is
    precisely the reference's behavior."""
    code, _, tables = setup
    sigma = 10 ** (-10 / 20)
    uu, yr, yi, hr, hi = _tx(code, tables, 3, sigma, batch=4)
    estimate = make_blind_estimator(tables)
    select = make_ambiguity_selector(code, tables, metric_type, metric_iter=5)
    h4_r, h4_i = estimate(yr, yi)
    sr, si, metrics, _llr = jax.jit(select)(DecoderTables.from_code(code), yr, yi, h4_r, h4_i, sigma**2)
    d_sel = np.minimum(
        np.hypot(np.asarray(sr) - np.asarray(hr), np.asarray(si) - np.asarray(hi)),
        np.hypot(np.asarray(sr) + np.asarray(hr), np.asarray(si) + np.asarray(hi)),
    )
    d_best = _best_candidate_err(h4_r, h4_i, hr, hi)
    np.testing.assert_allclose(d_sel, d_best, atol=1e-5)
    assert metrics.shape == (4, 4)
    # the two 90-degree rotations must be clearly rejected
    m = np.asarray(metrics)
    order = np.argsort(m, axis=1)
    for b in range(4):
        top2 = set(order[b, :2])
        assert top2 in ({0, 2}, {1, 3}), (b, m[b])


def test_selector_16qam_resolves_sign(assets):
    """16QAM Gray is not complement-closed under negation: all 4 rotations
    separate, so the selector must pick the geometrically closest ĥ."""
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    tables = ModemTables.from_constellation(const)
    sigma = 10 ** (-16 / 20)
    uu, yr, yi, hr, hi = _tx(code, tables, 11, sigma, batch=4)
    estimate = make_blind_estimator(tables)
    select = make_ambiguity_selector(code, tables, False, metric_iter=5)
    h4_r, h4_i = estimate(yr, yi)
    sr, si, _, _llr = jax.jit(select)(DecoderTables.from_code(code), yr, yi, h4_r, h4_i, sigma**2)
    d_sel = np.hypot(np.asarray(sr) - np.asarray(hr), np.asarray(si) - np.asarray(hi))
    d_best = _best_candidate_err(h4_r, h4_i, hr, hi)
    np.testing.assert_allclose(d_sel, d_best, atol=1e-5)


def test_selector_5g_hard_metric(assets):
    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    tables = ModemTables.from_constellation(const)
    sigma = 10 ** (-14 / 20)
    uu, yr, yi, hr, hi = _tx(code, tables, 5, sigma, batch=2)
    estimate = make_blind_estimator(tables)
    select = make_ambiguity_selector(code, tables, metric_type=False, metric_iter=5)
    h4_r, h4_i = estimate(yr, yi)
    sr, si, metrics, _llr = jax.jit(select)(DecoderTables.from_code(code), yr, yi, h4_r, h4_i, sigma**2)
    d_sel = np.hypot(np.asarray(sr) - np.asarray(hr), np.asarray(si) - np.asarray(hi))
    d_best = _best_candidate_err(h4_r, h4_i, hr, hi)
    np.testing.assert_allclose(d_sel, d_best, atol=1e-5)
