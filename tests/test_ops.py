"""Tests for the channel-chain ops (encode, map, channel, demap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmldpc_tpu.code import load_code
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.ops import (
    ModemTables,
    fading_awgn_channel,
    make_encoder,
    make_mapper,
    make_soft_demapper,
    random_bits,
)

from .oracle import demap_oracle


@pytest.fixture(scope="module")
def peg(assets):
    return load_code(str(assets / "PEG2304regular0.5.txt"))


@pytest.fixture(scope="module")
def qpsk(assets):
    return parse_constellation(str(assets / "2bits_QPSK.txt"))


def test_random_bits_distribution():
    bits = random_bits(jax.random.key(0), (64, 1000))
    mean = np.asarray(bits, dtype=np.float64).mean()
    assert 0.47 < mean < 0.53


def test_encoder_matches_numpy_oracle(peg):
    from kmldpc_tpu.ops.encode import encoder_table

    rng = np.random.default_rng(0)
    uu = rng.integers(0, 2, size=(4, peg.code_dim)).astype(np.int8)
    encode = make_encoder(peg)
    cc_full, cc_tx = jax.jit(encode)(jnp.asarray(uu), encoder_table(peg))
    cc_full = np.asarray(cc_full)
    for b in range(4):
        np.testing.assert_array_equal(cc_full[b], peg.encode_reference(uu[b]))
    np.testing.assert_array_equal(np.asarray(cc_tx), cc_full)  # no puncture


def test_encoder_5g_puncture(assets):
    from kmldpc_tpu.ops.encode import encoder_table

    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    rng = np.random.default_rng(1)
    uu = rng.integers(0, 2, size=(2, code.code_dim)).astype(np.int8)
    cc_full, cc_tx = jax.jit(make_encoder(code))(jnp.asarray(uu), encoder_table(code))
    assert cc_tx.shape == (2, code.tx_len)
    np.testing.assert_array_equal(np.asarray(cc_full)[:, code.punct :], np.asarray(cc_tx))
    np.testing.assert_array_equal(np.asarray(cc_full)[:, : code.code_dim], uu)


def test_encoder_inactive_all_zero(peg):
    from kmldpc_tpu.ops.encode import encoder_table

    uu = jnp.ones((3, peg.code_dim), jnp.int8)
    cc_full, cc_tx = make_encoder(peg, active=False)(uu, encoder_table(peg))
    assert not np.asarray(cc_full).any()


def test_mapper_msb_first(qpsk):
    tables = ModemTables.from_constellation(qpsk)
    map_bits = make_mapper(tables)
    # bits [1,0] -> index 2 -> point -1j (after unit-energy normalization)
    cc = jnp.asarray([[1, 0, 0, 1, 1, 1, 0, 0]], dtype=jnp.int8)
    xr, xi = map_bits(cc)
    expect = qpsk.points[[2, 1, 3, 0]]
    np.testing.assert_allclose(np.asarray(xr)[0], expect.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi)[0], expect.imag, atol=1e-6)


def test_channel_statistics():
    key = jax.random.key(7)
    b, n = 512, 64
    xr = jnp.ones((b, n))
    xi = jnp.zeros((b, n))
    sigma = 0.5
    yr, yi, hr, hi = fading_awgn_channel(key, xr, xi, sigma, fading=True)
    h2 = np.asarray(hr) ** 2 + np.asarray(hi) ** 2
    assert abs(h2.mean() - 1.0) < 0.15  # E|h|^2 = 1
    # noise variance per component = sigma^2/2
    res = np.asarray(yr) - np.asarray(hr)[:, None]
    assert abs(res.var() - sigma**2 / 2) < 0.01


def test_channel_no_fading():
    yr, yi, hr, hi = fading_awgn_channel(
        jax.random.key(0), jnp.ones((4, 8)), jnp.zeros((4, 8)), 0.0, fading=False
    )
    np.testing.assert_allclose(np.asarray(hr), 1.0)
    np.testing.assert_allclose(np.asarray(yr), 1.0, atol=1e-6)


@pytest.mark.parametrize("fname", ["2bits_QPSK.txt", "4bit_16QAM_Gray.txt"])
def test_demap_matches_bayes_oracle(assets, fname):
    c = parse_constellation(str(assets / fname))
    tables = ModemTables.from_constellation(c)
    demap = jax.jit(make_soft_demapper(tables))
    rng = np.random.default_rng(3)
    b, nsym = 3, 5
    y = rng.normal(size=(b, nsym)) + 1j * rng.normal(size=(b, nsym))
    h = rng.normal(size=b) + 1j * rng.normal(size=b)
    var = 0.3
    bit_p0, chan_llr = demap(
        jnp.asarray(y.real, jnp.float32),
        jnp.asarray(y.imag, jnp.float32),
        jnp.asarray(h.real, jnp.float32),
        jnp.asarray(h.imag, jnp.float32),
        var,
    )
    bit_p0 = np.asarray(bit_p0).reshape(b, nsym, c.bits_per_symbol)
    for i in range(b):
        for s in range(nsym):
            expect = demap_oracle(y[i, s], h[i], var, c.points, c.bits)
            np.testing.assert_allclose(bit_p0[i, s], expect, rtol=5e-3, atol=1e-5)
    # LLR consistency
    ll = np.asarray(chan_llr).reshape(b, nsym, -1)
    np.testing.assert_allclose(
        ll[0, 0], np.log(bit_p0[0, 0] / (1 - bit_p0[0, 0])), rtol=1e-3, atol=1e-4
    )


def test_demap_noiseless_certain(qpsk):
    """Noiseless channel => demap returns (clipped) certainty for tx bits."""
    tables = ModemTables.from_constellation(qpsk)
    map_bits = make_mapper(tables)
    demap = make_soft_demapper(tables)
    cc = jnp.asarray([[0, 1, 1, 0, 1, 1, 0, 0]], dtype=jnp.int8)
    xr, xi = map_bits(cc)
    bit_p0, chan_llr = demap(xr, xi, jnp.ones(1), jnp.zeros(1), 1e-4)
    decided = (np.asarray(chan_llr)[0] <= 0).astype(np.int8)
    np.testing.assert_array_equal(decided, np.asarray(cc)[0])


@pytest.mark.parametrize("fname", ["2bits_QPSK.txt", "4bit_16QAM_Gray.txt"])
def test_prior_demap_matches_bayes_oracle(assets, fname):
    """Prior-in/extrinsic-out demap (modem.cc:23-79) vs a float64 oracle at
    NON-uniform priors."""
    from kmldpc_tpu.ops.modem import make_prior_demapper

    from .oracle import demap_prior_oracle

    c = parse_constellation(str(assets / fname))
    tables = ModemTables.from_constellation(c)
    demap = jax.jit(make_prior_demapper(tables))
    rng = np.random.default_rng(11)
    b, nsym = 3, 5
    m = c.bits_per_symbol
    y = rng.normal(size=(b, nsym)) + 1j * rng.normal(size=(b, nsym))
    h = rng.normal(size=b) + 1j * rng.normal(size=b)
    prior = rng.uniform(0.05, 0.95, size=(b, nsym * m))
    var = 0.3
    p0_out, ext_llr = demap(
        jnp.asarray(y.real, jnp.float32),
        jnp.asarray(y.imag, jnp.float32),
        jnp.asarray(h.real, jnp.float32),
        jnp.asarray(h.imag, jnp.float32),
        var,
        jnp.asarray(prior, jnp.float32),
    )
    got = np.asarray(p0_out).reshape(b, nsym, m)
    ll = np.asarray(ext_llr).reshape(b, nsym, m)
    for i in range(b):
        for s in range(nsym):
            expect = demap_prior_oracle(
                y[i, s], h[i], var, c.points, c.bits,
                prior[i, s * m:(s + 1) * m],
            )
            np.testing.assert_allclose(got[i, s], expect, rtol=5e-3, atol=1e-5)
            np.testing.assert_allclose(
                ll[i, s], np.log(expect / (1 - expect)), rtol=5e-3, atol=1e-3
            )


def test_prior_demap_uniform_equals_soft_demap(assets):
    """At uniform 0.5 priors the prior demapper reduces exactly to the fused
    uniform demapper (the reference's only operating point, kmcodec.cc:99-101)."""
    from kmldpc_tpu.ops.modem import make_prior_demapper

    c = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    tables = ModemTables.from_constellation(c)
    rng = np.random.default_rng(5)
    b, nsym = 4, 8
    yr = jnp.asarray(rng.normal(size=(b, nsym)), jnp.float32)
    yi = jnp.asarray(rng.normal(size=(b, nsym)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=b), jnp.float32)
    hi = jnp.asarray(rng.normal(size=b), jnp.float32)
    var = 0.25
    p0_u, llr_u = jax.jit(make_soft_demapper(tables))(yr, yi, hr, hi, var)
    prior = jnp.full((b, nsym * c.bits_per_symbol), 0.5, jnp.float32)
    p0_p, llr_p = jax.jit(make_prior_demapper(tables))(yr, yi, hr, hi, var, prior)
    np.testing.assert_allclose(np.asarray(p0_p), np.asarray(p0_u), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(llr_p), np.asarray(llr_u), rtol=1e-4, atol=1e-4)
