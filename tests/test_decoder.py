"""Flooding BP decoder tests: oracle parity, noiseless recovery, correction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmldpc_tpu import constants
from kmldpc_tpu.code import compile_code, load_code
from kmldpc_tpu.code.gf2 import gf2_matvec
from kmldpc_tpu.decoder import DecoderTables, make_flooding_decoder
from kmldpc_tpu.decoder.bp import channel_llr_to_columns, count_failed_checks
from kmldpc_tpu.io.hmatrix import ParityCheckMatrix

from .oracle import bp_decode_prob


def hamming74() -> ParityCheckMatrix:
    h = np.array(
        [
            [1, 0, 1, 0, 1, 0, 1],
            [0, 1, 1, 0, 0, 1, 1],
            [0, 0, 0, 1, 1, 1, 1],
        ],
        dtype=np.uint8,
    )
    rows, cols = np.nonzero(h)
    return ParityCheckMatrix(
        num_row=3, num_col=7, rank=3, lifting_factor=None,
        row_idx=rows.astype(np.int32), col_idx=cols.astype(np.int32),
    )


@pytest.fixture(scope="module")
def ham():
    return compile_code(hamming74(), name="hamming74")


def _llr(p0: np.ndarray) -> np.ndarray:
    p0 = np.clip(p0, constants.SMALLEST_PROB, 1 - constants.SMALLEST_PROB)
    return np.log(p0 / (1 - p0))


def test_matches_prob_domain_oracle(ham):
    """LLR-domain decoder == reference prob-domain equations, per iteration."""
    decode = make_flooding_decoder(ham)
    rng = np.random.default_rng(0)
    n_cases = 40
    p0 = rng.uniform(0.05, 0.95, size=(n_cases, ham.num_col))
    res = decode(jnp.asarray(_llr(p0), jnp.float32), 10)
    for i in range(n_cases):
        cc_exp, conv_exp, iters_exp, ss_exp = bp_decode_prob(ham, p0[i], 10)
        np.testing.assert_array_equal(
            np.asarray(res.cc_hat[i]), cc_exp, err_msg=f"case {i}"
        )
        assert bool(res.converged[i]) == conv_exp, f"case {i}"
        assert int(res.iters[i]) == iters_exp, f"case {i}"
        np.testing.assert_allclose(
            np.asarray(res.soft_syndrome[i]), ss_exp, rtol=1e-3, atol=1e-5,
            err_msg=f"case {i}",
        )


def test_noiseless_recovery(ham):
    rng = np.random.default_rng(1)
    decode = make_flooding_decoder(ham)
    uu = rng.integers(0, 2, size=(8, ham.code_dim)).astype(np.uint8)
    cc = np.stack([ham.encode_reference(u) for u in uu])
    llr = np.where(cc == 0, constants.LLR_CLIP, -constants.LLR_CLIP)
    res = decode(jnp.asarray(llr, jnp.float32), 10)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), cc[:, ham.info_slice])
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.iters) == 1).all()


def test_corrects_single_flip(ham):
    """Hamming(7,4) corrects any single hard flip with soft BP."""
    decode = make_flooding_decoder(ham)
    rng = np.random.default_rng(2)
    uu = rng.integers(0, 2, size=ham.code_dim).astype(np.uint8)
    cc = ham.encode_reference(uu)
    base = np.where(cc == 0, 4.0, -4.0)
    llrs = np.tile(base, (ham.num_col, 1))
    for j in range(ham.num_col):
        llrs[j, j] = -llrs[j, j] * 0.5  # flipped, weaker confidence
    res = decode(jnp.asarray(llrs, jnp.float32), 20)
    np.testing.assert_array_equal(
        np.asarray(res.uu_hat), np.tile(cc[ham.info_slice], (ham.num_col, 1))
    )
    assert np.asarray(res.converged).all()


def test_peg2304_noiseless_and_light_noise(assets):
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    decode = jax.jit(make_flooding_decoder(code), static_argnums=1)
    rng = np.random.default_rng(3)
    b = 4
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    # BPSK-ish LLRs with gaussian noise at high SNR
    sig = 1 - 2 * cc.astype(np.float64)  # +1 for bit 0
    llr = 8.0 * sig + rng.normal(scale=2.0, size=cc.shape)
    res = decode(jnp.asarray(llr, jnp.float32), 50)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), uu)
    assert np.asarray(res.converged).all()


def test_5g_puncture_decode(assets):
    """5G: punctured columns carry prior 0.5; noiseless tx word decodes."""
    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    decode = jax.jit(make_flooding_decoder(code), static_argnums=1)
    rng = np.random.default_rng(4)
    b = 2
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    cc_tx = cc[:, code.punct :]
    llr = np.where(cc_tx == 0, 12.0, -12.0)
    res = decode(jnp.asarray(llr, jnp.float32), 50)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), uu)
    assert np.asarray(res.converged).all()


def test_count_failed_checks(ham):
    t = DecoderTables.from_code(ham)
    rng = np.random.default_rng(5)
    uu = rng.integers(0, 2, size=ham.code_dim).astype(np.uint8)
    cc = ham.encode_reference(uu)
    h = ham.dense_h()
    words = np.stack([cc, 1 - cc, rng.integers(0, 2, ham.num_col)])
    got = np.asarray(count_failed_checks(t, jnp.asarray(words.astype(np.int8))))
    expect = [int(gf2_matvec(h, w).sum()) for w in words]
    np.testing.assert_array_equal(got, expect)


def test_channel_llr_to_columns_5g(assets):
    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    t = DecoderTables.from_code(code)
    x = jnp.ones((2, code.tx_len))
    cols = channel_llr_to_columns(t, x)
    assert cols.shape == (2, code.num_col)
    assert not np.asarray(cols[:, : code.punct]).any()


def test_two_phase_identical_to_single_phase(assets):
    """Exact two-phase compaction must be bit-identical (decoder/bp_em.py)."""
    import jax.numpy as jnp
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em, flooding_decode_two_phase

    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    t = DecoderTables.from_code(code)
    rng = np.random.default_rng(9)
    b = 64
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc.astype(np.float64)
    # mixed convergence: moderate noise so some blocks need many iterations
    llr = jnp.asarray(3.0 * sig + rng.normal(scale=2.4, size=cc.shape), jnp.float32)
    r1 = jax.jit(flooding_decode_em, static_argnums=2)(t, llr, 50)
    r2 = jax.jit(flooding_decode_two_phase, static_argnums=(2, 3, 4))(t, llr, 50, 6, 16)
    np.testing.assert_array_equal(np.asarray(r1.cc_hat), np.asarray(r2.cc_hat))
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))
    np.testing.assert_array_equal(np.asarray(r1.converged), np.asarray(r2.converged))
    np.testing.assert_allclose(
        np.asarray(r1.soft_syndrome), np.asarray(r2.soft_syndrome), atol=1e-6
    )
    # and the edge-major path agrees with the batch-major reference decoder
    r0 = make_flooding_decoder(code)(llr, 50)
    np.testing.assert_array_equal(np.asarray(r0.cc_hat), np.asarray(r1.cc_hat))
    np.testing.assert_array_equal(np.asarray(r0.iters), np.asarray(r1.iters))


def test_class_layout_identical_to_padded_5g(assets):
    """The dense degree-class core (irregular codes) must be bit-identical to
    the padded slot-major core and the batch-major reference decoder —
    including soft syndromes and per-codeword iteration counts."""
    from kmldpc_tpu.decoder.bp_em import (
        _decode_cols_classes,
        _decode_cols_padded,
        _insert_punct,
        flooding_decode_em,
    )

    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    t = DecoderTables.from_code(code)
    assert not t.is_regular
    # degree classes cover every edge exactly once
    assert sum(d * n for d, n in t.col_classes) == t.num_edges
    assert sum(d * n for d, n in t.row_classes) == t.num_edges
    rng = np.random.default_rng(11)
    b = 48
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code.punct :].astype(np.float64)
    llr = jnp.asarray(2.6 * sig + rng.normal(scale=2.2, size=sig.shape), jnp.float32)
    llr_col = _insert_punct(t, llr.T)
    rc = jax.jit(_decode_cols_classes, static_argnums=2)(t, llr_col, 30)
    rp = jax.jit(_decode_cols_padded, static_argnums=2)(t, llr_col, 30)
    for a, e in zip(rc, rp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))
    # public entry dispatches irregular codes to the class core
    r0 = make_flooding_decoder(code)(llr, 30)
    r1 = flooding_decode_em(t, llr, 30)
    np.testing.assert_array_equal(np.asarray(r0.cc_hat), np.asarray(r1.cc_hat))
    np.testing.assert_array_equal(np.asarray(r0.iters), np.asarray(r1.iters))
    np.testing.assert_array_equal(
        np.asarray(r0.soft_syndrome), np.asarray(r1.soft_syndrome)
    )


def test_bfloat16_message_mode(assets):
    """Opt-in bf16 message storage: correct decoding at light noise on both
    core layouts, and the two-phase wrapper stays bit-identical to the
    single-phase decoder at the same dtype."""
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em, flooding_decode_two_phase

    for fname in ("PEG2304regular0.5.txt", "5GLDPCBG2a3_R12_K960.txt"):
        code = load_code(str(assets / fname))
        t = DecoderTables.from_code(code)
        rng = np.random.default_rng(13)
        b = 32
        uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
        cc = np.stack([code.encode_reference(u) for u in uu])
        sig = 1 - 2 * cc[:, code.punct :].astype(np.float64)
        llr = jnp.asarray(6.0 * sig + rng.normal(scale=2.0, size=sig.shape), jnp.float32)
        em = jax.jit(flooding_decode_em, static_argnums=(2, 3))
        r1 = em(t, llr, 50, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(r1.uu_hat), uu)
        assert np.asarray(r1.converged).all()
        tp = jax.jit(flooding_decode_two_phase, static_argnums=(2, 3, 4, 5))
        r2 = tp(t, llr, 50, 4, 8, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(r1.cc_hat), np.asarray(r2.cc_hat))
        np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))


def _minsum_flood_oracle(code, llr_col, max_iter, alpha=0.75):
    """Float64 numpy flooding min-sum (VN->hard->syndrome->CN order, output
    freezing), one codeword — independent ground truth for
    bp_em cn_rule="minsum".  Soft syndrome is the min-sum approximation
    sigmoid(sign_prod * min1) from the PREVIOUS CN pass (frozen at
    convergence), matching the sum-product core's freeze semantics."""
    e = code.num_edges
    nr, nc = code.num_row, code.num_col
    edge_col = np.asarray(code.edge_col)
    row_idx = np.asarray(code.row_edge_idx)  # [nr, drm], e = pad
    row_mask = np.asarray(code.row_mask)
    c2v = np.zeros(e + 1)
    ss = np.ones(nr)
    clip = float(constants.LLR_CLIP)
    for it in range(1, max_iter + 1):
        post = llr_col + np.bincount(edge_col, weights=c2v[:e], minlength=nc)
        hard = (post <= 0).astype(np.int8)
        hard_pad = np.concatenate([hard, [0]])
        row_cols = np.asarray(code.row_edge_col)  # [nr, drm], nc = pad
        bits = np.where(row_mask, hard_pad[np.minimum(row_cols, nc - 1)] * row_mask, 0)
        parity = bits.sum(axis=1) % 2
        if (parity == 0).all():
            return hard, True, it, ss
        v2c = post[np.minimum(edge_col, nc - 1)] - c2v[:e]
        v2c_pad = np.concatenate([v2c, [0.0]])
        vr = v2c_pad[row_idx]  # [nr, drm]
        mag = np.where(row_mask, np.abs(vr), 1e30)
        sign = np.where(row_mask & (vr < 0), -1.0, 1.0)
        order = np.argsort(mag, axis=1)
        min1 = np.take_along_axis(mag, order[:, :1], axis=1)[:, 0]
        min2 = np.take_along_axis(mag, order[:, 1:2], axis=1)[:, 0]
        arg1 = order[:, 0]
        sign_prod = np.prod(sign, axis=1)
        excl = np.where(
            np.arange(row_mask.shape[1])[None, :] == arg1[:, None],
            min2[:, None], min1[:, None],
        )
        new = alpha * sign_prod[:, None] * sign * np.minimum(excl, clip)
        new = np.where(row_mask, new, 0.0)
        flat_idx = row_idx.reshape(-1)
        c2v[flat_idx] = new.reshape(-1)
        c2v[e] = 0.0
        ss = 1.0 / (1.0 + np.exp(-sign_prod * min1))
    return hard, False, max_iter, ss


def test_flooding_minsum_matches_oracle(ham):
    """bp_em cn_rule="minsum" == the float64 flooding min-sum oracle, per
    codeword (hard decisions, convergence, iteration counts, soft
    syndrome).  Hamming(7,4) is irregular, so this pins the degree-class
    core's min-sum branch."""
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em

    rng = np.random.default_rng(11)
    n_cases = 40
    p0 = rng.uniform(0.05, 0.95, size=(n_cases, ham.num_col))
    llr = _llr(p0)
    t = DecoderTables.from_code(ham)
    res = jax.jit(
        lambda x: flooding_decode_em(t, x, 10, cn_rule="minsum", alpha=0.75)
    )(jnp.asarray(llr, jnp.float32))
    for i in range(n_cases):
        cc_exp, conv_exp, iters_exp, ss_exp = _minsum_flood_oracle(ham, llr[i], 10)
        np.testing.assert_array_equal(
            np.asarray(res.cc_hat[i]), cc_exp, err_msg=f"case {i}"
        )
        assert bool(res.converged[i]) == conv_exp, f"case {i}"
        assert int(res.iters[i]) == iters_exp, f"case {i}"
        np.testing.assert_allclose(
            np.asarray(res.soft_syndrome[i]), ss_exp, rtol=1e-4, atol=1e-5,
            err_msg=f"case {i}",
        )


def test_flooding_minsum_regular_matches_oracle(assets):
    """Same oracle pin for the REGULAR (padded slot-major) core's min-sum
    branch, on PEG2304 with moderate noise."""
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em

    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    t = DecoderTables.from_code(code)
    assert t.is_regular
    rng = np.random.default_rng(12)
    b = 4
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc.astype(np.float64)
    llr = 4.0 * sig + rng.normal(scale=2.4, size=cc.shape)
    res = jax.jit(
        lambda x: flooding_decode_em(t, x, 15, cn_rule="minsum", alpha=0.75)
    )(jnp.asarray(llr, jnp.float32))
    for i in range(b):
        cc_exp, conv_exp, iters_exp, ss_exp = _minsum_flood_oracle(code, llr[i], 15)
        np.testing.assert_array_equal(
            np.asarray(res.cc_hat[i]), cc_exp, err_msg=f"case {i}"
        )
        assert bool(res.converged[i]) == conv_exp, f"case {i}"
        assert int(res.iters[i]) == iters_exp, f"case {i}"
        np.testing.assert_allclose(
            np.asarray(res.soft_syndrome[i]), ss_exp, rtol=1e-3, atol=1e-5,
            err_msg=f"case {i}",
        )


def test_flooding_minsum_two_phase_identical(assets):
    """Two-phase with the min-sum CN rule is bit-identical to single-phase
    (the compaction argument holds for any deterministic decoder)."""
    from kmldpc_tpu.decoder.bp_em import (
        flooding_decode_em,
        flooding_decode_two_phase,
    )

    code = load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))
    t = DecoderTables.from_code(code)
    rng = np.random.default_rng(13)
    b = 48
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code.punct:].astype(np.float64)
    llr = jnp.asarray(4.0 * sig + rng.normal(scale=2.6, size=sig.shape),
                      jnp.float32)
    r1 = jax.jit(
        lambda x: flooding_decode_em(t, x, 40, cn_rule="minsum")
    )(llr)
    r2 = jax.jit(
        lambda x: flooding_decode_two_phase(
            t, x, 40, phase1_iters=6, tile=16, cn_rule="minsum"
        )
    )(llr)
    np.testing.assert_array_equal(np.asarray(r1.cc_hat), np.asarray(r2.cc_hat))
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))
    np.testing.assert_array_equal(
        np.asarray(r1.converged), np.asarray(r2.converged)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.soft_syndrome), np.asarray(r2.soft_syndrome)
    )
