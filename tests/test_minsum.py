"""Layered normalized min-sum decoder tests."""

import jax
import numpy as np
import pytest

from kmldpc_tpu import constants
from kmldpc_tpu.code import load_code
from kmldpc_tpu.decoder.minsum import make_layered_minsum_decoder
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.ops import ModemTables, fading_awgn_channel, make_encoder, make_mapper, make_soft_demapper, random_bits
from kmldpc_tpu.sim.chain import ChainSpec, make_chunk_runner


@pytest.fixture(scope="module")
def code5g(assets):
    return load_code(str(assets / "5GLDPCBG2a3_R12_K960.txt"))


def test_noiseless_recovery_5g(code5g):
    decode = make_layered_minsum_decoder(code5g)
    rng = np.random.default_rng(0)
    uu = rng.integers(0, 2, size=(4, code5g.code_dim)).astype(np.uint8)
    cc = np.stack([code5g.encode_reference(u) for u in uu])
    llr = np.where(cc[:, code5g.punct :] == 0, 12.0, -12.0).astype(np.float32)
    res = decode(jax.numpy.asarray(llr), 20)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), uu)
    assert np.asarray(res.converged).all()


def test_layer_structure_5g(code5g):
    """Block-row layers must be conflict-free: each column at most once."""
    z = code5g.lifting_factor
    n_layers = code5g.num_row // z
    for l in range(n_layers):
        rows = slice(l * z, (l + 1) * z)
        cols = code5g.row_edge_col[rows][code5g.row_mask[rows]]
        assert len(cols) == len(set(cols.tolist())), f"layer {l} has conflicts"


def test_corrects_noise_5g(code5g):
    decode = make_layered_minsum_decoder(code5g)
    rng = np.random.default_rng(1)
    b = 8
    uu = rng.integers(0, 2, size=(b, code5g.code_dim)).astype(np.uint8)
    cc = np.stack([code5g.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code5g.punct :].astype(np.float64)
    llr = 5.0 * sig + rng.normal(scale=2.2, size=sig.shape)
    res = decode(jax.numpy.asarray(llr, jax.numpy.float32), 30)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), uu)
    assert np.asarray(res.converged).all()


def test_minsum_on_unstructured_peg(assets):
    """PEG (non-lifted): falls back to flooding min-sum, still decodes."""
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    decode = make_layered_minsum_decoder(code)
    rng = np.random.default_rng(2)
    uu = rng.integers(0, 2, size=(4, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc.astype(np.float64)
    llr = 6.0 * sig + rng.normal(scale=2.0, size=cc.shape)
    res = decode(jax.numpy.asarray(llr, jax.numpy.float32), 30)
    np.testing.assert_array_equal(np.asarray(res.uu_hat), uu)


def test_chain_with_minsum_schedule(assets, code5g):
    """Driver config #3: 5G BG2 + 16QAM Gray + layered min-sum, known h."""
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    spec = ChainSpec(
        code=code5g, constellation=const, known_h=True, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="layered-minsum",
    )
    run = make_chunk_runner(spec, batch=16)
    res = run(jax.random.key(0), np.float32(10 ** (-2.2)))  # 22 dB
    assert int(res.tot_blk) == 16
    assert int(res.err_blk) <= 1, int(res.err_blk)


def test_chain_blind_minsum_matched_metric(assets, code5g):
    """Blind 5G + 16QAM with schedule=layered-minsum and
    metric_schedule="match": ambiguity metrics decode with the QC min-sum
    fast path.  At high SNR all rotations separate and the blind chain must
    match known-h (zero errors)."""
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    spec = ChainSpec(
        code=code5g, constellation=const, known_h=False, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="layered-minsum",
        metric_schedule="match",
    )
    run = make_chunk_runner(spec, batch=16)
    res = run(jax.random.key(2), np.float32(10 ** (-2.4)))  # 24 dB
    assert int(res.err_blk) == 0, (int(res.err_blk), int(res.err_bit))
    # soft metric variant exercises log(soft_syndrome) of the min-sum path
    spec_s = ChainSpec(
        code=code5g, constellation=const, known_h=False, fading=True,
        metric_type=True, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="layered-minsum",
        metric_schedule="match",
    )
    run_s = make_chunk_runner(spec_s, batch=16)
    res_s = run_s(jax.random.key(3), np.float32(10 ** (-2.4)))
    assert int(res_s.err_blk) == 0, (int(res_s.err_blk), int(res_s.err_bit))


def test_bad_schedule_raises(assets, code5g):
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    spec = ChainSpec(
        code=code5g, constellation=const, known_h=True, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="nope",
    )
    with pytest.raises(ValueError):
        make_chunk_runner(spec, batch=4)


def test_qc_fast_path_matches_generic(code5g):
    """QC roll-based path is bit-identical to the generic gather/scatter
    path (same layers, same per-edge arithmetic — see layered_minsum_decode
    docstring)."""
    from kmldpc_tpu.decoder.minsum import layered_minsum_decode, minsum_tables

    mt = minsum_tables(code5g)
    assert mt.qc is not None, "5G BG2 decode graph should be detected as QC"
    mt_gen = minsum_tables(code5g, layer_size=code5g.lifting_factor, use_qc=False)
    rng = np.random.default_rng(7)
    b = 32
    uu = rng.integers(0, 2, size=(b, code5g.code_dim)).astype(np.uint8)
    cc = np.stack([code5g.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code5g.punct :].astype(np.float64)
    llr = jax.numpy.asarray(
        4.0 * sig + rng.normal(scale=2.6, size=sig.shape), jax.numpy.float32
    )
    dec = jax.jit(layered_minsum_decode, static_argnums=(2, 3))
    r_qc = dec(mt, llr, 30, 0.75)
    r_gen = dec(mt_gen, llr, 30, 0.75)
    np.testing.assert_array_equal(np.asarray(r_qc.cc_hat), np.asarray(r_gen.cc_hat))
    np.testing.assert_array_equal(np.asarray(r_qc.uu_hat), np.asarray(r_gen.uu_hat))
    np.testing.assert_array_equal(np.asarray(r_qc.iters), np.asarray(r_gen.iters))
    np.testing.assert_array_equal(
        np.asarray(r_qc.converged), np.asarray(r_gen.converged)
    )
    np.testing.assert_allclose(
        np.asarray(r_qc.soft_syndrome), np.asarray(r_gen.soft_syndrome),
        rtol=0, atol=1e-6,
    )
    # the soft syndrome must be real (not the round-1 all-ones stub): an
    # unconverged noisy batch has rows with P(XOR=0) well below 1
    hopeless = jax.numpy.asarray(
        rng.normal(scale=1.0, size=sig.shape), jax.numpy.float32
    )
    r_bad = dec(mt, hopeless, 5, 0.75)
    ss = np.asarray(r_bad.soft_syndrome)
    assert (ss < 0.9).any(), "soft syndrome should reflect unsatisfied rows"


def test_minsum_two_phase_identical(code5g):
    """two_phase_generic over layered min-sum is bit-identical."""
    from kmldpc_tpu.decoder.bp_em import two_phase_generic
    from kmldpc_tpu.decoder.minsum import layered_minsum_decode, minsum_tables

    mt = minsum_tables(code5g)
    rng = np.random.default_rng(5)
    b = 48
    uu = rng.integers(0, 2, size=(b, code5g.code_dim)).astype(np.uint8)
    cc = np.stack([code5g.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code5g.punct :].astype(np.float64)
    llr = jax.numpy.asarray(4.0 * sig + rng.normal(scale=2.6, size=sig.shape),
                            jax.numpy.float32)
    dec = lambda x, it: layered_minsum_decode(mt, x, it, 0.75)
    r1 = jax.jit(dec, static_argnums=1)(llr, 40)
    r2 = jax.jit(
        lambda x: two_phase_generic(dec, x, 40, phase1_iters=6, tile=16)
    )(llr)
    np.testing.assert_array_equal(np.asarray(r1.cc_hat), np.asarray(r2.cc_hat))
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))
    np.testing.assert_array_equal(np.asarray(r1.converged), np.asarray(r2.converged))


def test_chain_flooding_minsum_schedule(assets):
    """[tpu].schedule = "flooding-minsum": min-sum CN rule on the flooding
    schedule (the transcendental-free option for non-QC codes, bp_em.py).
    Known-h PEG2304 at high SNR must decode cleanly; the blind variant with
    metric_schedule="match" runs its 4 metric decodes with the same rule."""
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    spec = ChainSpec(
        code=code, constellation=const, known_h=True, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="flooding-minsum",
    )
    run = make_chunk_runner(spec, batch=16)
    res = run(jax.random.key(4), np.float32(10 ** (-2.2)))  # 22 dB
    assert int(res.tot_blk) == 16
    assert int(res.err_blk) == 0, (int(res.err_blk), int(res.err_bit))

    spec_b = ChainSpec(
        code=code, constellation=const, known_h=False, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False, schedule="flooding-minsum",
        metric_schedule="match",
    )
    run_b = make_chunk_runner(spec_b, batch=16)
    res_b = run_b(jax.random.key(5), np.float32(10 ** (-2.4)))  # 24 dB
    assert int(res_b.err_blk) == 0, (int(res_b.err_blk), int(res_b.err_bit))
