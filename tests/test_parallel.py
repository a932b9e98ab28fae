"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from kmldpc_tpu.code import load_code
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.parallel import get_mesh, make_sharded_chunk_runner
from kmldpc_tpu.sim.chain import ChainSpec, make_chunk_runner


@pytest.fixture(scope="module")
def spec(assets):
    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    const = parse_constellation(str(assets / "2bits_QPSK.txt"))
    return ChainSpec(
        code=code, constellation=const, known_h=True, fading=True,
        metric_type=False, metric_iter=5, max_iter=30,
        encoder_active=True, histogram=False,
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_counters_consistent(spec):
    """Sharded chunk over 8 devices: counters aggregate exactly the local
    shards (psum) and the statistics are sane at high SNR."""
    mesh = get_mesh(8)
    runner = make_sharded_chunk_runner(spec, batch=32, mesh=mesh)
    res = runner(jax.random.key(0), np.float32(10 ** (-1.6)))
    assert int(res.tot_blk) == 32
    assert int(res.tot_bit) == 32 * spec.code.code_dim
    assert int(res.err_blk) <= 2
    assert res.metrics.shape == (32, 4)


def test_sharded_vs_mesh_size_invariance(spec):
    """BER statistics must not depend on the mesh size (different keys per
    layout, so compare counts loosely at a mid SNR)."""
    var = np.float32(10 ** (-0.5))
    r1 = make_chunk_runner(spec, 64)(jax.random.key(7), var)
    m = get_mesh(4)
    r4 = make_sharded_chunk_runner(spec, 64, m)(jax.random.key(7), var)
    f1 = int(r1.err_blk) / int(r1.tot_blk)
    f4 = int(r4.err_blk) / int(r4.tot_blk)
    assert int(r4.tot_blk) == 64
    assert abs(f1 - f4) < 0.35, (f1, f4)


def test_batch_not_divisible_raises(spec):
    mesh = get_mesh(8)
    with pytest.raises(ValueError):
        make_sharded_chunk_runner(spec, batch=12, mesh=mesh)


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    res = jax.jit(fn)(*args)
    assert int(res.tot_blk) == 8


def test_graft_entry_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("cfile,cn_rule", [
    ("PEG2304regular0.5.txt", "sumprod"),
    ("5GLDPCBG2a3_R12_K960.txt", "sumprod"),
    ("5GLDPCBG2a3_R12_K960.txt", "minsum"),
    # the capability's target workload: the largest code (24,192 edges)
    ("PEG8064regular0.5.txt", "minsum"),
])
def test_edge_sharded_decoder_matches_single_device(assets, cfile, cn_rule):
    """Edge-sharded flooding BP (message state partitioned over a `model`
    mesh axis, one posterior psum per iteration — SURVEY §2's "shard BP
    messages over the edge dimension" analogue) produces the same
    decisions, convergence flags, and iteration counts as the single-chip
    decoder, for both code families (regular / irregular+punctured) and
    both CN rules."""
    from jax.sharding import Mesh

    from kmldpc_tpu.decoder.bp import DecoderTables
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em
    from kmldpc_tpu.parallel.edge_sharded import make_edge_sharded_decoder

    code = load_code(str(assets / cfile))
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    t = DecoderTables.from_code(code)
    rng = np.random.default_rng(9)
    b = 16
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc[:, code.punct:].astype(np.float64)
    llr = jax.numpy.asarray(
        4.0 * sig + rng.normal(scale=2.4, size=sig.shape), jax.numpy.float32
    )
    dec = make_edge_sharded_decoder(code, mesh, cn_rule=cn_rule)
    assert dec.num_shards == 8
    r_es = dec(llr, 30)
    r_em = jax.jit(
        lambda x: flooding_decode_em(t, x, 30, cn_rule=cn_rule)
    )(llr)
    np.testing.assert_array_equal(np.asarray(r_es.uu_hat), np.asarray(r_em.uu_hat))
    np.testing.assert_array_equal(np.asarray(r_es.cc_hat), np.asarray(r_em.cc_hat))
    np.testing.assert_array_equal(
        np.asarray(r_es.converged), np.asarray(r_em.converged)
    )
    np.testing.assert_array_equal(np.asarray(r_es.iters), np.asarray(r_em.iters))
    # f32 psum reordering: soft syndromes agree to tolerance, not bitwise
    np.testing.assert_allclose(
        np.asarray(r_es.soft_syndrome), np.asarray(r_em.soft_syndrome),
        rtol=1e-3, atol=1e-4,
    )
    assert np.asarray(r_es.converged).all()


# ---------------------------------------------------------------------------
# config-reachable model parallelism: the (data x model) chunk runner
# ---------------------------------------------------------------------------


def test_model_parallel_matches_data_parallel(spec):
    """The (data x model) runner must produce the SAME counters as the
    plain data-parallel runner with the same data-axis size and key: the
    front-end is shared code with identical per-device keys, and the
    edge-sharded decode is decision-identical to the single-chip decoder."""
    from kmldpc_tpu.parallel.edge_sharded import (
        get_mesh_2d,
        make_model_parallel_chunk_runner,
    )

    var = np.float32(10 ** (-0.5))  # 5 dB: plenty of errors
    key = jax.random.key(11)
    r_dp = make_sharded_chunk_runner(spec, 16, get_mesh(2))(key, var)
    r_mp = make_model_parallel_chunk_runner(spec, 16, get_mesh_2d(2, 4))(key, var)
    assert int(r_mp.tot_blk) == 16
    assert int(r_mp.tot_bit) == int(r_dp.tot_bit)
    assert int(r_mp.err_blk) == int(r_dp.err_blk)
    assert int(r_mp.err_bit) == int(r_dp.err_bit)
    assert float(r_mp.err_bit_sq) == float(r_dp.err_bit_sq)


def test_model_parallel_blind_end_to_end(assets):
    """Blind chain (k-means + metrics + winner-LLR reuse) through the
    model-parallel runner, with launch folding: counters must match the
    data-parallel runner exactly (shared front-end, identical keys,
    decision-identical edge-sharded decode)."""
    from kmldpc_tpu.parallel.edge_sharded import (
        get_mesh_2d,
        make_model_parallel_chunk_runner,
    )

    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    const = parse_constellation(str(assets / "4bit_16QAM_Gray.txt"))
    bspec = ChainSpec(
        code=code, constellation=const, known_h=False, fading=True,
        metric_type=False, metric_iter=5, max_iter=50,
        encoder_active=True, histogram=False,
    )
    key = jax.random.key(3)
    var = np.float32(10 ** (-2.4))  # 24 dB
    run = make_model_parallel_chunk_runner(
        bspec, 8, get_mesh_2d(2, 4), chunks_per_launch=2
    )
    assert run.blocks_per_launch == 16
    res = run(key, var)
    ref = make_sharded_chunk_runner(bspec, 8, get_mesh(2), chunks_per_launch=2)(
        key, var
    )
    assert int(res.tot_blk) == 16
    assert int(res.err_blk) == int(ref.err_blk)
    assert int(res.err_bit) == int(ref.err_bit)
    assert res.metrics.shape == (16, 4)
    np.testing.assert_allclose(
        np.asarray(res.metrics), np.asarray(ref.metrics), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cfile,modem,metric_type,schedule,msched", [
    # soft metric: the 4-candidate metric DECODES go through the
    # row-sharded slab decoder (round 5).  16QAM: all four rotations
    # separate — QPSK's complement pairs are exact/near-exact metric ties
    # (the inherent ambiguity, metric.py docstring) whose tie-break is
    # legitimately sensitive to f32 psum ordering, so counter equality is
    # only well-posed on a non-complement-closed table.
    ("PEG2304regular0.5.txt", "4bit_16QAM_Gray.txt", True, "flooding",
     "flooding"),
    # 5G hard metric: metric decode + row-sharded failed-check count on
    # the irregular punctured code
    ("5GLDPCBG2a3_R12_K960.txt", "4bit_16QAM_Gray.txt", False, "flooding",
     "flooding"),
    # matched min-sum metric decodes through the sharded core
    ("PEG2304regular0.5.txt", "4bit_16QAM_Gray.txt", True, "flooding-minsum",
     "match"),
    # the feature's target workload (VERDICT r4 item 1): blind PEG8064
    # with the soft metric — the message state model_parallel exists for
    ("PEG8064regular0.5.txt", "6bits_64QAM_Gray.txt", True, "flooding-minsum",
     "match"),
])
def test_model_parallel_sharded_metric_decodes(
    assets, cfile, modem, metric_type, schedule, msched
):
    """Blind chains whose METRIC stage decodes (soft metric / 5G hard
    metric) must produce the same counters through the model-parallel
    runner as through the data-parallel one: round 5 routes the
    4-candidate metric decodes through the row-sharded slab decoder
    (kmcodec.cc:121-142 analogue), removing the full per-device message
    state at the candidate-folded batch — the peak the feature exists to
    shed.  The final decode additionally runs the exact two-phase
    schedule."""
    from kmldpc_tpu.parallel.edge_sharded import (
        get_mesh_2d,
        make_model_parallel_chunk_runner,
    )

    code = load_code(str(assets / cfile))
    const = parse_constellation(str(assets / modem))
    bspec = ChainSpec(
        code=code, constellation=const, known_h=False, fading=True,
        metric_type=metric_type, metric_iter=3, max_iter=30,
        encoder_active=True, histogram=False, schedule=schedule,
        metric_schedule=msched, phase1_iters=3,
    )
    key = jax.random.key(5)
    var = np.float32(10 ** (-1.8))  # 18 dB
    r_mp = make_model_parallel_chunk_runner(bspec, 16, get_mesh_2d(2, 4))(key, var)
    r_dp = make_sharded_chunk_runner(bspec, 16, get_mesh(2))(key, var)
    assert int(r_mp.tot_blk) == 16
    assert int(r_mp.err_blk) == int(r_dp.err_blk)
    assert int(r_mp.err_bit) == int(r_dp.err_bit)
    # soft metrics: f32 psum reordering — close, not bitwise
    np.testing.assert_allclose(
        np.asarray(r_mp.metrics), np.asarray(r_dp.metrics), rtol=1e-4, atol=1e-4
    )


def test_edge_sharded_two_phase_bit_identical(assets):
    """The two-phase edge-sharded decoder (phase-1 full batch, compacted
    phase-2 tiles — the per-codeword early exit of
    binaryldpccodec.cc:217-232 recovered for the row-sharded core) must be
    BIT-identical to the single-phase edge-sharded decoder: BP is
    deterministic and per-codeword independent, so compaction only
    reschedules wasted work."""
    from jax.sharding import Mesh

    from kmldpc_tpu.parallel.edge_sharded import make_edge_sharded_decoder

    code = load_code(str(assets / "PEG2304regular0.5.txt"))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("model",))
    rng = np.random.default_rng(17)
    b = 32
    uu = rng.integers(0, 2, size=(b, code.code_dim)).astype(np.uint8)
    cc = np.stack([code.encode_reference(u) for u in uu])
    sig = 1 - 2 * cc.astype(np.float64)
    llr = jax.numpy.asarray(
        4.0 * sig + rng.normal(scale=3.0, size=sig.shape), jax.numpy.float32
    )
    d1 = make_edge_sharded_decoder(code, mesh)
    d2 = make_edge_sharded_decoder(code, mesh, phase1_iters=4, tile=8)
    # the batch must actually exercise phase 2: stragglers at the
    # phase-1 budget force the compacted tile loop to run
    assert int(np.asarray(d1(llr, 4).converged).sum()) < b
    r1 = d1(llr, 30)
    r2 = d2(llr, 30)
    np.testing.assert_array_equal(np.asarray(r1.cc_hat), np.asarray(r2.cc_hat))
    np.testing.assert_array_equal(
        np.asarray(r1.converged), np.asarray(r2.converged)
    )
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r2.iters))
    np.testing.assert_array_equal(
        np.asarray(r1.soft_syndrome), np.asarray(r2.soft_syndrome)
    )
    assert int(np.asarray(r1.converged).sum()) > 0


def test_model_parallel_validation(spec):
    from kmldpc_tpu.parallel.edge_sharded import (
        get_mesh_2d,
        make_model_parallel_chunk_runner,
    )

    import dataclasses

    mesh = get_mesh_2d(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        make_model_parallel_chunk_runner(spec, 15, mesh)
    ms = dataclasses.replace(spec, schedule="layered-minsum")
    with pytest.raises(ValueError, match="flooding schedule"):
        make_model_parallel_chunk_runner(ms, 16, mesh)
    hist = dataclasses.replace(spec, histogram=True)
    with pytest.raises(ValueError, match="histogram"):
        make_model_parallel_chunk_runner(hist, 16, mesh)
    with pytest.raises(ValueError, match="needs 16 devices"):
        get_mesh_2d(2, 8)
    # this runner bypasses build_chain_fn — it must replicate the strict
    # schedule/dtype validation, not silently pick defaults (r4 review)
    typo = dataclasses.replace(spec, schedule="floding-minsum")
    with pytest.raises(ValueError, match="unknown schedule"):
        make_model_parallel_chunk_runner(typo, 16, mesh)
    bf16 = dataclasses.replace(spec, dtype="bfloat16")
    with pytest.raises(ValueError, match="float32 only"):
        make_model_parallel_chunk_runner(bf16, 16, mesh)


def test_model_parallel_config_end_to_end():
    """`[tpu].model_parallel` routes a real sweep through the
    (data x model) runner: the committed PEG8064 config decodes end-to-end
    with row-sharded message state on the virtual 8-device mesh."""
    import pathlib

    from kmldpc_tpu.config import load_config
    from kmldpc_tpu.sim import Simulator

    repo = pathlib.Path(__file__).resolve().parent.parent
    cfg = load_config(str(repo / "configs" / "peg8064_model_parallel.toml"))
    sim = Simulator(cfg)
    assert getattr(sim.runner, "num_row_shards", None) == 4
    results = sim.simulate()
    assert len(results) == 1
    assert results[0].tot_blk == 16
    assert results[0].fer < 1.0  # 18 dB known-h: most blocks decode
    # the round-5 blind composition: soft-metric decodes row-sharded too
    cfgb = load_config(
        str(repo / "configs" / "peg8064_blind_model_parallel.toml")
    )
    simb = Simulator(cfgb)
    assert getattr(simb.runner, "num_row_shards", None) == 4
    resb = simb.simulate()
    assert len(resb) == 1 and resb[0].tot_blk == 16
    assert resb[0].fer < 1.0  # 22 dB blind 64QAM: most blocks decode
