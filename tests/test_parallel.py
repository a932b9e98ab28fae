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
