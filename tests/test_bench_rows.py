"""The driver-visible bench surfaces must never rot: every row of bench.py
ROWS and tools/microbench.py CHAIN_ROWS builds a valid chunk runner.

Both rounds 1 and 2 shipped a perf regression inside a config the driver
bench did not cover; the row tables are the fix, and this test keeps the
tables themselves loadable (tuple-shape drift, bad ChainSpec kwargs, or a
renamed asset would otherwise only surface on the TPU at round end).
"""

import dataclasses
import os
import sys

import jax
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from kmldpc_tpu.code import load_code
from kmldpc_tpu.io import parse_constellation
from kmldpc_tpu.sim.chain import ChainSpec, build_chain_fn, make_chain_params


def _trace(spec: ChainSpec) -> None:
    params = make_chain_params(spec)
    fn = build_chain_fn(spec, batch=4)
    out = jax.eval_shape(fn, params, jax.random.key(0), np.float32(0.1))
    assert out.tot_blk.shape == ()


def _spec(cfile, mfile, known, sched, extra):
    code = load_code(os.path.join(HERE, "assets", cfile))
    const = parse_constellation(os.path.join(HERE, "assets", mfile))
    return ChainSpec(
        code=code, constellation=const, known_h=known, fading=True,
        metric_type=False, metric_iter=5, max_iter=50,
        encoder_active=True, histogram=False, schedule=sched, **extra,
    )


def test_bench_rows_build():
    import bench

    assert len(bench.ROWS) >= 5
    for (name, cfile, mfile, known, sched, snr, batch, cpl, extra) in bench.ROWS:
        _trace(_spec(cfile, mfile, known, sched, extra))


def test_microbench_chain_rows_build():
    from tools.microbench import CHAIN_ROWS

    assert len(CHAIN_ROWS) >= 11
    for (label, cfile, mfile, known, sched, mtype, snr, batch, cpl,
         extra) in CHAIN_ROWS:
        spec = _spec(cfile, mfile, known, sched, extra)
        if mtype:
            spec = dataclasses.replace(spec, metric_type=True)
        _trace(spec)
