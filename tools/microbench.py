"""On-chip microbenchmarks: decoder µs/iteration, k-means µs/call, chunk blk/s.

Every per-component perf claim in benchmarks/RESULTS.md must be reproducible
by a row of this harness (VERDICT round 1 item 10: numbers live in a
re-runnable artifact, not commit messages).

Usage:
    timeout 900 python tools/microbench.py [--json out.json] [group ...]

Groups (default: all):
    decoder   µs/iteration of each decode schedule per code, at an SNR low
              enough that no codeword converges (so cost = max_iter sweeps)
    kmeans    µs per 20-iteration blind estimate, jax vs pallas impl
    chain     blk/s of full chunk pipelines (the RESULTS.md throughput rows)

Methodology matches bench.py: pipelined dispatch (3 launches in flight),
adaptive warmup until two consecutive probes agree, steady-state timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ASSETS = os.path.join(HERE, "assets")

# Incremental result sink: set from --json.  Every completed row is flushed
# to disk immediately — on this relay a single program's first execution
# can take minutes (and a run can hit its timeout mid-group), so results
# must survive a partial run.
_JSON_PATH: str | None = None


def _save(results: dict) -> None:
    if _JSON_PATH:
        tmp = _JSON_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        os.replace(tmp, _JSON_PATH)


def steady(fn, n1: int = 6, n2: int | None = None, passes: int = 1):
    """Steady-state seconds per call via a two-point slope.

    ``fn(i)`` must dispatch device work for index ``i`` and return a 0-d jax
    array derived from ALL of it.  The scalar contract is load-bearing on
    this relay: ``block_until_ready`` on large remote buffers returns
    without fencing execution (measured: 0.34 ms "decodes" that really take
    30 ms), while reading back a scalar is a true fence costing one ~28 ms
    RTT.  So each batch of calls is accumulated into one scalar and read
    back once, and the (n2 - n1)-call slope cancels that fixed RTT plus any
    residual warmup.  Inputs must be unique per call (fold a key by ``i``).

    ``passes > 1`` repeats the slope measurement that many times
    (interleaved, after the shared warmup) and quotes the MEDIAN — this
    relay's throughput drifts ±3-5% (one observed 12% window) between
    passes, so single-pass numbers carry no error bar (VERDICT r3 item 5).

    ``n2 = None`` (default) sizes the long run from the warmup estimate
    (tools/rows.py pick_n2): fast calls (< ~20 ms) get enough of them
    that the measured span dominates the ~30 ms fixed relay cost — the
    fixed n2=18 of earlier rounds gave a 1.9 ms/launch chain row only a
    ~34 ms span and one ±41% pass (microbench_r5.json).

    Returns ``(sec_per_call_median, spread_pct)``; spread is 0.0 for
    ``passes=1``.
    """
    import numpy as np

    from tools.rows import pick_n2

    def run(n: int, base: int) -> float:
        t0 = time.perf_counter()
        acc = fn(base)
        for i in range(1, n):
            acc = acc + fn(base + i)
        np.asarray(acc)  # single scalar readback = execution fence
        return time.perf_counter() - t0

    prev = None
    for probe in range(10):  # adaptive warmup: relay's slow first-exec path
        dt = run(3, 1_000 + 3 * probe)
        if prev is not None and probe >= 1 and dt < prev * 1.15 and prev < dt * 1.15:
            break
        prev = dt
    if n2 is None:
        n2 = max(18, pick_n2(prev / 3 if prev else 0.0, n1))
    vals = []
    fallback = None
    for p in range(2 * passes):  # retry budget for stall-corrupted passes
        t1 = run(n1, 2_000 + 200 * p)
        t2 = run(n2, 3_000 + 200 * p)
        fallback = t2 / n2  # always-positive upper bound
        slope = (t2 - t1) / (n2 - n1)
        # a relay stall during the short run can make the slope <= 0
        # (observed class: same program 1 s vs minutes) — discard, retry
        if slope > 0:
            vals.append(slope)
            if len(vals) == passes:
                break
    if not vals:
        return fallback, 0.0
    vals.sort()
    med = vals[len(vals) // 2]
    spread = (vals[-1] - vals[0]) / med * 100.0 if len(vals) > 1 else 0.0
    return med, spread


def bench_decoders(results: dict, batch: int = 1024, iters: int = 20,
                   passes: int = 1) -> None:
    import jax
    import jax.numpy as jnp

    from kmldpc_tpu.code import load_code
    from kmldpc_tpu.decoder.bp import DecoderTables, flooding_decode
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em
    from kmldpc_tpu.decoder.minsum import layered_minsum_decode, minsum_tables

    base_key = jax.random.key(7)
    # Most-important-first: on the slow-relay days a run may not finish
    # (first execution of one program can take minutes), and PEG8064
    # carries the new flooding-minsum row.
    for name, fname in [
        ("PEG8064", "PEG8064regular0.5.txt"),
        ("5G-BG2-K960", "5GLDPCBG2a3_R12_K960.txt"),
        ("PEG2304", "PEG2304regular0.5.txt"),
    ]:
        code = load_code(os.path.join(ASSETS, fname))
        dt = DecoderTables.from_code(code)
        mt = minsum_tables(code)
        tx_len = code.num_col - code.punct

        # Noise is generated ON DEVICE from a per-call index (unique inputs
        # per dispatch); LLR scale 0.3 is too weak to ever converge, so cost
        # = `iters` full sweeps.  Returns (scalar, full result): the scalar
        # satisfies steady()'s fence contract, the full result keeps the
        # while-loop outputs live (scalar-reduced loop outputs SIGSEGV the
        # AOT compile helper — same keep-alive as ChunkResult.raw).
        def llr_of(i):
            key = jax.random.fold_in(base_key, i)
            return 0.3 * jax.random.normal(key, (batch, tx_len), dtype="float32")

        flood = jax.jit(
            lambda t, i: (lambda r: (r.iters.sum(), r))(
                flooding_decode(t, llr_of(i), iters)
            )
        )
        flood_em = jax.jit(
            lambda t, i: (lambda r: (r.iters.sum(), r))(
                flooding_decode_em(t, llr_of(i), iters)
            )
        )
        ms = jax.jit(
            lambda t, i: (lambda r: (r.iters.sum(), r))(
                layered_minsum_decode(t, llr_of(i), iters, 0.75)
            )
        )
        fms = jax.jit(
            lambda t, i: (lambda r: (r.iters.sum(), r))(
                flooding_decode_em(t, llr_of(i), iters, cn_rule="minsum")
            )
        )
        rows = [
            ("flooding", flood, dt),
            # the production layout (slot-major / degree-class core used by
            # the chain's two-phase path)
            ("flooding[em]", flood_em, dt),
            # min-sum CN rule on the flooding schedule (no transcendentals)
            ("flooding-minsum[em]", fms, dt),
            (f"minsum[{'qc' if mt.qc else 'generic'}]", ms, mt),
        ]
        if mt.qc is not None:
            mt_gen = minsum_tables(code, layer_size=code.lifting_factor, use_qc=False)
            rows.append(("minsum[generic]", ms, mt_gen))

        for label, fn, tabs in rows:
            sec, spread = steady(lambda i: fn(tabs, jnp.int32(i))[0],
                                 passes=passes)
            us_per_iter = sec / iters * 1e6
            key = f"decoder/{name}/{label}"
            results[key] = {"us_per_iter": round(us_per_iter, 1),
                            "spread_pct": round(spread, 1),
                            "batch": batch, "iters": iters}
            _save(results)
            print(f"{key}: {us_per_iter:.0f} us/iter ±{spread:.1f}% "
                  f"({sec*1e3:.2f} ms / {iters} iters, B={batch})", file=sys.stderr)


def bench_kmeans(results: dict, batch: int = 1024, nsym: int = 1152,
                 passes: int = 1) -> None:
    import jax

    from kmldpc_tpu.detect.kmeans import make_blind_estimator
    from kmldpc_tpu.io import parse_constellation
    from kmldpc_tpu.ops.modem import ModemTables

    on_tpu = jax.default_backend() not in ("cpu",)
    for cname, fname, n in [
        ("QPSK", "2bits_QPSK.txt", nsym),
        ("16QAM", "4bit_16QAM_Gray.txt", nsym // 2),
        ("64QAM", "6bits_64QAM_Gray.txt", nsym // 3),
    ]:
        tables = ModemTables.from_constellation(
            parse_constellation(os.path.join(ASSETS, fname))
        )
        base_key = jax.random.key(3)

        def y_of(i):  # unique on-device inputs per dispatch (see decoder note)
            y = jax.random.normal(
                jax.random.fold_in(base_key, i), (2, batch, n), dtype="float32"
            )
            return y[0], y[1]

        impls = {"jax": make_blind_estimator(tables, 20, "max")}
        if on_tpu:
            try:
                from kmldpc_tpu.detect.kmeans_pallas import (
                    make_blind_estimator_pallas,
                )

                impls["pallas"] = make_blind_estimator_pallas(tables, 20, "max")
            except Exception as e:  # kernel unsupported for this M
                print(f"kmeans/{cname}/pallas: unavailable ({e})", file=sys.stderr)
        for impl, est in impls.items():
            # (scalar, full outputs) — see decoder note on the fence contract
            jest = jax.jit(
                lambda i, _est=est: (lambda hr, hi: (hr.sum() + hi.sum(), (hr, hi)))(
                    *_est(*y_of(i))
                )
            )
            try:
                import jax.numpy as jnp

                sec, spread = steady(lambda i: jest(jnp.int32(i))[0],
                                     passes=passes)
            except Exception as e:
                print(f"kmeans/{cname}/{impl}: FAILED ({type(e).__name__})",
                      file=sys.stderr)
                continue
            key = f"kmeans/{cname}/{impl}"
            results[key] = {"us_per_call": round(sec * 1e6, 1),
                            "spread_pct": round(spread, 1),
                            "batch": batch, "nsym": n}
            _save(results)
            print(f"{key}: {sec*1e6:.0f} us/call ±{spread:.1f}% "
                  f"(B={batch}, {n} sym)", file=sys.stderr)


# The chain row matrix lives in tools/rows.py — ONE definition shared with
# bench.py and pinned by tests/test_bench_rows.py (the "landed unbenched"
# fix of rounds 1-3, now without a second copy to drift).
from tools.rows import (  # noqa: E402
    CAL_NOMINAL_BLK_S,
    CHAIN_ROWS,
    calibrated,
    calibration_row,
    make_spec,
)

_PRIMARY = ("us_per_iter", "us_per_call", "blocks_per_s")


def run_calibration(results: dict, passes: int = 3) -> float:
    """Time the fixed calibration program (tools/rows.py) and record the
    session factor under ``_calibration``.  Returns the factor (0.0 if the
    measurement failed — rows then carry no ``calibrated`` field).

    Round 5: in-run spread is ±1-7% but the same row drifts ±20-24%
    between relay windows (benchmarks/RESULTS.md), so raw cross-session
    diffs can hide real regressions.  Every microbench session times this
    one pinned program FIRST; each row's ``calibrated`` value is its
    primary metric normalized by the session factor, and ``--diff``
    compares calibrated values when both sides carry them.
    """
    import jax
    import numpy as np

    from kmldpc_tpu.sim.chain import make_chunk_runner

    r = calibration_row()
    try:
        spec = make_spec(r, ASSETS)
        runner = make_chunk_runner(spec, r.batch, r.cpl)
        var = np.float32(10.0 ** (-0.1 * r.snr_db))
        key = jax.random.key(42)
        sec, spread = steady(
            lambda i: runner(jax.random.fold_in(key, i), var).err_blk,
            passes=passes,
        )
    except Exception as e:
        # a broken calibration must not kill the session's other groups —
        # rows then carry raw metrics only (no `calibrated` field)
        print(f"calibration FAILED ({type(e).__name__}: {e}); "
              "rows will carry raw metrics only", file=sys.stderr)
        return 0.0
    blk_s = r.batch * r.cpl / sec
    factor = blk_s / CAL_NOMINAL_BLK_S
    results["_calibration"] = {
        "row": r.name, "blocks_per_s": round(blk_s, 1),
        "nominal_blocks_per_s": CAL_NOMINAL_BLK_S,
        "factor": round(factor, 4), "spread_pct": round(spread, 1),
    }
    _save(results)
    print(f"calibration: {blk_s:,.0f} blk/s -> session factor {factor:.3f} "
          f"±{spread:.1f}%", file=sys.stderr)
    return factor


def apply_calibration(results: dict) -> None:
    """Stamp each row's ``calibrated`` primary metric from ``_calibration``."""
    factor = results.get("_calibration", {}).get("factor", 0.0)
    if not factor:
        return
    for k, row in results.items():
        if not isinstance(row, dict) or k == "_calibration":
            continue
        for m in _PRIMARY:
            if m in row:
                row["calibrated"] = round(calibrated(row[m], m, factor), 1)
                break


def bench_chain(results: dict, only: str | None = None,
                passes: int = 3) -> None:
    import jax
    import numpy as np

    from kmldpc_tpu.sim.chain import make_chunk_runner

    key = jax.random.key(0)
    for r in CHAIN_ROWS:
        if only and only not in r.name:
            continue
        batch = r.batch or 1024
        cpl = r.cpl or 16
        spec = make_spec(r, ASSETS)
        runner = make_chunk_runner(spec, batch, cpl)
        var = np.float32(10.0 ** (-0.1 * r.snr_db))
        # err_blk is a scalar ChunkResult field — satisfies the fence contract
        sec, spread = steady(
            lambda i: runner(jax.random.fold_in(key, i), var).err_blk,
            passes=passes,
        )
        blk_s = batch * cpl / sec
        results[f"chain/{r.name}"] = {
            "blocks_per_s": round(blk_s, 1),
            "info_bits_per_s": round(blk_s * spec.code.code_dim, 1),
            "spread_pct": round(spread, 1),
            "batch": batch, "chunks_per_launch": cpl, "snr_db": r.snr_db,
        }
        _save(results)
        print(f"chain/{r.name}: {blk_s:,.0f} blk/s ±{spread:.1f}% "
              f"({sec/cpl*1e3:.2f} ms/chunk, B={batch} cpl={cpl})",
              file=sys.stderr)


def diff_against(results: dict, baseline_path: str) -> list[dict]:
    """Print (and return) a per-row regression report vs a baseline JSON.

    Rows sharing a key are compared on their primary metric (us_per_iter /
    us_per_call: lower is better; blocks_per_s: higher is better).  When
    BOTH sides carry a ``calibrated`` value (round 5), the comparison uses
    it — the session-normalized metric exposes regressions that raw
    numbers hide inside the ±20-24% cross-window drift.  Rows present on
    only one side are listed — a silently dropped row is how perf
    regressions have hidden twice (VERDICT rounds 1-2).
    """
    with open(baseline_path) as f:
        base = json.load(f)
    keys = sorted((set(base) | set(results)) - {"device", "_calibration"})
    print(f"--- diff vs {baseline_path} ---", file=sys.stderr)
    report: list[dict] = []
    for k in keys:
        b, r = base.get(k), results.get(k)
        if b is None or r is None:
            note = "NEW" if b is None else "MISSING (was in baseline)"
            print(f"{k}: {note}", file=sys.stderr)
            report.append({"row": k, "note": note})
            continue
        for m in _PRIMARY:
            if m in b and m in r and b[m]:
                better_low = m.startswith("us_")
                use_cal = "calibrated" in b and "calibrated" in r and b["calibrated"]
                bv, rv = (b["calibrated"], r["calibrated"]) if use_cal else (b[m], r[m])
                change = (rv - bv) / bv * 100.0
                word = ("slower" if change > 0 else "faster") if better_low else \
                       ("faster" if change > 0 else "slower")
                label = f"{m}[calibrated]" if use_cal else m
                print(f"{k}: {label} {bv:,} -> {rv:,} ({abs(change):.1f}% {word})",
                      file=sys.stderr)
                report.append({"row": k, "metric": label, "base": bv, "new": rv,
                               "change_pct": change, "worse": (change > 0) == better_low})
                break
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("groups", nargs="*", default=[],
                    help="decoder kmeans chain (default all); or chain:<substr>")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("--diff", default=None,
                    help="baseline JSON (e.g. benchmarks/microbench_r3_chain.json) "
                         "to report per-row changes against")
    ap.add_argument("--passes", type=int, default=None,
                    help="interleaved slope passes per row (median + spread; "
                         "default: 3 for chain, 1 for decoder/kmeans)")
    ap.add_argument("--no-calibration", action="store_true",
                    help="skip the session-calibration program (rows then "
                         "carry raw metrics only)")
    args = ap.parse_args()
    groups = args.groups or ["decoder", "kmeans", "chain"]
    global _JSON_PATH
    _JSON_PATH = args.json

    import jax

    print(f"microbench: device={jax.devices()[0]}", file=sys.stderr)
    results: dict = {"device": str(jax.devices()[0])}
    if not args.no_calibration:
        run_calibration(results, passes=args.passes or 3)
    for g in groups:
        if g == "decoder":
            bench_decoders(results, passes=args.passes or 1)
        elif g == "kmeans":
            bench_kmeans(results, passes=args.passes or 1)
        elif g == "chain":
            bench_chain(results, passes=args.passes or 3)
        elif g.startswith("chain:"):
            bench_chain(results, only=g.split(":", 1)[1],
                        passes=args.passes or 3)
        else:
            raise SystemExit(f"unknown group {g!r}")
    apply_calibration(results)
    out = json.dumps(results, indent=1)
    _save(results)
    if args.diff:
        diff_against(results, args.diff)
    print(out)


if __name__ == "__main__":
    main()
