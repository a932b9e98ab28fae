"""Benchmark: decoded info bits/s/chip across the headline configurations.

Prints ONE JSON line on stdout (the driver contract):
    {"metric": ..., "value": N, "unit": "info_bits/s", "vs_baseline": N}

The headline number is the *blind-detection* pipeline (k-means + 4-candidate
ambiguity metrics + flooding BP to 50 iters) on PEG2304 R=1/2 + QPSK at
15 dB — the reference's flagship mode — measured in steady state on one
chip.  ``vs_baseline`` is the ratio to the single-core C++ reference
measured on this machine (BASELINE_MEASURED.json: 296.5 blocks/s blind,
749.5 blocks/s known-h at the same operating point).

Beyond the headline, every throughput row in benchmarks/RESULTS.md is also
measured by the same run (driver-visible, VERDICT r2 item 2): known-h
QPSK, 5G flooding, 5G layered min-sum, and PEG8064 blind.  Each extra row
goes to stderr as its own JSON line and the full set is written to
``benchmarks/bench_rows_latest.json``.  A wall-clock budget
(KMLDPC_BENCH_BUDGET_S, default 840 s) guards the driver's timeout: rows
that would not fit are reported as skipped on stderr — never silently.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("KMLDPC_BENCH_BUDGET_S", "840"))


def left() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def measure(runner, key, var, steps: int = 12) -> float:
    """Steady-state seconds per chunk, pipelined.

    Chunks are dispatched back-to-back without intermediate syncs — exactly
    how the Monte-Carlo driver issues them (double-buffered, see
    sim/montecarlo.py) — so the host<->device round-trip latency overlaps
    compute instead of being serialized into every chunk.

    Warmup is adaptive: the dev-tunnel relay serves the first executions of
    a freshly compiled program through a slow path for a variable number of
    dispatches (observed up to ~10x for several chunks after another
    process released the chip), so small mini-batches are timed until two
    consecutive ones agree before the measured run starts.
    """
    import jax

    prev = None
    for i in range(12):  # each probe = 3 pipelined chunks
        t0 = time.perf_counter()
        res = [runner(jax.random.fold_in(key, 3 * i + j), var) for j in range(3)]
        jax.block_until_ready(res)
        dt = time.perf_counter() - t0
        if prev is not None and i >= 2 and dt < prev * 1.15 and prev < dt * 1.15:
            break
        prev = dt
    t0 = time.perf_counter()
    results = [runner(jax.random.fold_in(key, 100 + i), var) for i in range(steps)]
    jax.block_until_ready(results)
    return (time.perf_counter() - t0) / steps


# (row key, code file, constellation file, known_h, schedule, snr_dB,
#  batch, chunks_per_launch, extra ChainSpec kwargs) — mirrors RESULTS.md /
#  microbench CHAIN_ROWS.
ROWS = [
    ("blind/PEG2304+QPSK", "PEG2304regular0.5.txt", "2bits_QPSK.txt",
     False, "flooding", 15.0, None, None, {}),
    ("known/PEG2304+QPSK", "PEG2304regular0.5.txt", "2bits_QPSK.txt",
     True, "flooding", 15.0, None, None, {}),
    ("known/5G+16QAM/minsum", "5GLDPCBG2a3_R12_K960.txt", "4bit_16QAM_Gray.txt",
     True, "layered-minsum", 18.0, 1024, 4, {}),
    # full min-sum blind mode: metric decodes matched to the QC fast path
    ("blind/5G+16QAM/minsum", "5GLDPCBG2a3_R12_K960.txt", "4bit_16QAM_Gray.txt",
     False, "layered-minsum", 18.0, 1024, 4, {"metric_schedule": "match"}),
    ("known/5G+16QAM/flooding", "5GLDPCBG2a3_R12_K960.txt", "4bit_16QAM_Gray.txt",
     True, "flooding", 18.0, 1024, 4, {}),
    ("blind/PEG8064+64QAM", "PEG8064regular0.5.txt", "6bits_64QAM_Gray.txt",
     False, "flooding", 18.0, 1024, 1, {}),
    # min-sum CN rule on the flooding schedule (PARITY.md sweep 8)
    ("blind/PEG8064+64QAM/fminsum", "PEG8064regular0.5.txt",
     "6bits_64QAM_Gray.txt", False, "flooding-minsum", 18.0, 1024, 1,
     {"metric_schedule": "match"}),
]


def main() -> None:
    import jax
    import numpy as np

    from kmldpc_tpu.code import load_code
    from kmldpc_tpu.io import parse_constellation
    from kmldpc_tpu.sim.chain import ChainSpec, make_chunk_runner

    batch_env = int(os.environ.get("KMLDPC_BENCH_BATCH", "1024"))
    # "float32" (reference-parity default) or "bfloat16" (opt-in message
    # storage dtype; statistically equivalent BER/FER — see PARITY.md).
    dtype = os.environ.get("KMLDPC_BENCH_DTYPE", "float32")
    # sub-chunks folded per device launch (amortizes ~3 ms/launch of relay
    # overhead; see sim/chain.py make_chunk_runner). The bench uses 16 —
    # pure-throughput setting; the Simulator defaults to 8 to keep
    # stopping-rule granularity at 8k blocks.
    cpl_env = int(os.environ.get("KMLDPC_BENCH_CPL", "16"))
    key = jax.random.key(0)

    dev = jax.devices()[0]
    print(f"bench: device={dev} batch={batch_env} budget={BUDGET_S:.0f}s",
          file=sys.stderr)

    rows_out: dict = {"device": str(dev)}
    headline_bits = None
    for i, (name, cfile, mfile, known, sched, snr, batch, cpl,
            extra) in enumerate(ROWS):
        batch = batch or batch_env
        cpl = cpl or cpl_env
        # The first two rows are mandatory (headline + its known-h A/B);
        # later rows yield to the budget so the driver's timeout is never
        # hit mid-row.  Never skip silently.
        if i >= 2 and left() < 150:
            print(f"bench: SKIPPED {name} (budget: {left():.0f}s left)",
                  file=sys.stderr)
            continue
        code = load_code(os.path.join(HERE, "assets", cfile))
        const = parse_constellation(os.path.join(HERE, "assets", mfile))
        spec = ChainSpec(
            code=code, constellation=const, known_h=known, fading=True,
            metric_type=False, metric_iter=5, max_iter=50,
            encoder_active=True, histogram=False, schedule=sched, dtype=dtype,
            **extra,
        )
        runner = make_chunk_runner(spec, batch, cpl)
        var = np.float32(10.0 ** (-0.1 * snr))
        sec = measure(runner, jax.random.fold_in(key, i), var) / cpl
        blk_s = batch / sec
        bits_s = blk_s * code.code_dim
        row = {
            "blocks_per_s": round(blk_s, 1),
            "info_bits_per_s": round(bits_s, 1),
            "batch": batch, "chunks_per_launch": cpl, "snr_db": snr,
            "schedule": sched,
        }
        rows_out[name] = row
        print("bench-row " + json.dumps({"row": name, **row}), file=sys.stderr)
        if i == 0:
            headline_bits = bits_s

    try:
        with open(os.path.join(HERE, "benchmarks", "bench_rows_latest.json"), "w") as f:
            json.dump(rows_out, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"bench: could not write bench_rows_latest.json: {e}", file=sys.stderr)

    # Single-core C++ reference at the same operating point
    # (BASELINE_MEASURED.json).
    baseline_blind_bits = 296.5 * 1152
    try:
        with open(os.path.join(HERE, "BASELINE_MEASURED.json")) as f:
            baseline_blind_bits = json.load(f)["blind"]["info_bits_per_s"]
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "blind decoded info bits/s/chip (PEG2304 R=1/2 QPSK, 15 dB, kmeans+metrics+50-iter BP)",
                "value": round(headline_bits, 1),
                "unit": "info_bits/s",
                "vs_baseline": round(headline_bits / baseline_blind_bits, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
