"""PEG8064 bandwidth experiment: graph-locality (RCM) relabeling of the
Tanner graph vs the original random labeling.

The roofline analysis (benchmarks/RESULTS.md) attributes the remaining ~2x
between the measured PEG8064 flooding iteration and the HBM bound to the
graph-random gathers: per iteration the slot-major core issues one edge
gather (c2v row-flat -> column-grouped) and one node gather (posteriors ->
row slots), both with effectively random row indices (the PEG construction
is intentionally structureless; CN/VN traversal order in the reference:
binaryldpccodec.cc:176-275).  A one-time reverse-Cuthill-McKee relabeling
of the bipartite graph makes both index streams near-banded — if gather
throughput on this hardware is locality-sensitive, µs/iteration drops with
no semantic change (BP is invariant to node relabeling up to f32 sum
order; a production integration would add one [nc, B] permute of the LLR
input and one of the outputs per decode, ~0.3% of a 50-iteration budget).

Usage (real TPU):
    timeout 900 python -u tools/locality.py [--json out.json]

Measures µs/iteration of the slot-major flooding core (both CN rules) at
B=1024 with the original vs RCM tables, using the same steady() harness as
tools/microbench.py; prints the band-width statistics of both labelings.
Classic (non-punctured) codes only — the 5G prior-insertion convention
pins the first 2Z column labels.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np

from tools.microbench import _save, steady  # noqa: E402  (shared harness)
import tools.microbench as microbench  # noqa: E402


def rcm_relabel(code):
    """Relabel rows+columns of the Tanner graph by reverse Cuthill-McKee.

    Returns ``(new_code, rinv, cinv)`` where ``rinv[old_row]`` /
    ``cinv[old_col]`` are the new labels and ``new_code`` is the same
    bipartite graph with near-banded adjacency.  Decode-table use only:
    the encoder slab and info_slice keep the ORIGINAL labeling, so the
    relabeled object must not be used to extract info bits — it exists to
    time the decoder's gathers.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from kmldpc_tpu.code.ldpc import _build_adjacency

    assert code.punct == 0, "classic codes only (see module docstring)"
    nr, nc = code.num_row, code.num_col
    r = code.edge_row.astype(np.int64)
    c = code.edge_col.astype(np.int64) + nr  # bipartite: cols after rows
    n = nr + nc
    ones = np.ones(r.shape[0])
    adj = coo_matrix(
        (np.concatenate([ones, ones]),
         (np.concatenate([r, c]), np.concatenate([c, r]))),
        shape=(n, n),
    ).tocsr()
    order = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
    # RCM order of the combined nodes -> separate new labelings
    row_nodes = order[order < nr]           # old row ids in RCM order
    col_nodes = order[order >= nr] - nr     # old col ids in RCM order
    rinv = np.empty(nr, np.int64)
    rinv[row_nodes] = np.arange(nr)
    cinv = np.empty(nc, np.int64)
    cinv[col_nodes] = np.arange(nc)
    adj_t = _build_adjacency(
        rinv[code.edge_row.astype(np.int64)],
        cinv[code.edge_col.astype(np.int64)],
        nr, nc,
    )
    return dataclasses.replace(code, **adj_t), rinv, cinv


def band_stats(code) -> dict:
    """Mean/max |scaled row - col| over edges — the gather-locality proxy."""
    r = code.edge_row.astype(np.float64) * (code.num_col / code.num_row)
    c = code.edge_col.astype(np.float64)
    d = np.abs(r - c)
    return {"mean_band": round(float(d.mean()), 1),
            "max_band": round(float(d.max()), 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--code", default="PEG8064regular0.5.txt")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    microbench._JSON_PATH = args.json

    import jax
    import jax.numpy as jnp

    from kmldpc_tpu.code import load_code
    from kmldpc_tpu.decoder.bp import DecoderTables
    from kmldpc_tpu.decoder.bp_em import flooding_decode_em

    print(f"locality: device={jax.devices()[0]}", file=sys.stderr)
    code = load_code(os.path.join(HERE, "assets", args.code))
    rcm, rinv, cinv = rcm_relabel(code)
    results: dict = {"device": str(jax.devices()[0])}
    for label, cc in (("orig", code), ("rcm", rcm)):
        results[f"band/{label}"] = band_stats(cc)
        print(f"band/{label}: {results[f'band/{label}']}", file=sys.stderr)
    _save(results)

    # sanity: the relabeled graph is the same code — a noiseless word
    # (permuted into the new column labeling) decodes in one sweep
    t_orig = DecoderTables.from_code(code)
    t_rcm = DecoderTables.from_code(rcm)
    rng = np.random.default_rng(5)
    uu = rng.integers(0, 2, size=(4, code.code_dim)).astype(np.uint8)
    cc_words = np.stack([code.encode_reference(u) for u in uu])
    llr = np.where(cc_words == 0, 9.0, -9.0).astype(np.float32)
    # new column label of old column j is cinv[j]
    llr_rcm = np.empty_like(llr)
    llr_rcm[:, cinv] = llr
    res = jax.jit(lambda x: flooding_decode_em(t_rcm, x, 5))(jnp.asarray(llr_rcm))
    cc_hat = np.asarray(res.cc_hat)
    back = cc_hat[:, cinv]
    assert np.array_equal(back, cc_words), "RCM relabeling is not the same code"
    assert np.asarray(res.converged).all()
    print("sanity: RCM graph decodes the same codewords (1-sweep converge)",
          file=sys.stderr)

    base_key = jax.random.key(7)
    tx = code.num_col
    iters = args.iters
    batch = args.batch

    def llr_of(i):
        key = jax.random.fold_in(base_key, i)
        return 0.3 * jax.random.normal(key, (batch, tx), dtype="float32")

    for cn_rule in ("minsum", "sumprod"):
        for label, tabs in (("orig", t_orig), ("rcm", t_rcm)):
            fn = jax.jit(
                lambda t, i, _r=cn_rule: (lambda res: (res.iters.sum(), res))(
                    flooding_decode_em(t, llr_of(i), iters, cn_rule=_r)
                )
            )
            sec, spread = steady(
                lambda i: fn(tabs, jnp.int32(i))[0], passes=3
            )
            us = sec / iters * 1e6
            key = f"locality/{args.code.split('.')[0]}/{cn_rule}/{label}"
            results[key] = {"us_per_iter": round(us, 1),
                            "spread_pct": round(spread, 1),
                            "batch": batch, "iters": iters}
            _save(results)
            print(f"{key}: {us:.0f} us/iter ±{spread:.1f}%", file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
