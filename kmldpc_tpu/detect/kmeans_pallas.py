"""Fused Pallas kernel: the ENTIRE blind k-means estimate in one kernel.

The pure-JAX estimator (detect/kmeans.py) materializes, per iteration, the
[B, Nsym, M] distance tensor, its argmin, and a one-hot of the assignment
(tens of MB of HBM traffic per iteration at production batch sizes).  The
first-generation kernel here fused one iteration's assignment+accumulation
but still ran 20 ``pallas_call``s (one per iteration) with the re-anchoring
in plain JAX between them — and a jax 0.9.0 closed_call lowering-cache bug
forbade placing those calls inside a ``fori_loop`` for M > 4, forcing a
20-way unroll whose compile time grew with M (the 64QAM variant compiled
for minutes).

This version holds the WHOLE loop inside one kernel: each grid step loads
its [TB, Nsym] tile of received symbols into VMEM once and runs

    init (max-|y| anchor)  ->  fori_loop(iters):
        assignment (M-way running min, unrolled over the constellation)
        per-cluster counts/sums (masked row reductions)
        centroid + re-anchoring (constellation re-projection)  ->  hhat

entirely on-core, writing only the final [TB, 1] gain.  HBM traffic drops
to one read of y per estimate (vs one per iteration), the iteration loop is
a *rolled* ``lax.fori_loop`` inside the kernel (Mosaic compiles the body
once — compile time no longer scales with ``iters``), and no pallas_call
ever sits in a traced loop, so the M <= 4 gate is gone.

Reference semantics preserved (kmeans.cc:14-84, intended form — see
detect/kmeans.py for the documented quirk divergences, including the
anchor-scale fix: the anchored centroid divides by its OWN constellation
point, not unconditionally by s0): max-|y| init anchored to the
max-modulus point, nearest-cluster assignment with first-minimum ties,
count-0-safe centroid, "max" (or verbatim de-facto "first") anchor
re-projection, empty-anchor keeps the previous gain.

The constellation is baked into the kernel as scalar constants (M <= 64
floats) — no operand, no broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_sublane(
    b: int, nsym: int, m_points: int, budget_bytes: int = 12 << 20
) -> int:
    """Batch-tile height: multiple of 8, sized to VMEM, dividing b if possible.

    Mosaic stack-allocates roughly one [TB, Nsym] f32 temporary per
    unrolled constellation step (measured: the M=64 kernel at TB=256,
    S=384 wanted 23.6 MB of scoped vmem against the 16 MB limit), so the
    budget scales with M: keep (M + 6) live tiles under ~12 MB.

    When no tile divides ``b`` (e.g. b = 100 or 12), pick the in-budget
    tile that MINIMIZES the padding ``ceil(b/t)*t - b`` (smallest tile on
    ties) — ``estimate`` pads the batch up to the next tile multiple and
    slices the result back, and every padded row is wasted k-means
    compute: an earlier fallback returned the LARGEST in-budget tile,
    padding b = 12 up to 256 rows (~20x wasted work on small odd
    batches; the advisor's round-4 finding).  (The original version
    returned ``min(b, 8)`` with an unpadded ``grid = (b // tb,)``, which
    left the last ``b mod tb`` rows of the output UNWRITTEN —
    silently-garbage gains for any batch not divisible by 8.)"""
    per_tile = nsym * 4 * (m_points + 6)
    for t in (256, 128, 64, 32, 16, 8):
        if b % t == 0 and t * per_tile <= budget_bytes:
            return t
    best = 8
    best_pad = None
    for t in (8, 16, 32, 64, 128, 256):
        if t * per_tile > budget_bytes:
            break
        pad = -(-b // t) * t - b
        if best_pad is None or pad < best_pad:
            best, best_pad = t, pad
    return best


def _kmeans_kernel(yr_ref, yi_ref, hr_ref, hi_ref, *,
                   sr: tuple, si: tuple, iters: int, anchor: str,
                   early_exit: bool = True):
    m_points = len(sr)
    s0_r, s0_i = sr[0], si[0]
    s0_norm = s0_r * s0_r + s0_i * s0_i
    # init anchor: max-modulus constellation point for "max" mode (= s_0 on
    # corner-first tables), verbatim s_0 for "first" — see detect/kmeans.py
    # docstring on the reference's unconditional /s_0 scale bug
    mstar = max(range(m_points), key=lambda j: sr[j] * sr[j] + si[j] * si[j])
    init_idx = 0 if anchor == "first" else mstar
    sI_r, sI_i = sr[init_idx], si[init_idx]
    sI_norm = sI_r * sI_r + sI_i * sI_i
    yr = yr_ref[:]  # [TB, S]
    yi = yi_ref[:]
    tb, s = yr.shape

    # --- init: point with max |y| (first index on ties, like argmax) ---
    mag2 = yr * yr + yi * yi
    best0 = jnp.max(mag2, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1)
    pick = jnp.min(jnp.where(mag2 == best0, col, s), axis=1, keepdims=True)
    sel = col == pick
    ymax_r = jnp.sum(jnp.where(sel, yr, 0.0), axis=1)  # [TB]
    ymax_i = jnp.sum(jnp.where(sel, yi, 0.0), axis=1)
    h_r0 = (ymax_r * sI_r + ymax_i * sI_i) / sI_norm
    h_i0 = (ymax_i * sI_r - ymax_r * sI_i) / sI_norm

    def body(_, h):
        h_r, h_i = h  # [TB]
        # assignment: running min over the unrolled constellation; strict <
        # keeps the first minimum (jnp.argmin / std::min_element ties)
        best = jnp.full((tb, s), jnp.inf, jnp.float32)
        bestm = jnp.zeros((tb, s), jnp.int32)
        for m in range(m_points):
            crm = h_r * sr[m] - h_i * si[m]  # [TB]
            cim = h_r * si[m] + h_i * sr[m]
            dre = yr - crm[:, None]
            dim = yi - cim[:, None]
            d = dre * dre + dim * dim
            take = d < best
            best = jnp.where(take, d, best)
            bestm = jnp.where(take, m, bestm)
        # per-cluster statistics: masked row reductions -> [TB, M]
        cnts, sums_r, sums_i = [], [], []
        for m in range(m_points):
            selm = bestm == m
            cnts.append(jnp.sum(selm.astype(jnp.float32), axis=1))
            sums_r.append(jnp.sum(jnp.where(selm, yr, 0.0), axis=1))
            sums_i.append(jnp.sum(jnp.where(selm, yi, 0.0), axis=1))
        counts = jnp.stack(cnts, axis=1)  # [TB, M]
        safe = jnp.maximum(counts, 1.0)
        cent_r = jnp.stack(sums_r, axis=1) / safe
        cent_i = jnp.stack(sums_i, axis=1) / safe
        if anchor == "first":
            a_r, a_i, a_cnt = cent_r[:, 0], cent_i[:, 0], counts[:, 0]
            # de-facto reference: cluster 0 / s_0 (kmeans.cc:65-73)
            sk_r = jnp.full((tb,), s0_r, jnp.float32)
            sk_i = jnp.full((tb,), s0_i, jnp.float32)
        else:
            cmag = jnp.where(counts > 0, cent_r * cent_r + cent_i * cent_i, -1.0)
            cbest = jnp.max(cmag, axis=1, keepdims=True)
            mcol = jax.lax.broadcasted_iota(jnp.int32, (tb, m_points), 1)
            mpick = jnp.min(
                jnp.where(cmag == cbest, mcol, m_points), axis=1, keepdims=True
            )
            msel = mcol == mpick
            a_r = jnp.sum(jnp.where(msel, cent_r, 0.0), axis=1)
            a_i = jnp.sum(jnp.where(msel, cent_i, 0.0), axis=1)
            a_cnt = jnp.sum(jnp.where(msel, counts, 0.0), axis=1)
            # intended semantics: divide the anchored centroid by its OWN
            # constellation point (see detect/kmeans.py).  Select via
            # scalar compares against the picked index — pallas kernels
            # cannot capture constant arrays, and msel[:, m] column
            # extracts are lane-strided in Mosaic (measured: they nearly
            # doubled the kernel's runtime)
            mp = mpick[:, 0]  # [TB] picked cluster index
            sk_r = jnp.zeros((tb,), jnp.float32)
            sk_i = jnp.zeros((tb,), jnp.float32)
            for m in range(m_points):
                sel_m = mp == m
                sk_r = jnp.where(sel_m, sr[m], sk_r)
                sk_i = jnp.where(sel_m, si[m], sk_i)
        # re-projection hhat <- anchor centroid / s_anchor; empty anchor
        # keeps the previous gain (documented divergence)
        sk_norm = sk_r * sk_r + sk_i * sk_i
        new_r = (a_r * sk_r + a_i * sk_i) / sk_norm
        new_i = (a_i * sk_r - a_r * sk_i) / sk_norm
        keep = a_cnt > 0
        return (
            jnp.where(keep, new_r, h_r),
            jnp.where(keep, new_i, h_i),
            bestm,
        )

    if early_exit:
        # Early exit on stable assignments — BIT-identical to running all
        # ``iters`` iterations: the update is a deterministic function of
        # the assignment (the empty-anchor keep path returns the carried
        # gain, which the stability hypothesis already fixes), so once an
        # iteration's assignment equals the previous iteration's, every
        # subsequent iteration reproduces exactly the same gain and
        # assignment.  k-means on a handful of clusters typically
        # stabilizes in ~5 of the reference's fixed 20 iterations, so the
        # tile stops paying for the dead tail (exactness pinned by test;
        # per-tile: the whole tile must stabilize).
        def cond(st):
            i, _, _, _, stable = st
            return jnp.logical_and(i < iters, jnp.logical_not(stable))

        def wbody(st):
            i, h_r, h_i, prev, _ = st
            new_r, new_i, bestm = body(None, (h_r, h_i))
            return i + 1, new_r, new_i, bestm, jnp.all(bestm == prev)

        _, h_r, h_i, _, _ = jax.lax.while_loop(
            cond, wbody,
            (jnp.int32(0), h_r0, h_i0, jnp.full((tb, s), -1, jnp.int32),
             jnp.bool_(False)),
        )
    else:
        def fbody(_, h):
            h_r, h_i = h
            new_r, new_i, _ = body(None, (h_r, h_i))
            return new_r, new_i

        h_r, h_i = jax.lax.fori_loop(0, iters, fbody, (h_r0, h_i0))
    hr_ref[:] = h_r[:, None]
    hi_ref[:] = h_i[:, None]


def make_blind_estimator_pallas(tables, iters: int = 20, anchor: str = "max",
                                early_exit: bool = False):
    """Drop-in for detect.kmeans.make_blind_estimator, Pallas-accelerated.

    ``early_exit`` stops a tile's iteration loop once its assignments
    stabilize — BIT-identical to running all ``iters`` iterations (see
    the kernel comment, exactness pinned by test) but measured a NET LOSS
    on v5e (round 5: QPSK 1,794 -> 3,460 µs/call, 16QAM 1,173 -> 1,390,
    64QAM 4,113 -> 5,487 at B=1024, 15 dB-like inputs): Mosaic pipelines
    the fixed-trip fori_loop better than the while_loop, the [TB, S]
    prev-assignment carry adds per-iteration compare/copy work, and one
    unstable row (low |h| draws exist in every 1024-row batch) keeps its
    whole tile iterating.  Default OFF; kept for future hardware
    re-evaluation (benchmarks/RESULTS.md negative-results section).
    """
    if anchor not in ("max", "first"):
        raise ValueError(f"anchor must be 'max' or 'first', got {anchor!r}")
    sr = tuple(float(v) for v in tables.points_re)
    si = tuple(float(v) for v in tables.points_im)

    def estimate(yr: jnp.ndarray, yi: jnp.ndarray):
        b, nsym = yr.shape
        # +1 live tile for the early-exit prev-assignment carry
        tb = _pick_tile_sublane(b, nsym, len(sr) + (1 if early_exit else 0))
        # Pad the batch up to a tile multiple: the grid must cover every
        # output row.  Zero rows are benign through the whole kernel (the
        # anchor lands on cluster 0 with h = 0, no division by zero) and
        # are sliced off below.
        bp = -(-b // tb) * tb
        yr32 = yr.astype(jnp.float32)
        yi32 = yi.astype(jnp.float32)
        if bp != b:
            pad = ((0, bp - b), (0, 0))
            yr32 = jnp.pad(yr32, pad)
            yi32 = jnp.pad(yi32, pad)
        grid = (bp // tb,)
        kern = functools.partial(
            _kmeans_kernel, sr=sr, si=si, iters=iters, anchor=anchor,
            early_exit=early_exit,
        )
        spec_y = pl.BlockSpec((tb, nsym), lambda i: (i, 0), memory_space=pltpu.VMEM)
        spec_h = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((bp, 1), jnp.float32)
        h_r, h_i = pl.pallas_call(
            kern,
            grid=grid,
            out_shape=(out, out),
            in_specs=[spec_y, spec_y],
            out_specs=(spec_h, spec_h),
        )(yr32, yi32)
        h_r = h_r[:b, 0]
        h_i = h_i[:b, 0]
        # 4 candidates hhat*e^{jk pi/2} = hhat*{1, j, -1, -j}
        # (simulator.cc:146-148)
        h4_r = jnp.stack([h_r, -h_i, -h_r, h_i], axis=1)
        h4_i = jnp.stack([h_i, h_r, -h_i, -h_r], axis=1)
        return h4_r, h4_i

    return estimate
