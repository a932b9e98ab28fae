"""Layered normalized min-sum LDPC decoder (LLR domain), batched.

The reference implements only flooding sum-product; layered min-sum is the
industry-standard schedule for 5G-NR LDPC (SURVEY.md section 7 step 3 calls
for it, and driver config #3 requires it).  Design:

* Posterior LLRs ``L[col]`` live as a dense [B, num_col] array; check-to-
  variable messages ``c2v[e]`` as [B, E].
* One iteration sweeps the layers sequentially (``lax.scan`` over the layer
  axis); within a layer all rows update in parallel:
      v2c   = L[col] - c2v_old           (gather)
      c2v'  = alpha * sign-excl * min-excl(|v2c|)   (min1/min2 trick)
      L    += c2v' - c2v_old             (scatter-add)
* For lifted (QC) codes the natural layer is one block-row of Z rows; the
  QC structure guarantees each column is touched at most once per layer, so
  the scatter is conflict-free.  For unstructured codes (PEG) layers are
  consecutive row groups; column conflicts within a layer superimpose
  additively — still a valid message-passing schedule (partial flooding),
  converging slightly slower than a conflict-free layering.
* Early termination mirrors the flooding decoder: hard decision from L,
  syndrome check after each full sweep, per-codeword freezing, while_loop
  exit when the whole batch converged.

All addressing reuses the static tables compiled in code/ldpc.py.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..code.ldpc import LDPCCode
from .bp import DecodeResult, DecoderTables, channel_llr_to_columns


def _layer_tables(code: LDPCCode, layer_size: int):
    """Per-layer padded row tables: [n_layers, layer_size * drm]."""
    n_layers = (code.num_row + layer_size - 1) // layer_size
    drm = code.dr_max
    e = code.num_edges
    pad_rows = n_layers * layer_size - code.num_row
    row_edge_idx = np.concatenate(
        [code.row_edge_idx, np.full((pad_rows, drm), e, np.int32)], axis=0
    )
    row_edge_col = np.concatenate(
        [code.row_edge_col, np.full((pad_rows, drm), code.num_col, np.int32)], axis=0
    )
    row_mask = np.concatenate(
        [code.row_mask, np.zeros((pad_rows, drm), bool)], axis=0
    )
    shape = (n_layers, layer_size, drm)
    return (
        jnp.asarray(row_edge_idx.reshape(shape)),
        jnp.asarray(row_edge_col.reshape(shape)),
        jnp.asarray(row_mask.reshape(shape).astype(np.float32)),
    )


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MinsumTables:
    """Layered-schedule tables — a pytree passed as a runtime argument (the
    layer arrays are as big as the edge set; see DecoderTables on why they
    must not become traced constants)."""

    base: DecoderTables
    l_edge_idx: jnp.ndarray  # [n_layers, ls, drm] int32
    l_edge_col: jnp.ndarray  # [n_layers, ls, drm] int32
    l_mask: jnp.ndarray  # [n_layers, ls, drm] f32


def minsum_tables(code: LDPCCode, layer_size: int | None = None) -> MinsumTables:
    """``layer_size`` defaults to the lifting factor Z for 5G codes
    (conflict-free block-row layers) and to ``num_row`` (pure flooding
    min-sum) for unstructured codes."""
    if layer_size is None:
        layer_size = code.lifting_factor if code.is_5g else code.num_row
    l_edge_idx, l_edge_col, l_mask = _layer_tables(code, layer_size)
    return MinsumTables(
        base=DecoderTables.from_code(code),
        l_edge_idx=l_edge_idx, l_edge_col=l_edge_col, l_mask=l_mask,
    )


def layered_minsum_decode(
    mt: MinsumTables, chan_llr: jnp.ndarray, iter_count: int, alpha: float = 0.75
) -> DecodeResult:
    """Layered min-sum decode; ``mt`` is a pytree argument.

    Edge-major internally: posterior LLRs live as [num_col+1, B] and c2v
    messages as [num_edges+1, B] (one pad row each), so every per-layer
    gather and scatter moves contiguous batch rows — the same layout
    argument as decoder/bp_em.py, measured ~4x faster per sweep than the
    batch-major [B, E] formulation it replaces.
    """
    t = mt.base
    l_edge_idx, l_edge_col, l_mask = mt.l_edge_idx, mt.l_edge_col, mt.l_mask
    n_layers, ls, drm = l_edge_idx.shape
    llr_clip = jnp.float32(constants.LLR_CLIP)
    alpha = jnp.float32(alpha)
    big = jnp.float32(1e30)
    b = chan_llr.shape[0]
    # row-major -> slot-major column index of each row slot (syndrome check)
    row_col_sm = t.row_edge_col.T.reshape(-1)  # [drm*nr], num_col = pad

    def sweep(carry, layer):
        post_pad, c2v_pad = carry  # [nc+1, B], [E+1, B]
        edge_idx, edge_col, mask = layer  # [ls, drm] each
        idx_flat = edge_idx.reshape(-1)
        col_flat = edge_col.reshape(-1)
        old = c2v_pad[idx_flat].reshape(ls, drm, b)
        v2c = post_pad[col_flat].reshape(ls, drm, b) - old
        mask3 = mask[:, :, None]
        mag = jnp.abs(v2c)
        mag_m = jnp.where(mask3 > 0, mag, big)
        # min1/min2 exclusion over the row (drm) axis
        min1 = jnp.min(mag_m, axis=1, keepdims=True)
        arg1 = jnp.argmin(mag_m, axis=1)  # [ls, B]
        onehot = jax.nn.one_hot(arg1, drm, dtype=mag_m.dtype, axis=1)
        min2 = jnp.min(mag_m + onehot * big, axis=1, keepdims=True)
        excl_min = jnp.where(onehot > 0, min2, min1)
        sign = jnp.where(v2c < 0, -1.0, 1.0)
        sign = jnp.where(mask3 > 0, sign, 1.0)
        sign_prod = jnp.prod(sign, axis=1, keepdims=True)
        new = alpha * sign_prod * sign * jnp.minimum(excl_min, llr_clip)
        new = new * mask3
        delta = (new - old) * mask3
        # scatter: posterior[col] += delta; c2v[edge] = new (row scatters;
        # pad slots hit the pad rows, which are re-zeroed by `set` and
        # ignored by downstream gathers)
        post_pad = post_pad.at[col_flat].add(delta.reshape(-1, b))
        c2v_pad = c2v_pad.at[idx_flat].set(new.reshape(-1, b))
        return (post_pad, c2v_pad), None

    llr_col = channel_llr_to_columns(t, chan_llr.astype(jnp.float32))
    post0 = jnp.concatenate([llr_col.T, jnp.zeros((1, b), jnp.float32)], axis=0)
    c2v0 = jnp.zeros((t.num_edges + 1, b), jnp.float32)
    cc0 = jnp.zeros((t.num_col, b), jnp.int8)
    conv0 = jnp.zeros((b,), bool)
    iters0 = jnp.zeros((b,), jnp.int32)
    ss0 = jnp.ones((b, t.num_row), jnp.float32)

    def syndrome_ok(hard):
        hard_pad = jnp.concatenate([hard, jnp.zeros((1, b), jnp.int8)], axis=0)
        hard_edge = hard_pad[row_col_sm].reshape(drm, t.num_row, b)
        parity = jnp.sum(hard_edge.astype(jnp.int32), axis=0) % 2
        return jnp.all(parity == 0, axis=0)

    def cond(state):
        i, _, _, _, conv, _ = state
        return jnp.logical_and(i < iter_count, ~jnp.all(conv))

    def body(state):
        i, post, c2v, cc_hat, conv, iters = state
        (post_new, c2v_new), _ = jax.lax.scan(
            sweep, (post, c2v), (l_edge_idx, l_edge_col, l_mask)
        )
        # pad row of the posterior must stay 0 (scatter-adds accumulate there)
        post_new = post_new.at[-1].set(0.0)
        hard = (post_new[:-1] <= 0).astype(jnp.int8)
        cc_hat = jnp.where(conv[None, :], cc_hat, hard)
        ok = syndrome_ok(cc_hat)
        iters = iters + (~conv).astype(jnp.int32)
        conv_after = conv | ok
        post = jnp.where(conv_after[None, :], post, post_new)
        c2v = jnp.where(conv_after[None, :], c2v, c2v_new)
        return i + 1, post, c2v, cc_hat, conv_after, iters

    state = (jnp.int32(0), post0, c2v0, cc0, conv0, iters0)
    _, _, _, cc_hat, conv, iters = jax.lax.while_loop(cond, body, state)
    uu_hat = jax.lax.dynamic_slice_in_dim(cc_hat, t.info_start, t.code_dim, 0)
    return DecodeResult(uu_hat.T, cc_hat.T, conv, iters, ss0)


_jitted_minsum = jax.jit(layered_minsum_decode, static_argnums=(2, 3))


def make_layered_minsum_decoder(
    code: LDPCCode,
    alpha: float = 0.75,
    layer_size: int | None = None,
) -> Callable[[jnp.ndarray, int], DecodeResult]:
    """Standalone decoder bound to one code's tables (test use)."""
    mt = minsum_tables(code, layer_size)

    def decode(chan_llr: jnp.ndarray, iter_count: int) -> DecodeResult:
        return _jitted_minsum(mt, chan_llr, iter_count, alpha)

    decode.tables = mt  # type: ignore[attr-defined]
    return decode
