"""Phase-ambiguity resolution: metric evaluation over the 4 ĥ candidates.

Reference: ``KmCodec::{GetMetrics, Metric, GetParityCheck}``
(kmcodec.cc:105-163).  For each candidate ĥ_k the codeword is soft-demapped
with uniform bit priors and a metric is computed:

* soft (``metric_type = true``): run the BP decoder ``metric_iter``
  iterations, metric = Σ_rows log(soft_syndrome) — then |·| is taken and
  the candidate with the *smallest* |metric| wins (kmcodec.cc:147-155 and
  the abs at kmcodec.cc:140).
* hard, classic codec (``metric_type = false``): NO decoding — the
  demapped P(bit=0) is hard-decided with the reference's inverted
  convention (rr = 1 when P0 > 0.5, kmcodec.cc:109-114 — harmless for
  even-degree rows, replicated verbatim) and the metric is the number of
  failed parity checks of rr.
* hard, 5G codec: run the decoder ``metric_iter`` iterations first, then
  count failed checks of the decoder's hard codeword (kmcodec.cc:156-159,
  106-107).

Ties resolve to the first minimum (std::min_element == jnp.argmin).

Inherent ambiguity note (parity-relevant): for QPSK the constellation is
closed under negation with *complemented* labels, and every PEG row has even
degree, so the complement of a codeword is a codeword — the ĥ and -ĥ
candidates produce exactly tied metrics (hard counts identical; soft metrics
identical up to rounding).  Neither the reference nor this implementation
can resolve the 180° ambiguity for QPSK + even-degree codes; both fall back
to first-minimum tie-breaking.  16QAM Gray labeling is not complement-closed
under negation, so all four rotations separate there.

The 4 candidates are folded into the batch dimension, so metric decodes run
as one [4B]-batched decoder call.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..code.ldpc import LDPCCode
from ..decoder.bp import DecoderTables, count_failed_checks
from ..decoder.bp_em import flooding_decode_em as flooding_decode
from ..ops.modem import ModemTables, make_soft_demapper


def make_ambiguity_selector(
    code: LDPCCode,
    tables: ModemTables,
    metric_type: bool,
    metric_iter: int,
    decode=None,
) -> Callable[..., tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Returns ``select(t, yr, yi, h4_r, h4_i, var) -> (hr, hi, metrics)``.

    ``t`` is the code's DecoderTables pytree (runtime argument, see bp.py);
    yr/yi: [B, Nsym]; h4_*: [B, 4] candidates.  Output: the winning
    candidate per codeword ([B] each) and the raw |metric| table [B, 4]
    (used by histogram mode).

    ``decode`` overrides the metric decoder: a callable
    ``decode(t, chan_llr, metric_iter) -> DecodeResult`` where ``t`` is
    whatever table pytree the caller passes to ``select`` (the parity check
    count uses ``t.base`` when present, e.g. MinsumTables).  Default: the
    reference-parity flooding decoder (kmcodec.cc:147-159 runs the same BP
    as the final decode).  The chain passes the layered min-sum decoder
    here under ``[tpu].metric_schedule = "match"`` — an extension: the
    reference has no min-sum at all, so there is no reference behavior to
    diverge from, but the default stays "flooding" to keep blind sweeps
    comparable to the C++ simulator.
    """
    demap = make_soft_demapper(tables)
    needs_decode = metric_type or code.is_5g
    if decode is None:
        decode = lambda t, llr, it: flooding_decode(t, llr, it)

    def select(t, yr, yi, h4_r, h4_i, var):
        """Returns (hr, hi, metrics, llr_best).

        ``llr_best`` is the winning candidate's channel LLRs, reused by the
        caller for the final decode — the reference re-demaps with ĥ*
        (kmcodec.cc:70), which recomputes exactly the winning candidate's
        demap output, so reusing it is value-identical and one demap
        cheaper.
        """
        b, nsym = yr.shape
        # fold candidates into the batch: [B, 4, Nsym] -> [4B, Nsym]
        yr4 = jnp.broadcast_to(yr[:, None, :], (b, 4, nsym)).reshape(b * 4, nsym)
        yi4 = jnp.broadcast_to(yi[:, None, :], (b, 4, nsym)).reshape(b * 4, nsym)
        hr4 = h4_r.reshape(b * 4)
        hi4 = h4_i.reshape(b * 4)
        bit_p0, chan_llr = demap(yr4, yi4, hr4, hi4, var)

        dec_tabs = getattr(t, "base", t)  # MinsumTables carries .base
        if not needs_decode:
            # classic hard metric: inverted hard decision of the demap
            # output, no decoding (kmcodec.cc:109-114).
            rr = (bit_p0 > 0.5).astype(jnp.int8)  # NOTE: P(bit=0) > 0.5 -> 1
            metric = count_failed_checks(dec_tabs, rr).astype(jnp.float32)
        else:
            res = decode(t, chan_llr, metric_iter)
            if metric_type:
                # sum of log soft-syndromes (kmcodec.cc:147-155)
                metric = jnp.sum(jnp.log(res.soft_syndrome), axis=-1)
            else:
                metric = count_failed_checks(dec_tabs, res.cc_hat).astype(jnp.float32)
        metrics = jnp.abs(metric).reshape(b, 4)  # abs: kmcodec.cc:140
        best = jnp.argmin(metrics, axis=1)  # first min, like std::min_element
        oh = jax.nn.one_hot(best, 4, dtype=h4_r.dtype)
        hr = jnp.sum(h4_r * oh, axis=1)
        hi = jnp.sum(h4_i * oh, axis=1)
        # winner's LLRs via a row gather of the folded [4B, n] array — a
        # [B, 4, n] reshape would be a retiling copy on TPU
        rows = jnp.arange(b, dtype=jnp.int32) * 4 + best.astype(jnp.int32)
        llr_best = chan_llr[rows]
        return hr, hi, metrics, llr_best

    return select
