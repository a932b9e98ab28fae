"""One-tap fading + AWGN channel: y = h·x + (σ/√2)(n_r + j n_i).

Reference semantics (held fixed for statistical parity, BASELINE.md):
* fading gain constant per codeword, h ~ CN(0,1), i.e. Normal()·√0.5 per
  component (simulator.cc:121-123);
* per-component noise std σ/√2 (modemlinearsystem.cc:45);
* var = 10^(-SNR/10) with NO rate / bits-per-symbol normalization
  (simulator.cc:73-74 — normalized form deliberately commented out).

A ``fading=False`` mode pins h = 1 exactly (pure AWGN) for the coherent
baseline configuration; the reference has no such switch (it always draws h)
but with ``true_h_arg`` the decoder sees the exact gain either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fading_awgn_channel(
    key: jax.Array,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    sigma,
    fading: bool = True,
):
    """Apply the channel to a batch of symbol streams.

    xr/xi: [B, Nsym].  Returns (yr, yi, hr, hi) with hr/hi: [B].
    """
    b, nsym = xr.shape
    kh, kn = jax.random.split(key)
    if fading:
        h = jax.random.normal(kh, (b, 2)) * jnp.sqrt(0.5)
        hr, hi = h[:, 0], h[:, 1]
    else:
        hr = jnp.ones((b,), dtype=xr.dtype)
        hi = jnp.zeros((b,), dtype=xr.dtype)
    noise = jax.random.normal(kn, (b, nsym, 2)) * (sigma / jnp.sqrt(2.0))
    yr = hr[:, None] * xr - hi[:, None] * xi + noise[..., 0]
    yi = hr[:, None] * xi + hi[:, None] * xr + noise[..., 1]
    return yr, yi, hr, hi


def partitioned_fading_awgn_channel(
    key: jax.Array,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    sigma,
    num_parts: int,
):
    """Channel with a different gain per contiguous symbol segment.

    The reference's ``PartitionHAWGNSystem`` exposes this API but its inner
    loop bound is broken for more than one partition
    (modemlinearsystem.cc:41-46: ``j < num_of_part`` ignores the segment
    offset) and it is only ever invoked with a single h
    (simulator.cc:127-130).  This implements the *intended* semantics:
    Nsym symbols split into ``num_parts`` equal segments, each scaled by its
    own h ~ CN(0,1).  Returns (yr, yi, hr, hi) with hr/hi: [B, num_parts].
    """
    b, nsym = xr.shape
    if nsym % num_parts != 0:
        raise ValueError(f"{nsym} symbols not divisible into {num_parts} parts")
    seg = nsym // num_parts
    kh, kn = jax.random.split(key)
    h = jax.random.normal(kh, (b, num_parts, 2)) * jnp.sqrt(0.5)
    hr, hi = h[..., 0], h[..., 1]
    hr_sym = jnp.repeat(hr, seg, axis=1)
    hi_sym = jnp.repeat(hi, seg, axis=1)
    noise = jax.random.normal(kn, (b, nsym, 2)) * (sigma / jnp.sqrt(2.0))
    yr = hr_sym * xr - hi_sym * xi + noise[..., 0]
    yi = hr_sym * xi + hi_sym * xr + noise[..., 1]
    return yr, yi, hr, hi
