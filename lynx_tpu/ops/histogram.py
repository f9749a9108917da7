"""Weighted 2-D histogram for diagnostic screens.

The reference computes screen images with ``histogramdd`` on CPU per batch
sample (reference ``lynx/accelerator/screen.py:195-211``).  Here we bin with
a single fused scatter-add under ``jit``: uniform-bin index arithmetic plus
``.at[].add`` — vectorizable over batch dims and differentiable w.r.t. the
weights.  An extra overflow slot absorbs out-of-range particles and dead
(zero-weight) particles, which keeps shapes static under masking semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def weighted_histogram_2d(
    x: Array,
    y: Array,
    weights: Array,
    x_range: Tuple[Array, Array],
    y_range: Tuple[Array, Array],
    bins: Tuple[int, int],
) -> Array:
    """Histogram of shape ``(bins_x, bins_y)`` over the leading dims of x/y.

    Bin edge semantics match ``numpy.histogram2d`` with uniform edges: values
    on interior edges fall into the right bin; the last bin is closed.

    :param x, y: ``(..., N)`` coordinates.
    :param weights: ``(..., N)`` per-particle weights (0 for dead particles).
    :param x_range, y_range: (lo, hi) scalars.
    :param bins: (nx, ny) static bin counts.
    :return: ``(..., nx, ny)`` weighted histogram.
    """
    nx, ny = int(bins[0]), int(bins[1])
    x_lo, x_hi = x_range
    y_lo, y_hi = y_range

    def index(v, lo, hi, n):
        scaled = (v - lo) / (hi - lo) * n
        idx = jnp.floor(scaled).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n - 1)
        valid = (v >= lo) & (v <= hi)
        return idx, valid

    ix, vx = index(x, x_lo, x_hi, nx)
    iy, vy = index(y, y_lo, y_hi, ny)
    valid = vx & vy
    flat = jnp.where(valid, ix * ny + iy, nx * ny)  # overflow slot nx*ny

    def hist_1(flat_idx, w):
        out = jnp.zeros((nx * ny + 1,), dtype=w.dtype)
        out = out.at[flat_idx].add(w)
        return out[: nx * ny].reshape(nx, ny)

    batch_shape = flat.shape[:-1]
    if batch_shape:
        flat2 = flat.reshape(-1, flat.shape[-1])
        w2 = jnp.broadcast_to(weights, flat.shape).reshape(-1, flat.shape[-1])
        out = jax.vmap(hist_1)(flat2, w2)
        return out.reshape(*batch_shape, nx, ny)
    return hist_1(flat, jnp.broadcast_to(weights, flat.shape))
