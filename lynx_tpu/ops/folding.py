"""Composition of transfer-map chains.

The hot loop of lattice tracking is composing a run of ``(..., 7, 7)``
transfer maps into a single matrix (reference ``lynx/accelerator/
segment.py:329-338`` does this with a sequential Python loop).  On TPU we
fold the stacked maps with a balanced binary tree: ``ceil(log2(L))`` *batched*
matmuls instead of ``L`` sequential ones, which both shrinks the XLA graph
for long lattices (1000+ elements) and exposes batch parallelism to the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def fold_transfer_maps(maps: Array) -> Array:
    """Compose stacked maps in application order.

    :param maps: ``(L, ..., 7, 7)`` array where ``maps[0]`` is applied first.
    :return: ``(..., 7, 7)`` composition ``maps[L-1] @ ... @ maps[0]``.
    """
    if maps.ndim < 3:
        raise ValueError(f"Expected (L, ..., 7, 7) maps, got shape {maps.shape}")
    while maps.shape[0] > 1:
        n = maps.shape[0]
        even = n - (n % 2)
        paired = jnp.matmul(maps[1:even:2], maps[0:even:2])
        if n % 2:
            maps = jnp.concatenate([paired, maps[-1:]], axis=0)
        else:
            maps = paired
    return maps[0]
