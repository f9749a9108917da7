"""Pallas TPU kernel: fused build + fold + apply for batched moment tracking.

The vectorized settings sweep (the RL workload) tracks a ``ParameterBeam``
through a run of linear elements for B different magnet settings at once.
Under plain XLA this materializes ~L intermediate ``(7, 7, B)`` matrices in
HBM (one per element, plus fold partials) — at B = 100k that's dozens of
~20 MB round-trips and the sweep runs ~30x off the bandwidth roofline.

This kernel fuses the whole pipeline over batch tiles: element parameters
stream in as ``(TILE,)`` vectors, every 7x7 map is *built in VMEM* (reusing
the exact ``batch_last=True`` builders from ``ops/rmatrix.py`` — same math,
same numerics), composed on the fly, and applied to the mu/cov tiles.  HBM
traffic collapses to the parameters in and the moments in/out.

The kernel is generated per run structure (a static list of element
builders); jit caching then keys on that structure like everything else.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lynx_tpu.ops import table as tbl

Array = jax.Array

#: Default batch-tile width. 8 sublanes x 128 lanes = 1024 f32 elements per
#: vreg row; 2048 keeps live table cells comfortably in VMEM.
TILE = 2048


def _pick_tile(batch: int) -> int:
    """Fixed tile: measured throughput-equal to larger tiles (210 vs 205
    M env-steps/s at batch 1e6), and long lattices' live tables must fit the
    16 MB VMEM (a 13-element kernel OOMs at tile 16384)."""
    return TILE


def _kernel(
    build_fns: List[Callable],
    n_params: List[int],
    *refs,
):
    """Kernel body: refs = [param_0 ... param_{P-1}, energy, mu, cov, out_mu, out_cov].

    Maps live as sparse *tables* of (TILE,) vectors (see ``ops/table.py``) —
    Mosaic cannot stack/contract the tiny 7-dims, and the tables skip
    structural zeros at trace time anyway.
    """
    num_elements = len(build_fns)
    total_params = sum(n_params)
    param_refs = refs[:total_params]
    energy_ref = refs[total_params]
    mu_ref = refs[total_params + 1]
    cov_ref = refs[total_params + 2]
    out_mu_ref = refs[total_params + 3]
    out_cov_ref = refs[total_params + 4]

    energy = energy_ref[...]
    dtype = energy.dtype

    # Build and left-compose tables sequentially: total = R_{L-1} ... R_0.
    total = None
    offset = 0
    for index in range(num_elements):
        params = [param_refs[offset + k][...] for k in range(n_params[index])]
        offset += n_params[index]
        T = build_fns[index](params, energy)
        total = T if total is None else tbl.compose(T, total)

    mu_cells = [mu_ref[i, :] for i in range(7)]
    out_mu = tbl.matvec(total, mu_cells)
    cov_table = [[cov_ref[i, j, :] for j in range(7)] for i in range(7)]
    out_cov = tbl.cov_sandwich(total, cov_table)

    for i in range(7):
        out_mu_ref[i, :] = tbl.broadcast_cell(out_mu[i], energy.shape, dtype)
        for j in range(7):
            out_cov_ref[i, j, :] = tbl.broadcast_cell(
                out_cov[i][j], energy.shape, dtype
            )


def _table_reference_sweep(build_fns, n_params, flat_params, energy, mu, cov):
    """Pure-XLA implementation of the fused sweep (same math, same builders,
    no pallas) — the differentiable reference used by the custom VJP."""
    element_params = []
    offset = 0
    for count in n_params:
        element_params.append(list(flat_params[offset : offset + count]))
        offset += count
    total = None
    for build, params in zip(build_fns, element_params):
        T = build(params, energy)
        total = T if total is None else tbl.compose(T, total)
    mu_cells = [mu[:, i] for i in range(7)]
    out_mu_cells = tbl.matvec(total, mu_cells)
    cov_table = [[cov[:, i, j] for j in range(7)] for i in range(7)]
    out_cov_table = tbl.cov_sandwich(total, cov_table)
    B = energy.shape[0]
    dtype = mu.dtype
    out_mu = jnp.stack(
        [tbl.broadcast_cell(c, (B,), dtype) for c in out_mu_cells], axis=-1
    )
    out_cov = jnp.stack(
        [
            jnp.stack(
                [tbl.broadcast_cell(c, (B,), dtype) for c in row], axis=-1
            )
            for row in out_cov_table
        ],
        axis=-2,
    )
    return out_mu, out_cov


def fused_moment_sweep(
    build_fns: List[Callable],
    element_params: List[List[Array]],
    energy: Array,
    mu: Array,
    cov: Array,
) -> Tuple[Array, Array]:
    """Differentiable fused sweep: forward runs the Pallas kernel; the
    backward pass (``pallas_call`` has no automatic VJP) differentiates the
    mathematically-identical XLA table implementation at the same inputs —
    so ``jax.grad`` of large-batch tuning losses works transparently.
    """
    n_params = tuple(len(params) for params in element_params)
    flat_params = tuple(p for params in element_params for p in params)

    @jax.custom_vjp
    def sweep(flat_params, energy, mu, cov):
        element_params = []
        offset = 0
        for count in n_params:
            element_params.append(list(flat_params[offset : offset + count]))
            offset += count
        return _fused_moment_sweep_impl(
            build_fns, element_params, energy, mu, cov
        )

    def fwd(flat_params, energy, mu, cov):
        return sweep(flat_params, energy, mu, cov), (flat_params, energy, mu, cov)

    def bwd(residuals, cotangents):
        flat_params, energy, mu, cov = residuals
        _, vjp = jax.vjp(
            lambda fp, e, m, c: _table_reference_sweep(
                build_fns, n_params, fp, e, m, c
            ),
            flat_params,
            energy,
            mu,
            cov,
        )
        return vjp(cotangents)

    sweep.defvjp(fwd, bwd)
    return sweep(flat_params, energy, mu, cov)


def _fused_moment_sweep_impl(
    build_fns: List[Callable],
    element_params: List[List[Array]],
    energy: Array,
    mu: Array,
    cov: Array,
) -> Tuple[Array, Array]:
    """Run the fused build+fold+apply kernel over a flat batch.

    :param build_fns: per-element ``f(params_list, energy) -> (7, 7, TILE)``
        map builders (must produce batch-last maps; see ``ops/rmatrix.py``).
    :param element_params: per-element list of ``(B,)`` parameter arrays.
    :param energy: ``(B,)`` beam energy.
    :param mu: ``(B, 7)`` moment means.
    :param cov: ``(B, 7, 7)`` covariances.
    :return: ``(mu', cov')`` with the same layouts as the inputs.
    """
    B = energy.shape[0]
    tile = _pick_tile(B)
    dtype = mu.dtype
    # One dtype end-to-end (ref writes require exact dtype match).
    energy = energy.astype(dtype)
    cov = cov.astype(dtype)
    element_params = [
        [p.astype(dtype) for p in params] for params in element_params
    ]
    if B % tile != 0:
        pad = tile - B % tile
        element_params = [
            [jnp.pad(p, (0, pad)) for p in params] for params in element_params
        ]
        energy = jnp.pad(energy, (0, pad), constant_values=1.0)
        mu = jnp.pad(mu, ((0, pad), (0, 0)))
        cov = jnp.pad(cov, ((0, pad), (0, 0), (0, 0)))
    padded = energy.shape[0]
    grid = padded // tile

    # Batch-last inputs for lane-aligned access.
    mu_bl = jnp.moveaxis(mu, 0, -1)  # (7, padded)
    cov_bl = jnp.moveaxis(cov, 0, -1)  # (7, 7, padded)

    flat_params = [p for params in element_params for p in params]
    n_params = [len(params) for params in element_params]

    vec_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((7, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cov_spec = pl.BlockSpec(
        (7, 7, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )

    out_mu_bl, out_cov_bl = pl.pallas_call(
        partial(_kernel, build_fns, n_params),
        grid=(grid,),
        in_specs=[vec_spec] * len(flat_params) + [vec_spec, mu_spec, cov_spec],
        out_specs=(mu_spec, cov_spec),
        out_shape=(
            jax.ShapeDtypeStruct((7, padded), dtype),
            jax.ShapeDtypeStruct((7, 7, padded), dtype),
        ),
    )(*flat_params, energy, mu_bl, cov_bl)

    out_mu = jnp.moveaxis(out_mu_bl, -1, 0)[:B]
    out_cov = jnp.moveaxis(out_cov_bl, -1, 0)[:B]
    return out_mu, out_cov


#: Particle-tile width for the particle-sweep kernel.
PARTICLE_TILE = 2048


def _particle_kernel(build_fns, n_params, *refs):
    """Per-setting particle push: one grid row per setting, particles on
    lanes.  Scalar-prefetch refs hold the full (B,) parameter arrays in SMEM
    (indexed by the setting's program_id); tensor refs are the particle tile.
    """
    total_params = sum(n_params)
    scalar_refs = refs[:total_params + 1]
    particles_ref = refs[total_params + 1]
    out_ref = refs[total_params + 2]

    b = pl.program_id(0)
    energy = scalar_refs[total_params][b]

    total = None
    offset = 0
    for index, build in enumerate(build_fns):
        params = [scalar_refs[offset + k][b] for k in range(n_params[index])]
        offset += n_params[index]
        T = build(params, energy)
        total = T if total is None else tbl.compose(T, total)

    coords = [particles_ref[0, j, :] for j in range(7)]
    for i in range(7):
        acc = None
        for j in range(7):
            cell = total[i][j]
            if isinstance(cell, float):
                if cell == 0.0:
                    continue
                term = coords[j] if cell == 1.0 else cell * coords[j]
            else:
                term = cell * coords[j]
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(coords[0])
        out_ref[0, i, :] = acc


def fused_particle_sweep(
    build_fns: List[Callable],
    element_params: List[List[Array]],
    energy: Array,
    particles: Array,
) -> Array:
    """Track ``(B, N, 7)`` particles through a linear run for B settings.

    One kernel: per-setting maps are built from scalar parameters inside the
    kernel (scalar-prefetched SMEM arrays indexed by the grid's setting id)
    and applied to particle tiles with the 7 coordinates on sublanes and
    particles on lanes — no ``(B, 7, 7)`` maps and no padded-to-128
    coordinate axis ever touch HBM.
    """
    B, N, _ = particles.shape
    dtype = particles.dtype
    energy = energy.astype(dtype)
    element_params = [
        [p.astype(dtype) for p in params] for params in element_params
    ]

    tile_n = min(PARTICLE_TILE, N)
    pad_n = (tile_n - N % tile_n) % tile_n
    particles_t = jnp.moveaxis(particles, -1, -2)  # (B, 7, N)
    if pad_n:
        particles_t = jnp.pad(particles_t, ((0, 0), (0, 0), (0, pad_n)))
    padded_n = N + pad_n

    flat_params = [p for params in element_params for p in params]
    n_params = [len(params) for params in element_params]

    tile_spec = pl.BlockSpec(
        (1, 7, tile_n), lambda b, n, *scalars: (b, 0, n),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(flat_params) + 1,
        grid=(B, padded_n // tile_n),
        in_specs=[tile_spec],
        out_specs=tile_spec,
    )

    out_t = pl.pallas_call(
        partial(_particle_kernel, build_fns, n_params),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 7, padded_n), dtype),
    )(*flat_params, energy, particles_t)

    return jnp.moveaxis(out_t[:, :, :N], -2, -1)
