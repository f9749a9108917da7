"""Parameterized FODO lattice factory.

The reference's long-lattice benchmark (``docs/examples/optimize_speed.ipynb``:
[HCor, D, VCor, D] + 150 x [Q, D, Q, D, M, Q, D] + [HCor, D, VCor, D]
= 1058 elements, quads L=0.1 k1=+/-4.2, cell drifts L=0.2, steerer drifts
L=0.3) as a reusable model, plus a plain FODO cell for docs/tests.  These
are the "long element chain" stress model (SURVEY.md §5 long-axis row)
complementing the bundled ARES lattice.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from lynx_tpu.accelerator import (
    Drift,
    HorizontalCorrector,
    Marker,
    Quadrupole,
    Segment,
    VerticalCorrector,
)

__all__ = ["fodo_cell", "fodo_lattice"]


def fodo_cell(
    k1: float = 4.2,
    quad_length: float = 0.1,
    drift_length: float = 0.2,
    name: str = "fodo",
    dtype=jnp.float32,
) -> Segment:
    """One focusing-drift-defocusing-drift cell (plus the inert marker and
    off quadrupole of the reference benchmark's cell structure)."""
    arr = lambda v: jnp.array([v], dtype=dtype)
    return Segment(
        [
            Quadrupole(arr(quad_length), k1=arr(k1), name=f"{name}_qf"),
            Drift(arr(drift_length), name=f"{name}_d1"),
            Quadrupole(arr(quad_length), k1=arr(-k1), name=f"{name}_qd"),
            Drift(arr(drift_length), name=f"{name}_d2"),
            Marker(name=f"{name}_m"),
            Quadrupole(arr(quad_length), k1=arr(0.0), name=f"{name}_qo"),
            Drift(arr(drift_length), name=f"{name}_d3"),
        ],
        name=name,
    )


def _steerer_block(prefix: str, dtype) -> list:
    arr = lambda v: jnp.array([v], dtype=dtype)
    return [
        HorizontalCorrector(arr(0.1), angle=arr(0.0), name=f"HCOR_{prefix}"),
        Drift(arr(0.3), name=f"d_hcor_{prefix}"),
        VerticalCorrector(arr(0.1), angle=arr(0.0), name=f"VCOR_{prefix}"),
        Drift(arr(0.3), name=f"d_vcor_{prefix}"),
    ]


def fodo_lattice(
    num_cells: int = 150,
    k1: float = 4.2,
    with_steerers: bool = True,
    name: Optional[str] = None,
    dtype=jnp.float32,
) -> Segment:
    """``num_cells`` FODO cells flattened into one segment, bracketed by the
    reference benchmark's steerer blocks (corrector + drift pairs at BOTH
    ends) — 1058 elements at the default 150 cells."""
    elements = []
    if with_steerers:
        elements += _steerer_block("1", dtype)
    for cell in range(num_cells):
        elements += fodo_cell(k1=k1, name=f"c{cell}", dtype=dtype).elements
    if with_steerers:
        elements += _steerer_block("2", dtype)
    return Segment(elements, name=name or f"fodo_{num_cells}")
