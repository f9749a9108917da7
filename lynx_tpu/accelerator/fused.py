"""Fused Pallas sweep path: adapters from elements to in-kernel map builders.

Each supported element type contributes a list of ``(B,)`` parameter vectors
and a pure builder ``f(params, energy) -> (7, 7, TILE)`` that reconstructs
its transfer map *inside* the Pallas kernel using the exact same batch-last
builders as the XLA path (``ops/rmatrix.py``) — one numerics codepath, two
execution strategies.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.aperture import Aperture
from lynx_tpu.accelerator.bpm import BPM
from lynx_tpu.accelerator.cavity import Cavity
from lynx_tpu.accelerator.correctors import HorizontalCorrector, VerticalCorrector
from lynx_tpu.accelerator.custom_transfer_map import CustomTransferMap
from lynx_tpu.accelerator.drift import Drift
from lynx_tpu.accelerator.marker import Marker
from lynx_tpu.accelerator.quadrupole import Quadrupole
from lynx_tpu.accelerator.screen import Screen
from lynx_tpu.ops import table as tbl
from lynx_tpu.ops.rmatrix import (
    base_rmatrix_table,
    cavity_rmatrix_entries,
    drift_rmatrix_entries,
)

Array = jax.Array

#: A builder maps (params, energy) -> sparse table (see ``ops/table.py``).
Builder = Tuple[List[Array], Callable[[List[Array], Array], tbl.Table]]


def _build_drift(params, energy):
    return tbl.entries_to_table(drift_rmatrix_entries(params[0], energy))


def _build_quadrupole(params, energy):
    length, k1, tilt, mx, my = params
    T = base_rmatrix_table(length, k1, jnp.zeros_like(length), tilt, energy)
    entry = tbl.entries_to_table({(0, 6): -mx, (2, 6): -my})
    exit_ = tbl.entries_to_table({(0, 6): mx, (2, 6): my})
    return tbl.compose(exit_, tbl.compose(T, entry))


def _build_corrector(kick_row, params, energy):
    length, angle = params
    entries = drift_rmatrix_entries(length, energy)
    entries[(kick_row, 6)] = angle
    return tbl.entries_to_table(entries)


def _build_cavity(params, energy):
    length, voltage, phase, frequency = params
    entries, _, _ = cavity_rmatrix_entries(
        length, voltage, phase, frequency, energy
    )
    return tbl.entries_to_table(entries)


def _build_identity(params, energy):
    return tbl.identity_table()


def _build_custom(params, energy):
    return [[params[i * 7 + j] for j in range(7)] for i in range(7)]


def element_map_builder(element) -> Optional[Builder]:
    """Return (param vectors, in-kernel builder) for a supported element,
    or ``None`` if the element type has no fused builder."""
    if type(element) is Drift:
        return [element.length], _build_drift
    if type(element) is Quadrupole:
        return (
            [
                element.length,
                element.k1,
                element.tilt,
                element.misalignment[..., 0],
                element.misalignment[..., 1],
            ],
            _build_quadrupole,
        )
    if isinstance(element, HorizontalCorrector):
        return [element.length, element.angle], lambda p, E: _build_corrector(1, p, E)
    if isinstance(element, VerticalCorrector):
        return [element.length, element.angle], lambda p, E: _build_corrector(3, p, E)
    if type(element) is Cavity:  # only reached when inactive (skippable)
        return (
            [element.length, element.voltage, element.phase, element.frequency],
            _build_cavity,
        )
    if isinstance(element, (Marker, BPM, Screen, Aperture)):
        return [], _build_identity
    if isinstance(element, CustomTransferMap):
        tm = element._transfer_map
        params = [tm[..., i, j] for i in range(7) for j in range(7)]
        return params, _build_custom
    # Solenoid / Dipole / Undulator: fall back to the XLA path for now (their
    # builders also work batch-last; adapters can be added when profiles
    # demand it).
    return None


def fused_flush_supported(run: list) -> bool:
    return all(element_map_builder(el) is not None for el in run)
