"""Quadrupole magnet (reference behavior: ``lynx/accelerator/quadrupole.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.ops.rmatrix import (
    base_rmatrix,
    base_rmatrix_table,
    misalignment_matrix,
    sandwich,
)

Array = jax.Array


class Quadrupole(Element):
    """Quadrupole magnet.

    :param length: Length in meters.
    :param k1: Strength of the quadrupole in 1/m^2.
    :param misalignment: ``(..., 2)`` misalignment in x/y in meters.
    :param tilt: Tilt in the x-y plane in rad (pi/4 for a skew quadrupole).
    :param name: Unique identifier of the element.
    """

    _data_fields = ("k1", "misalignment", "tilt")

    def __init__(
        self,
        length: Array,
        k1: Optional[Array] = None,
        misalignment: Optional[Array] = None,
        tilt: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)
        self.k1 = (
            jnp.asarray(k1, dtype=dtype)
            if k1 is not None
            else jnp.zeros_like(self.length)
        )
        self.misalignment = (
            jnp.asarray(misalignment, dtype=dtype)
            if misalignment is not None
            else jnp.zeros((*self.length.shape, 2), dtype=dtype)
        )
        self.tilt = (
            jnp.asarray(tilt, dtype=dtype)
            if tilt is not None
            else jnp.zeros_like(self.length)
        )

    def _transfer_map(self, energy: Array, batch_last: bool) -> Array:
        R = base_rmatrix(
            length=self.length,
            k1=self.k1,
            hx=jnp.zeros_like(self.length),
            tilt=self.tilt,
            energy=energy,
            batch_last=batch_last,
        )
        # Misalignment sandwich R_exit @ R @ R_entry; exact identity when the
        # misalignment is zero, so applied unconditionally (branch-free).
        R_entry, R_exit = misalignment_matrix(
            self.misalignment, batch_last=batch_last
        )
        return sandwich(R_exit, R, R_entry, batch_last=batch_last)

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=False)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=True)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops import table as tbl

        T = base_rmatrix_table(
            self.length, self.k1, jnp.zeros_like(self.length), self.tilt, energy
        )
        mx = self.misalignment[..., 0]
        my = self.misalignment[..., 1]
        entry = tbl.entries_to_table({(0, 6): -mx, (2, 6): -my})
        exit_ = tbl.entries_to_table({(0, 6): mx, (2, 6): my})
        return tbl.compose(exit_, tbl.compose(T, entry))

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape),
            k1=jnp.broadcast_to(self.k1, shape),
            misalignment=jnp.broadcast_to(self.misalignment, (*shape, 2)),
            tilt=jnp.broadcast_to(self.tilt, shape),
            name=self.name,
        )

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.k1 != 0))

    def split(self, resolution: float) -> list[Element]:
        split_elements = []
        remaining = float(jnp.max(self.length))
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            split_elements.append(
                Quadrupole(
                    jnp.full_like(self.length, piece),
                    self.k1,
                    misalignment=self.misalignment,
                    tilt=self.tilt,
                )
            )
            remaining -= piece
        return split_elements

    def plot(self, ax, s: float) -> None:
        import numpy as np
        from matplotlib.patches import Rectangle

        alpha = 1 if self.is_active else 0.2
        height = 0.8 * (np.sign(float(self.k1.ravel()[0])) if self.is_active else 1)
        patch = Rectangle(
            (s, 0),
            float(self.length.ravel()[0]),
            height,
            color="tab:red",
            alpha=alpha,
            zorder=2,
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "k1", "misalignment", "tilt"]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(length={self.length!r}, "
            f"k1={self.k1!r}, misalignment={self.misalignment!r}, "
            f"tilt={self.tilt!r}, name={self.name!r})"
        )
