"""Thin-kick corrector magnets.

Reference behavior: ``lynx/accelerator/horizontal_corrector.py`` and
``lynx/accelerator/vertical_corrector.py`` — a drift with a thin kick applied
via the affine (7th) column.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.ops.rmatrix import build_rmatrix, igamma2_from_energy, _safe_div

Array = jax.Array


class _Corrector(Element):
    """Shared implementation; the kick lands on row ``_kick_row``."""

    _data_fields = ("angle",)
    _kick_row: int = 1

    def __init__(
        self,
        length: Array,
        angle: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)
        self.angle = (
            jnp.asarray(angle, dtype=dtype)
            if angle is not None
            else jnp.zeros_like(self.length)
        )

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=False)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=True)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.rmatrix import drift_rmatrix_entries
        from lynx_tpu.ops.table import entries_to_table

        entries = drift_rmatrix_entries(self.length, energy)
        entries[(self._kick_row, 6)] = self.angle
        return entries_to_table(entries)

    def _transfer_map(self, energy: Array, batch_last: bool) -> Array:
        energy = jnp.asarray(energy, dtype=self.length.dtype)
        batch_shape = jnp.broadcast_shapes(
            self.length.shape, self.angle.shape, energy.shape
        )
        length = jnp.broadcast_to(self.length, batch_shape)
        igamma2 = igamma2_from_energy(
            jnp.broadcast_to(energy, batch_shape), zero_value=0.0
        )
        beta2 = 1.0 - igamma2
        r56 = -length * _safe_div(igamma2, beta2, fallback=0.0)
        return build_rmatrix(
            {
                (0, 1): length,
                (self._kick_row, 6): jnp.broadcast_to(self.angle, batch_shape),
                (2, 3): length,
                (4, 5): r56,
            },
            batch_shape=batch_shape,
            dtype=self.length.dtype,
            batch_last=batch_last,
        )

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape),
            angle=jnp.broadcast_to(self.angle, shape),
            name=self.name,
        )

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.angle != 0))

    def split(self, resolution: float) -> list[Element]:
        split_elements = []
        total = float(jnp.max(self.length))
        remaining = total
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            length = jnp.full_like(self.length, piece)
            split_elements.append(
                self.__class__(length, self.angle * piece / total)
            )
            remaining -= piece
        return split_elements

    def plot(self, ax, s: float) -> None:
        import numpy as np
        from matplotlib.patches import Rectangle

        alpha = 1 if self.is_active else 0.2
        height = 0.8 * (np.sign(float(self.angle.ravel()[0])) if self.is_active else 1)
        patch = Rectangle(
            (s, 0),
            float(self.length.ravel()[0]),
            height,
            color=self._plot_color,
            alpha=alpha,
            zorder=2,
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "angle"]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(length={self.length!r}, "
            f"angle={self.angle!r}, name={self.name!r})"
        )


class HorizontalCorrector(_Corrector):
    """Horizontal corrector: drift + thin kick x' += angle
    (reference ``horizontal_corrector.py:52-67``)."""

    _kick_row = 1
    _plot_color = "tab:blue"


class VerticalCorrector(_Corrector):
    """Vertical corrector: drift + thin kick y' += angle
    (reference ``vertical_corrector.py:52-66``)."""

    _kick_row = 3
    _plot_color = "tab:cyan"
