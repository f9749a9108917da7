"""Drift section (reference behavior: ``lynx/accelerator/drift.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.ops.rmatrix import drift_rmatrix, drift_rmatrix_entries

Array = jax.Array


class Drift(Element):
    """Drift section: linear approximation with r56 = -L / (beta^2 gamma^2).

    :param length: Length in meters.
    :param name: Unique identifier of the element.
    """

    def __init__(
        self,
        length: Array,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)

    def transfer_map(self, energy: Array) -> Array:
        return drift_rmatrix(self.length, energy)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return drift_rmatrix(self.length, energy, batch_last=True)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.table import entries_to_table

        return entries_to_table(drift_rmatrix_entries(self.length, energy))

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape), name=self.name
        )

    @property
    def is_skippable(self) -> bool:
        return True

    def split(self, resolution: float) -> list[Element]:
        split_elements = []
        remaining = float(jnp.max(self.length))
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            split_elements.append(
                Drift(jnp.full_like(self.length, piece))
            )
            remaining -= piece
        return split_elements

    def plot(self, ax, s: float) -> None:
        pass

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length"]

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(length={self.length!r})"
