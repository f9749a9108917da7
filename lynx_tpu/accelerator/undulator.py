"""Undulator (drift-like placeholder; reference ``lynx/accelerator/undulator.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.ops.rmatrix import build_rmatrix, igamma2_from_energy

Array = jax.Array


class Undulator(Element):
    """Undulator: currently behaves like a drift with r56 = +L/gamma^2.

    :param length: Length in meters.
    :param is_active: Indicates if the undulator is active (no physics effect).
    :param name: Unique identifier of the element.
    """

    _static_fields = ("is_active",)

    def __init__(
        self,
        length: Array,
        is_active: bool = False,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)
        self.is_active = is_active

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=False)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=True)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.rmatrix import igamma2_from_energy
        from lynx_tpu.ops.table import entries_to_table

        energy = jnp.asarray(energy, dtype=self.length.dtype)
        igamma2 = igamma2_from_energy(energy, zero_value=0.0)
        return entries_to_table(
            {
                (0, 1): self.length,
                (2, 3): self.length,
                (4, 5): self.length * igamma2,
            }
        )

    def _transfer_map(self, energy: Array, batch_last: bool) -> Array:
        energy = jnp.asarray(energy, dtype=self.length.dtype)
        batch_shape = jnp.broadcast_shapes(self.length.shape, energy.shape)
        length = jnp.broadcast_to(self.length, batch_shape)
        igamma2 = igamma2_from_energy(
            jnp.broadcast_to(energy, batch_shape), zero_value=0.0
        )
        # NOTE reference sign: +L/gamma^2, without the beta^2 factor
        # (``undulator.py:58``).
        return build_rmatrix(
            {(0, 1): length, (2, 3): length, (4, 5): length * igamma2},
            batch_shape=batch_shape,
            dtype=self.length.dtype,
            batch_last=batch_last,
        )

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape),
            is_active=self.is_active,
            name=self.name,
        )

    @property
    def is_skippable(self) -> bool:
        return True

    def split(self, resolution: float) -> list[Element]:
        """Drift-like map is linear in length, so slices compose exactly;
        unimplemented in the reference (``undulator.py``)."""
        split_elements: list[Element] = []
        remaining = float(jnp.max(self.length))
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            split_elements.append(
                Undulator(
                    jnp.full_like(self.length, piece),
                    is_active=self.is_active,
                )
            )
            remaining -= piece
        return split_elements or [self]

    def plot(self, ax, s: float) -> None:
        from matplotlib.patches import Rectangle

        alpha = 1 if self.is_active else 0.2
        patch = Rectangle(
            (s, 0),
            float(self.length.ravel()[0]),
            0.4,
            color="tab:purple",
            alpha=alpha,
            zorder=2,
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length"]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(length={self.length!r}, "
            f"is_active={self.is_active!r}, name={self.name!r})"
        )
