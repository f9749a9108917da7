"""Solenoid magnet (Chao-style block; reference ``lynx/accelerator/solenoid.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.constants import REST_ENERGY_EV
from lynx_tpu.ops.rmatrix import build_rmatrix, misalignment_matrix, sandwich

Array = jax.Array


class Solenoid(Element):
    """Solenoid magnet (A.W. Chao p. 74).

    :param length: Length in meters.
    :param k: Normalised strength B0/(2*Brho) in 1/m.
    :param misalignment: ``(..., 2)`` x/y misalignment in meters.
    :param name: Unique identifier of the element.
    """

    _data_fields = ("k", "misalignment")

    def __init__(
        self,
        length: Optional[Array] = None,
        k: Optional[Array] = None,
        misalignment: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)
        self.k = (
            jnp.asarray(k, dtype=dtype)
            if k is not None
            else jnp.zeros_like(self.length)
        )
        self.misalignment = (
            jnp.asarray(misalignment, dtype=dtype)
            if misalignment is not None
            else jnp.zeros((*self.length.shape, 2), dtype=dtype)
        )

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=False)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=True)

    def _entries(self, energy: Array):
        energy = jnp.asarray(energy, dtype=self.length.dtype)
        batch_shape = jnp.broadcast_shapes(
            self.length.shape, self.k.shape, energy.shape
        )
        length = jnp.broadcast_to(self.length, batch_shape)
        k = jnp.broadcast_to(self.k, batch_shape)
        energy = jnp.broadcast_to(energy, batch_shape)

        gamma = energy / REST_ENERGY_EV
        c = jnp.cos(length * k)
        s = jnp.sin(length * k)
        k_safe = jnp.where(k == 0, 1.0, k)
        s_k = jnp.where(k == 0, length, s / k_safe)

        gamma_safe = jnp.where(gamma == 0, 1.0, gamma)
        beta2_gamma2 = gamma_safe**2 - 1.0  # beta^2 gamma^2
        r56 = jnp.where(
            gamma == 0, 0.0, -length / jnp.where(beta2_gamma2 == 0, 1.0, beta2_gamma2)
        )
        entries = {
            (0, 0): c**2,
            (0, 1): c * s_k,
            (0, 2): s * c,
            (0, 3): s * s_k,
            (1, 0): -k * s * c,
            (1, 1): c**2,
            (1, 2): -k * s**2,
            (1, 3): s * c,
            (2, 0): -s * c,
            (2, 1): -s * s_k,
            (2, 2): c**2,
            (2, 3): c * s_k,
            (3, 0): k * s**2,
            (3, 1): -s * c,
            (3, 2): -k * s * c,
            (3, 3): c**2,
            (4, 5): r56,
        }
        return entries, batch_shape

    def _transfer_map(self, energy: Array, batch_last: bool) -> Array:
        entries, batch_shape = self._entries(energy)
        R = build_rmatrix(
            entries,
            batch_shape=batch_shape,
            dtype=self.length.dtype,
            batch_last=batch_last,
        )
        R_entry, R_exit = misalignment_matrix(
            self.misalignment, batch_last=batch_last
        )
        return sandwich(R_exit, R, R_entry, batch_last=batch_last)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops import table as tbl

        entries, _ = self._entries(energy)
        T = tbl.entries_to_table(entries)
        mx = self.misalignment[..., 0]
        my = self.misalignment[..., 1]
        entry = tbl.entries_to_table({(0, 6): -mx, (2, 6): -my})
        exit_ = tbl.entries_to_table({(0, 6): mx, (2, 6): my})
        return tbl.compose(exit_, tbl.compose(T, entry))

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape),
            k=jnp.broadcast_to(self.k, shape),
            misalignment=jnp.broadcast_to(self.misalignment, (*shape, 2)),
            name=self.name,
        )

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.k != 0))

    @property
    def is_skippable(self) -> bool:
        return True

    def split(self, resolution: float) -> list[Element]:
        """Equal-``k`` slices compose exactly (the interior misalignment
        exit/entry shifts cancel); unimplemented in the reference
        (``solenoid.py``)."""
        split_elements: list[Element] = []
        remaining = float(jnp.max(self.length))
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            split_elements.append(
                Solenoid(
                    jnp.full_like(self.length, piece),
                    k=self.k,
                    misalignment=self.misalignment,
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
            0.8,
            color="tab:orange",
            alpha=alpha,
            zorder=2,
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "k", "misalignment"]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(length={self.length!r}, "
            f"k={self.k!r}, misalignment={self.misalignment!r}, "
            f"name={self.name!r})"
        )
