"""Marker / monitor no-op element (reference ``lynx/accelerator/marker.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.particles import Beam

Array = jax.Array


class Marker(Element):
    """General marker: identity map, passes the beam through unchanged.

    :param name: Unique identifier of the element.
    """

    def __init__(self, name: Optional[str] = None) -> None:
        super().__init__(name=name)

    def transfer_map(self, energy: Array) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7))


    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.table import identity_table

        return identity_table()

    def track(self, incoming: Beam) -> Beam:
        return incoming

    def broadcast(self, shape: tuple) -> Element:
        new_marker = self.__class__(name=self.name)
        new_marker.length = jnp.broadcast_to(self.length, shape)
        return new_marker

    @property
    def is_skippable(self) -> bool:
        return True

    def split(self, resolution: float) -> list[Element]:
        return [self]

    def plot(self, ax, s: float) -> None:
        pass

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(name={self.name!r})"
