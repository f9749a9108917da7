"""Arbitrary transfer map wrapped as an element.

Reference behavior: ``lynx/accelerator/custom_transfer_map.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element, matmul
from lynx_tpu.particles import Beam

Array = jax.Array


class CustomTransferMap(Element):
    """Element representing an arbitrary fixed ``(..., 7, 7)`` transfer map."""

    _data_fields = ("_transfer_map",)

    def __init__(
        self,
        transfer_map: Array,
        length: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        tm = jnp.asarray(transfer_map, dtype=dtype)
        assert tm.shape[-2:] == (7, 7)
        super().__init__(
            name=name,
            length=(
                length if length is not None else jnp.zeros(tm.shape[:-2])
            ),
            dtype=dtype,
        )
        self._transfer_map = tm

    @classmethod
    def from_merging_elements(
        cls, elements: list[Element], incoming_beam: Beam
    ) -> "CustomTransferMap":
        """Fold consecutive skippable elements into a single matrix.

        The beam is tracked through to obtain the correct per-element
        entrance energy (reference ``custom_transfer_map.py:48-85``).
        """
        assert all(element.is_skippable for element in elements), (
            "Combining the elements in a Segment that is not skippable will"
            " result in incorrect tracking results."
        )
        energy = jnp.asarray(incoming_beam.energy)
        tm = jnp.broadcast_to(
            jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7)
        )
        beam = incoming_beam
        for element in elements:
            tm = matmul(element.transfer_map(beam.energy), tm)
            beam = element.track(beam)

        combined_length = sum(element.length for element in elements)
        combined_name = "combined_" + "_".join(element.name for element in elements)
        return cls(tm, length=combined_length, name=combined_name)

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.table import table_from_batch_first

        return table_from_batch_first(self._transfer_map)

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            jnp.broadcast_to(self._transfer_map, (*shape, 7, 7)),
            length=jnp.broadcast_to(self.length, shape),
            name=self.name,
        )

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["transfer_map"]

    def split(self, resolution: float) -> list[Element]:
        return [self]

    def plot(self, ax, s: float) -> None:
        pass

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(transfer_map={self._transfer_map!r}, "
            f"length={self.length!r}, name={self.name!r})"
        )
