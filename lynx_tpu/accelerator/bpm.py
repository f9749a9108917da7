"""Beam position monitor (reference ``lynx/accelerator/bpm.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.particles import Beam, ParameterBeam, ParticleBeam

Array = jax.Array


def bpm_reading(beam: Beam) -> Array:
    """Stacked ``[mu_x, mu_y]`` reading (reference ``bpm.py:48-58``)."""
    return jnp.stack([beam.mu_x, beam.mu_y])


class BPM(Element):
    """Beam position monitor: records ``[mu_x, mu_y]`` and passes the beam on.

    :param is_active: If ``True`` the BPM records the beam position on track.
    :param name: Unique identifier of the element.
    """

    _static_fields = ("is_active",)

    # Non-pytree diagnostic state (class-level default for unflattened copies).
    reading = None

    def __init__(self, is_active: bool = False, name: Optional[str] = None) -> None:
        super().__init__(name=name)
        self.is_active = is_active
        self.reading = None

    @property
    def is_skippable(self) -> bool:
        return not self.is_active

    def transfer_map(self, energy: Array) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7))


    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops.table import identity_table

        return identity_table()

    def track(self, incoming: Beam) -> Beam:
        if incoming is Beam.empty:
            self.reading = None
        elif isinstance(incoming, (ParameterBeam, ParticleBeam)):
            reading = bpm_reading(incoming)
            if not isinstance(reading, jax.core.Tracer):
                self.reading = reading
            elif self.is_active:
                # Same deviation as Screen.track (docs/deviations.md §8):
                # stateful readings cannot be written under tracing.
                import warnings

                warnings.warn(
                    f"BPM {self.name!r} was tracked with traced values"
                    " (inside jit/vmap/grad): the stateful '.reading'"
                    " cannot be updated. Use lynx_tpu.functional.track's"
                    " diagnostics output instead (docs/deviations.md §8).",
                    stacklevel=2,
                )
        else:
            raise TypeError(f"Parameter incoming is of invalid type {type(incoming)}")
        return incoming

    def broadcast(self, shape: tuple) -> Element:
        new_bpm = self.__class__(is_active=self.is_active, name=self.name)
        new_bpm.length = jnp.broadcast_to(self.length, shape)
        return new_bpm

    def split(self, resolution: float) -> list[Element]:
        return [self]

    def plot(self, ax, s: float) -> None:
        from matplotlib.patches import Rectangle

        alpha = 1 if self.is_active else 0.2
        patch = Rectangle(
            (s, -0.3), 0, 0.3 * 2, color="darkkhaki", alpha=alpha, zorder=2
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(name={self.name!r})"
