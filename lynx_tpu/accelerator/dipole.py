"""Sector bending magnet with fringe fields.

Reference behavior: ``lynx/accelerator/dipole.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu.accelerator.element import Element
from lynx_tpu.ops.rmatrix import (
    base_rmatrix,
    base_rmatrix_entries,
    build_rmatrix,
    rotation_entries,
    rotation_matrix,
    sandwich,
)

Array = jax.Array


class Dipole(Element):
    """Dipole magnet (by default a sector bend).

    :param length: Length in meters.
    :param angle: Deflection angle in rad.
    :param e1: Inclination of the entrance face in rad.
    :param e2: Inclination of the exit face in rad.
    :param tilt: Tilt in the x-y plane in rad.
    :param fringe_integral: Fringe field integral of the entrance face.
    :param fringe_integral_exit: Fringe field integral of the exit face
        (defaults to the entrance value).
    :param gap: Magnet gap in meters (MAD/ELEGANT HGAP = gap/2).
    :param name: Unique identifier of the element.
    """

    _data_fields = (
        "angle",
        "e1",
        "e2",
        "tilt",
        "fringe_integral",
        "fringe_integral_exit",
        "gap",
    )

    def __init__(
        self,
        length: Array,
        angle: Optional[Array] = None,
        e1: Optional[Array] = None,
        e2: Optional[Array] = None,
        tilt: Optional[Array] = None,
        fringe_integral: Optional[Array] = None,
        fringe_integral_exit: Optional[Array] = None,
        gap: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(name=name, length=length, dtype=dtype)

        def param(value):
            return (
                jnp.asarray(value, dtype=dtype)
                if value is not None
                else jnp.zeros_like(self.length)
            )

        self.angle = param(angle)
        self.gap = param(gap)
        self.tilt = param(tilt)
        self.fringe_integral = param(fringe_integral)
        self.fringe_integral_exit = (
            self.fringe_integral
            if fringe_integral_exit is None
            else jnp.asarray(fringe_integral_exit, dtype=dtype)
        )
        self.e1 = param(e1)
        self.e2 = param(e2)

    @property
    def hx(self) -> Array:
        """Curvature angle/length, 0 for zero-length dipoles
        (reference ``dipole.py:96-102``)."""
        length_safe = jnp.where(self.length == 0, 1.0, self.length)
        return jnp.where(self.length == 0, 0.0, self.angle / length_safe)

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.angle != 0))

    def transfer_map(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=False)

    def transfer_map_batch_last(self, energy: Array) -> Array:
        return self._transfer_map(energy, batch_last=True)

    def transfer_map_table(self, energy: Array):
        from lynx_tpu.ops import table as tbl

        body_entries, batch_shape, _, _ = base_rmatrix_entries(
            length=jnp.where(self.length == 0, 1.0, self.length),
            k1=jnp.zeros_like(self.length),
            hx=self.hx,
            tilt=jnp.zeros_like(self.length),
            energy=energy,
        )
        body = tbl.entries_to_table(body_entries)
        thin = tbl.entries_to_table(
            {(0, 1): self.length, (2, 6): self.angle, (2, 3): self.length}
        )
        zero_length = jnp.broadcast_to(self.length == 0, batch_shape)
        R = tbl.where_table(zero_length, thin, body)

        def edge_table(e, fringe_integral):
            sec_e = 1.0 / jnp.cos(e)
            phi = (
                fringe_integral * self.hx * self.gap * sec_e
                * (1 + jnp.sin(e) ** 2)
            )
            return tbl.entries_to_table(
                {(1, 0): self.hx * jnp.tan(e), (3, 2): -self.hx * jnp.tan(e - phi)}
            )

        R = tbl.compose(
            edge_table(self.e2, self.fringe_integral_exit),
            tbl.compose(R, edge_table(self.e1, self.fringe_integral)),
        )
        rot_fwd = tbl.entries_to_table(rotation_entries(self.tilt))
        rot_bwd = tbl.entries_to_table(rotation_entries(-self.tilt))
        return tbl.compose(rot_bwd, tbl.compose(R, rot_fwd))

    def _transfer_map(self, energy: Array, batch_last: bool) -> Array:
        R_enter = self._edge_map(self.e1, self.fringe_integral, batch_last)
        R_exit = self._edge_map(self.e2, self.fringe_integral_exit, batch_last)

        # The reference picks the thin-corrector branch only when *all* batch
        # entries have zero length (``dipole.py:119-133``); we select
        # per-entry with a where, which also covers mixed batches.
        body = base_rmatrix(
            length=jnp.where(self.length == 0, 1.0, self.length),
            k1=jnp.zeros_like(self.length),
            hx=self.hx,
            tilt=jnp.zeros_like(self.length),
            energy=energy,
            batch_last=batch_last,
        )  # tilt is applied after the edge maps
        batch_shape = body.shape[2:] if batch_last else body.shape[:-2]
        thin = build_rmatrix(
            {
                (0, 1): self.length,
                (2, 6): self.angle,
                (2, 3): self.length,
            },
            batch_shape=batch_shape,
            dtype=body.dtype,
            batch_last=batch_last,
        )
        zero_length = jnp.broadcast_to(self.length == 0, batch_shape)
        is_thin = (
            jnp.broadcast_to(zero_length[None, None, ...], body.shape)
            if batch_last
            else jnp.broadcast_to(zero_length[..., None, None], body.shape)
        )
        R = jnp.where(is_thin, thin, body)

        # Fringe fields, then the tilt rotation sandwich.
        R = sandwich(R_exit, R, R_enter, batch_last=batch_last)
        R = sandwich(
            rotation_matrix(-self.tilt, batch_last=batch_last),
            R,
            rotation_matrix(self.tilt, batch_last=batch_last),
            batch_last=batch_last,
        )
        return R

    def _edge_map(
        self, e: Array, fringe_integral: Array, batch_last: bool = False
    ) -> Array:
        """Thin-wedge fringe map (reference ``dipole.py:143-181``)."""
        sec_e = 1.0 / jnp.cos(e)
        phi = fringe_integral * self.hx * self.gap * sec_e * (1 + jnp.sin(e) ** 2)
        batch_shape = jnp.broadcast_shapes(phi.shape, self.length.shape)
        return build_rmatrix(
            {
                (1, 0): self.hx * jnp.tan(e),
                (3, 2): -self.hx * jnp.tan(e - phi),
            },
            batch_shape=batch_shape,
            dtype=self.length.dtype,
            batch_last=batch_last,
        )

    def broadcast(self, shape: tuple) -> Element:
        return self.__class__(
            length=jnp.broadcast_to(self.length, shape),
            angle=jnp.broadcast_to(self.angle, shape),
            e1=jnp.broadcast_to(self.e1, shape),
            e2=jnp.broadcast_to(self.e2, shape),
            tilt=jnp.broadcast_to(self.tilt, shape),
            fringe_integral=jnp.broadcast_to(self.fringe_integral, shape),
            fringe_integral_exit=jnp.broadcast_to(self.fringe_integral_exit, shape),
            gap=jnp.broadcast_to(self.gap, shape),
            name=self.name,
        )

    def split(self, resolution: float) -> list[Element]:
        """Split into sector-bend slices with the edge fringe maps kept only
        at the true entrance/exit (the reference leaves dipole splitting
        unimplemented, ``dipole.py:196-199`` returns ``[self]``; its
        ``test_split.py`` marks the dipole case xfail)."""
        total = float(jnp.max(self.length))
        if total <= 1e-6:  # zero-length thin kick cannot be split
            return [self]
        pieces = []
        remaining = total
        while remaining > 1e-6:  # ignore sub-micron float residue
            piece = min(float(resolution), remaining)
            pieces.append(piece)
            remaining -= piece
        zero = jnp.zeros_like(self.angle)
        elements: list[Element] = []
        last = len(pieces) - 1
        for i, piece in enumerate(pieces):
            elements.append(
                Dipole(
                    length=jnp.full_like(self.length, piece),
                    angle=self.angle * (piece / total),
                    e1=self.e1 if i == 0 else zero,
                    e2=self.e2 if i == last else zero,
                    tilt=self.tilt,
                    fringe_integral=self.fringe_integral if i == 0 else zero,
                    fringe_integral_exit=(
                        self.fringe_integral_exit if i == last else zero
                    ),
                    gap=self.gap,
                )
            )
        return elements

    def plot(self, ax, s: float) -> None:
        import numpy as np
        from matplotlib.patches import Rectangle

        alpha = 1 if self.is_active else 0.2
        height = 0.8 * (np.sign(float(self.angle.ravel()[0])) if self.is_active else 1)
        patch = Rectangle(
            (s, 0),
            float(self.length.ravel()[0]),
            height,
            color="tab:green",
            alpha=alpha,
            zorder=2,
        )
        ax.add_patch(patch)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "angle",
            "e1",
            "e2",
            "tilt",
            "fringe_integral",
            "fringe_integral_exit",
            "gap",
        ]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(length={self.length!r}, "
            f"angle={self.angle!r}, e1={self.e1!r}, e2={self.e2!r}, "
            f"tilt={self.tilt!r}, fringe_integral={self.fringe_integral!r}, "
            f"fringe_integral_exit={self.fringe_integral_exit!r}, "
            f"gap={self.gap!r}, name={self.name!r})"
        )


class RBend(Dipole):
    """Rectangular bend: a Dipole with e1/e2 shifted by angle/2.

    Reference behavior: ``lynx/accelerator/rbend.py``.
    """

    def __init__(
        self,
        length: Optional[Array],
        angle: Optional[Array] = None,
        e1: Optional[Array] = None,
        e2: Optional[Array] = None,
        tilt: Optional[Array] = None,
        fringe_integral: Optional[Array] = None,
        fringe_integral_exit: Optional[Array] = None,
        gap: Optional[Array] = None,
        name: Optional[str] = None,
        dtype=jnp.float32,
    ) -> None:
        super().__init__(
            length=length,
            angle=angle,
            e1=e1,
            e2=e2,
            tilt=tilt,
            fringe_integral=fringe_integral,
            fringe_integral_exit=fringe_integral_exit,
            gap=gap,
            name=name,
            dtype=dtype,
        )
        self.e1 = self.e1 + self.angle / 2
        self.e2 = self.e2 + self.angle / 2
