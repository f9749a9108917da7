"""Beam base class: shared derived-statistics math for both representations.

Reference behavior contract: ``lynx/particles/beam.py`` (twiss parameters,
emittances, relativistic factors, ``transformed_to``, ``parameters`` dict and
the ``Beam.empty`` sentinel for fully-lost beams).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lynx_tpu._module import Module
from lynx_tpu.constants import ELECTRON_MASS_EV

Array = jax.Array


class Beam(Module):
    #: Sentinel returned when a beam is entirely lost (reference
    #: ``lynx/particles/beam.py:12``). Elements pass it through unharmed.
    empty = "I'm an empty beam!"

    # -- constructors (implemented by subclasses) --------------------------
    @classmethod
    def from_parameters(cls, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_twiss(cls, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_ocelot(cls, parray, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_astra(cls, path: str, **kwargs) -> "Beam":
        raise NotImplementedError

    def transformed_to(
        self,
        mu_x: Optional[Array] = None,
        mu_xp: Optional[Array] = None,
        mu_y: Optional[Array] = None,
        mu_yp: Optional[Array] = None,
        sigma_x: Optional[Array] = None,
        sigma_xp: Optional[Array] = None,
        sigma_y: Optional[Array] = None,
        sigma_yp: Optional[Array] = None,
        sigma_s: Optional[Array] = None,
        sigma_p: Optional[Array] = None,
        energy: Optional[Array] = None,
        total_charge: Optional[Array] = None,
    ) -> "Beam":
        """Version of this beam transformed to new beam parameters.

        Reference ``lynx/particles/beam.py:91-175``.
        """
        return self.__class__.from_parameters(
            mu_x=mu_x if mu_x is not None else self.mu_x,
            mu_xp=mu_xp if mu_xp is not None else self.mu_xp,
            mu_y=mu_y if mu_y is not None else self.mu_y,
            mu_yp=mu_yp if mu_yp is not None else self.mu_yp,
            sigma_x=sigma_x if sigma_x is not None else self.sigma_x,
            sigma_xp=sigma_xp if sigma_xp is not None else self.sigma_xp,
            sigma_y=sigma_y if sigma_y is not None else self.sigma_y,
            sigma_yp=sigma_yp if sigma_yp is not None else self.sigma_yp,
            sigma_s=sigma_s if sigma_s is not None else self.sigma_s,
            sigma_p=sigma_p if sigma_p is not None else self.sigma_p,
            energy=energy if energy is not None else self.energy,
            total_charge=(
                total_charge if total_charge is not None else self.total_charge
            ),
        )

    @property
    def parameters(self) -> dict:
        return {
            "mu_x": self.mu_x,
            "mu_xp": self.mu_xp,
            "mu_y": self.mu_y,
            "mu_yp": self.mu_yp,
            "sigma_x": self.sigma_x,
            "sigma_xp": self.sigma_xp,
            "sigma_y": self.sigma_y,
            "sigma_yp": self.sigma_yp,
            "sigma_s": self.sigma_s,
            "sigma_p": self.sigma_p,
            "energy": self.energy,
        }

    # -- relativistics -----------------------------------------------------
    @property
    def relativistic_gamma(self) -> Array:
        return self.energy / ELECTRON_MASS_EV

    @property
    def relativistic_beta(self) -> Array:
        gamma = self.relativistic_gamma
        gamma_safe = jnp.where(jnp.abs(gamma) > 0, gamma, 1.0)
        return jnp.where(
            jnp.abs(gamma) > 0, jnp.sqrt(1.0 - 1.0 / gamma_safe**2), 1.0
        )

    # -- twiss / emittance -------------------------------------------------
    @property
    def emittance_x(self) -> Array:
        """Geometric emittance in x in m*rad (clamped to dtype tiny)."""
        return jnp.sqrt(
            jnp.maximum(
                self.sigma_x**2 * self.sigma_xp**2 - self.sigma_xxp**2,
                jnp.finfo(jnp.asarray(self.sigma_x).dtype).tiny,
            )
        )

    @property
    def normalized_emittance_x(self) -> Array:
        return self.emittance_x * self.relativistic_beta * self.relativistic_gamma

    @property
    def beta_x(self) -> Array:
        return self.sigma_x**2 / self.emittance_x

    @property
    def alpha_x(self) -> Array:
        return -self.sigma_xxp / self.emittance_x

    @property
    def emittance_y(self) -> Array:
        return jnp.sqrt(
            jnp.maximum(
                self.sigma_y**2 * self.sigma_yp**2 - self.sigma_yyp**2,
                jnp.finfo(jnp.asarray(self.sigma_y).dtype).tiny,
            )
        )

    @property
    def normalized_emittance_y(self) -> Array:
        return self.emittance_y * self.relativistic_beta * self.relativistic_gamma

    @property
    def beta_y(self) -> Array:
        return self.sigma_y**2 / self.emittance_y

    @property
    def alpha_y(self) -> Array:
        return -self.sigma_yyp / self.emittance_y

    def broadcast(self, shape: tuple) -> "Beam":
        raise NotImplementedError

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(mu_x={self.mu_x}, mu_xp={self.mu_xp},"
            f" mu_y={self.mu_y}, mu_yp={self.mu_yp}, sigma_x={self.sigma_x},"
            f" sigma_xp={self.sigma_xp}, sigma_y={self.sigma_y},"
            f" sigma_yp={self.sigma_yp}, sigma_s={self.sigma_s},"
            f" sigma_p={self.sigma_p}, energy={self.energy},"
            f" total_charge={self.total_charge})"
        )
