"""Gaussian-moment beam representation.

``ParameterBeam`` carries only the first two moments of the phase-space
distribution: mean ``mu (..., 7)`` and covariance ``cov (..., 7, 7)``.
Propagation through a linear map R is ``mu' = R mu``, ``cov' = R cov R^T``.

Reference behavior contract: ``lynx/particles/parameter_beam.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lynx_tpu.particles.beam import Beam

Array = jax.Array


def _common_shape(args: Sequence[Optional[Array]], default: Tuple[int, ...] = (1,)):
    shapes = [jnp.shape(a) for a in args if a is not None]
    return jnp.broadcast_shapes(*shapes) if shapes else default


def _resolve(value, default, shape, dtype) -> Array:
    out = jnp.asarray(default if value is None else value, dtype=dtype)
    return jnp.broadcast_to(out, shape)


class ParameterBeam(Beam):
    """Beam described by its Gaussian moments.

    :param mu: ``(..., 7)`` mean of the distribution.
    :param cov: ``(..., 7, 7)`` covariance of the distribution.
    :param energy: ``(...)`` reference energy in eV.
    :param total_charge: ``(...)`` total bunch charge in C.
    """

    _data_fields = ("_mu", "_cov", "energy", "total_charge")
    _static_fields = ()

    def __init__(
        self,
        mu: Array,
        cov: Array,
        energy: Array,
        total_charge: Optional[Array] = None,
        dtype=None,
    ) -> None:
        self._mu = jnp.asarray(mu, dtype=dtype)
        dtype = self._mu.dtype
        self._cov = jnp.asarray(cov, dtype=dtype)
        self.energy = jnp.asarray(energy, dtype=dtype)
        self.total_charge = jnp.asarray(
            total_charge if total_charge is not None else jnp.zeros_like(self.energy),
            dtype=dtype,
        )

    @classmethod
    def from_parameters(
        cls,
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
        cor_x: Optional[Array] = None,
        cor_y: Optional[Array] = None,
        cor_s: Optional[Array] = None,
        energy: Optional[Array] = None,
        total_charge: Optional[Array] = None,
        dtype=jnp.float32,
    ) -> "ParameterBeam":
        """Assemble moments from the 15 scalar beam parameters.

        Defaults match the reference exactly
        (``lynx/particles/parameter_beam.py:96-113``).
        """
        shape = _common_shape(
            [mu_x, mu_xp, mu_y, mu_yp, sigma_x, sigma_xp, sigma_y, sigma_yp,
             sigma_s, sigma_p, cor_x, cor_y, cor_s, energy, total_charge]
        )
        mu_x = _resolve(mu_x, 0.0, shape, dtype)
        mu_xp = _resolve(mu_xp, 0.0, shape, dtype)
        mu_y = _resolve(mu_y, 0.0, shape, dtype)
        mu_yp = _resolve(mu_yp, 0.0, shape, dtype)
        sigma_x = _resolve(sigma_x, 175e-9, shape, dtype)
        sigma_xp = _resolve(sigma_xp, 2e-7, shape, dtype)
        sigma_y = _resolve(sigma_y, 175e-9, shape, dtype)
        sigma_yp = _resolve(sigma_yp, 2e-7, shape, dtype)
        sigma_s = _resolve(sigma_s, 1e-6, shape, dtype)
        sigma_p = _resolve(sigma_p, 1e-6, shape, dtype)
        cor_x = _resolve(cor_x, 0.0, shape, dtype)
        cor_y = _resolve(cor_y, 0.0, shape, dtype)
        cor_s = _resolve(cor_s, 0.0, shape, dtype)
        energy = _resolve(energy, 1e8, shape, dtype)
        total_charge = _resolve(total_charge, 0.0, shape, dtype)

        zeros = jnp.zeros(shape, dtype=dtype)
        ones = jnp.ones(shape, dtype=dtype)
        mu = jnp.stack([mu_x, mu_xp, mu_y, mu_yp, zeros, zeros, ones], axis=-1)

        cov = jnp.zeros((*shape, 7, 7), dtype=dtype)
        cov = cov.at[..., 0, 0].set(sigma_x**2)
        cov = cov.at[..., 0, 1].set(cor_x)
        cov = cov.at[..., 1, 0].set(cor_x)
        cov = cov.at[..., 1, 1].set(sigma_xp**2)
        cov = cov.at[..., 2, 2].set(sigma_y**2)
        cov = cov.at[..., 2, 3].set(cor_y)
        cov = cov.at[..., 3, 2].set(cor_y)
        cov = cov.at[..., 3, 3].set(sigma_yp**2)
        cov = cov.at[..., 4, 4].set(sigma_s**2)
        cov = cov.at[..., 4, 5].set(cor_s)
        cov = cov.at[..., 5, 4].set(cor_s)
        cov = cov.at[..., 5, 5].set(sigma_p**2)

        return cls(mu=mu, cov=cov, energy=energy, total_charge=total_charge)

    @classmethod
    def from_twiss(
        cls,
        beta_x: Optional[Array] = None,
        alpha_x: Optional[Array] = None,
        emittance_x: Optional[Array] = None,
        beta_y: Optional[Array] = None,
        alpha_y: Optional[Array] = None,
        emittance_y: Optional[Array] = None,
        sigma_s: Optional[Array] = None,
        sigma_p: Optional[Array] = None,
        cor_s: Optional[Array] = None,
        energy: Optional[Array] = None,
        total_charge: Optional[Array] = None,
        dtype=jnp.float32,
    ) -> "ParameterBeam":
        """Moments from twiss parameters: sigma = sqrt(eps*beta), cor = -eps*alpha.

        Reference ``lynx/particles/parameter_beam.py:146-232``.
        """
        shape = _common_shape(
            [beta_x, alpha_x, emittance_x, beta_y, alpha_y, emittance_y,
             sigma_s, sigma_p, cor_s, energy, total_charge]
        )
        beta_x = _resolve(beta_x, 1.0, shape, dtype)
        alpha_x = _resolve(alpha_x, 0.0, shape, dtype)
        emittance_x = _resolve(emittance_x, 7.1971891e-13, shape, dtype)
        beta_y = _resolve(beta_y, 1.0, shape, dtype)
        alpha_y = _resolve(alpha_y, 0.0, shape, dtype)
        emittance_y = _resolve(emittance_y, 7.1971891e-13, shape, dtype)
        sigma_s = _resolve(sigma_s, 1e-6, shape, dtype)
        sigma_p = _resolve(sigma_p, 1e-6, shape, dtype)
        cor_s = _resolve(cor_s, 0.0, shape, dtype)
        energy = _resolve(energy, 1e8, shape, dtype)
        total_charge = _resolve(total_charge, 0.0, shape, dtype)

        sigma_x = jnp.sqrt(emittance_x * beta_x)
        sigma_xp = jnp.sqrt(emittance_x * (1 + alpha_x**2) / beta_x)
        sigma_y = jnp.sqrt(emittance_y * beta_y)
        sigma_yp = jnp.sqrt(emittance_y * (1 + alpha_y**2) / beta_y)
        cor_x = -emittance_x * alpha_x
        cor_y = -emittance_y * alpha_y
        return cls.from_parameters(
            sigma_x=sigma_x,
            sigma_xp=sigma_xp,
            sigma_y=sigma_y,
            sigma_yp=sigma_yp,
            sigma_s=sigma_s,
            sigma_p=sigma_p,
            energy=energy,
            cor_s=cor_s,
            cor_x=cor_x,
            cor_y=cor_y,
            total_charge=total_charge,
            dtype=dtype,
        )

    @classmethod
    def from_ocelot(cls, parray, dtype=jnp.float32) -> "ParameterBeam":
        """Load from an Ocelot ParticleArray (duck-typed: needs ``rparticles``,
        ``E`` and ``q_array``). Reference ``parameter_beam.py:234-253``."""
        import numpy as np

        mu = np.ones(7)
        mu[:6] = parray.rparticles.mean(axis=1)
        cov = np.zeros((7, 7))
        cov[:6, :6] = np.cov(parray.rparticles)
        energy = 1e9 * parray.E
        total_charge = np.sum(parray.q_array)
        return cls(
            mu=jnp.asarray(mu[None], dtype=dtype),
            cov=jnp.asarray(cov[None], dtype=dtype),
            energy=jnp.asarray([energy], dtype=dtype),
            total_charge=jnp.asarray([total_charge], dtype=dtype),
        )

    @classmethod
    def from_astra(cls, path: str, dtype=jnp.float32) -> "ParameterBeam":
        """Load an Astra particle distribution as moments.

        Reference ``parameter_beam.py:255-276``.
        """
        import numpy as np

        from lynx_tpu.converters.astra import from_astrabeam

        particles, energy, particle_charges = from_astrabeam(path)
        mu = np.ones(7)
        mu[:6] = particles.mean(axis=0)
        cov = np.zeros((7, 7))
        cov[:6, :6] = np.cov(particles.transpose())
        total_charge = np.sum(particle_charges)
        return cls(
            mu=jnp.asarray(mu[None], dtype=dtype),
            cov=jnp.asarray(cov[None], dtype=dtype),
            energy=jnp.asarray([energy], dtype=dtype),
            total_charge=jnp.asarray([total_charge], dtype=dtype),
        )

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
    ) -> "ParameterBeam":
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
            dtype=self._mu.dtype,
        )

    # -- statistics --------------------------------------------------------
    @property
    def mu_x(self) -> Array:
        return self._mu[..., 0]

    @property
    def sigma_x(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 0, 0], 1e-20))

    @property
    def mu_xp(self) -> Array:
        return self._mu[..., 1]

    @property
    def sigma_xp(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 1, 1], 1e-20))

    @property
    def mu_y(self) -> Array:
        return self._mu[..., 2]

    @property
    def sigma_y(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 2, 2], 1e-20))

    @property
    def mu_yp(self) -> Array:
        return self._mu[..., 3]

    @property
    def sigma_yp(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 3, 3], 1e-20))

    @property
    def mu_s(self) -> Array:
        return self._mu[..., 4]

    @property
    def sigma_s(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 4, 4], 1e-20))

    @property
    def mu_p(self) -> Array:
        return self._mu[..., 5]

    @property
    def sigma_p(self) -> Array:
        return jnp.sqrt(jnp.maximum(self._cov[..., 5, 5], 1e-20))

    @property
    def sigma_xxp(self) -> Array:
        return self._cov[..., 0, 1]

    @property
    def sigma_yyp(self) -> Array:
        return self._cov[..., 2, 3]

    def broadcast(self, shape: tuple) -> "ParameterBeam":
        """Tile the beam to a larger batch shape (reference
        ``parameter_beam.py:427-433``; implemented as broadcast, not copy)."""
        return self.__class__(
            mu=jnp.broadcast_to(self._mu, (*shape, 7)),
            cov=jnp.broadcast_to(self._cov, (*shape, 7, 7)),
            energy=jnp.broadcast_to(self.energy, shape),
            total_charge=jnp.broadcast_to(self.total_charge, shape),
        )

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(mu_x={self.mu_x!r},"
            f" mu_xp={self.mu_xp!r}, mu_y={self.mu_y!r},"
            f" mu_yp={self.mu_yp!r}, sigma_x={self.sigma_x!r},"
            f" sigma_xp={self.sigma_xp!r}, sigma_y={self.sigma_y!r},"
            f" sigma_yp={self.sigma_yp!r}, sigma_s={self.sigma_s!r},"
            f" sigma_p={self.sigma_p!r}, energy={self.energy!r},"
            f" total_charge={self.total_charge!r})"
        )
