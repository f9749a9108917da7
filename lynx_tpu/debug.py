"""Debugging and validation utilities.

The reference has no sanitizer story (SURVEY.md §5); in JAX, data races are
impossible by construction, so the debugging surface is numerical: NaN
provenance and physical-consistency checks on beams.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

from lynx_tpu.particles import Beam, ParameterBeam, ParticleBeam


@contextmanager
def nan_debug():
    """Context manager enabling ``jax_debug_nans`` — any NaN produced inside
    jitted tracking raises immediately at the producing op."""
    previous = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", previous)


def validate_beam(beam: Beam, *, name: str = "beam") -> None:
    """Raise ``ValueError`` on non-finite or unphysical beam state.

    Checks: finite moments/particles, positive energy, PSD-diagonal
    covariance (ParameterBeam), survival weights in [0, 1] (ParticleBeam).
    """
    if beam is Beam.empty:
        return
    problems = []

    def check(condition: bool, message: str) -> None:
        if not condition:
            problems.append(message)

    energy = jnp.asarray(beam.energy)
    check(bool(jnp.all(jnp.isfinite(energy))), "non-finite energy")
    check(bool(jnp.all(energy >= 0)), "negative energy")

    if isinstance(beam, ParameterBeam):
        check(bool(jnp.all(jnp.isfinite(beam._mu))), "non-finite mu")
        check(bool(jnp.all(jnp.isfinite(beam._cov))), "non-finite cov")
        diag = jnp.diagonal(beam._cov, axis1=-2, axis2=-1)
        check(bool(jnp.all(diag >= -1e-12)), "negative covariance diagonal")
    elif isinstance(beam, ParticleBeam):
        check(
            bool(jnp.all(jnp.isfinite(beam.particles))), "non-finite particles"
        )
        if beam.survival is not None:
            check(
                bool(
                    jnp.all((beam.survival >= 0) & (beam.survival <= 1))
                ),
                "survival weights outside [0, 1]",
            )

    if problems:
        raise ValueError(f"Invalid {name}: " + "; ".join(problems))
