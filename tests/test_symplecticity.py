"""Symplecticity and Jacobian-consistency oracles.

Linear transfer maps of static (energy-preserving) elements must preserve
the symplectic form — an exact, parameter-free invariant that cross-checks
every dispersion entry and beta-factor placement in ``base_rmatrix``
(reference ``lynx/track_methods.py:37-105``) without any shared code or
golden numbers.

Convention note: in the trace space ``(x, x', y, y', s, p)`` used by the
reference (``lynx/accelerator/element.py:38-54``) the longitudinal pair
``(s, p)`` is canonically conjugate with the OPPOSITE orientation to the
transverse pairs (the dispersion rows carry ``+sx*hx``/``+dx`` where the
transverse-orientation form would require the negatives — inherited from
Ocelot/Cheetah).  The invariant form is therefore

    J = blockdiag([[0,1],[-1,0]], [[0,1],[-1,0]], [[0,-1],[1,0]])

and every static element satisfies ``R^T J R = J`` to machine epsilon in
float64 — fringe fields, tilts and misalignments included.

The Cavity (the one energy-changing element) has no such invariant, but its
two independent implementations must agree: the Jacobian of the nonlinear
per-particle map at the reference orbit equals ``_cavity_rmatrix`` exactly
in rows 0-4 and in r66, and in r65 up to the exact factor beta_0^2 (the
nonlinear phase update differentiates ``cos(-s*beta_0*k + phi)``, while the
Rosenzweig–Serafini matrix entry carries no beta_0 — reference
``lynx/accelerator/cavity.py:134-161`` vs ``:309``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lynx_tpu as lt
from lynx_tpu.constants import ELECTRON_MASS_EV

F64 = jnp.float64

# Symplectic form with the reference's longitudinal orientation (see module
# docstring).
J_FORM = np.zeros((6, 6))
J_FORM[0, 1] = J_FORM[2, 3] = 1.0
J_FORM[1, 0] = J_FORM[3, 2] = -1.0
J_FORM[4, 5] = -1.0
J_FORM[5, 4] = 1.0

ENERGIES = (2e6, 1e8, 1e10)  # beta = 0.97 .. 1-5e-9


def _arr(value) -> jnp.ndarray:
    return jnp.array([value], dtype=F64)


def _symplectic_defect(element, energy_ev: float) -> float:
    """Max-entry defect of R^T J R - J, scaled by the map's own magnitude
    (strong-focusing maps carry cosh-type entries ~1e2, so the float64
    roundoff floor of the triple product scales with ||R||^2)."""
    R = np.asarray(element.transfer_map(_arr(energy_ev))[0])[:6, :6]
    scale = max(1.0, float(np.abs(R).max()) ** 2)
    return float(np.abs(R.T @ J_FORM @ R - J_FORM).max()) / scale


def _random_static_elements(rng: np.random.RandomState):
    """A representative draw of every static element at random settings."""
    return [
        lt.Drift(_arr(rng.uniform(0.01, 5.0)), dtype=F64),
        lt.Quadrupole(
            _arr(rng.uniform(0.05, 1.0)),
            k1=_arr(rng.uniform(-30.0, 30.0)),
            tilt=_arr(rng.uniform(-np.pi, np.pi)),
            dtype=F64,
        ),
        lt.Quadrupole(
            _arr(rng.uniform(0.05, 1.0)),
            k1=_arr(rng.uniform(-30.0, 30.0)),
            misalignment=jnp.array(
                [rng.uniform(-1e-3, 1e-3, size=2)], dtype=F64
            ),
            dtype=F64,
        ),
        lt.Dipole(
            length=_arr(rng.uniform(0.05, 2.0)),
            angle=_arr(rng.uniform(-0.6, 0.6)),
            dtype=F64,
        ),
        lt.Dipole(
            length=_arr(rng.uniform(0.05, 2.0)),
            angle=_arr(rng.uniform(-0.6, 0.6)),
            e1=_arr(rng.uniform(-0.2, 0.2)),
            e2=_arr(rng.uniform(-0.2, 0.2)),
            fringe_integral=_arr(rng.uniform(0.0, 0.8)),
            gap=_arr(rng.uniform(0.0, 0.05)),
            tilt=_arr(rng.uniform(-np.pi, np.pi)),
            dtype=F64,
        ),
        lt.RBend(
            length=_arr(rng.uniform(0.05, 2.0)),
            angle=_arr(rng.uniform(-0.6, 0.6)),
            dtype=F64,
        ),
        lt.Solenoid(
            length=_arr(rng.uniform(0.05, 2.0)),
            k=_arr(rng.uniform(-10.0, 10.0)),
            dtype=F64,
        ),
        lt.Undulator(_arr(rng.uniform(0.05, 2.0)), dtype=F64),
        lt.HorizontalCorrector(
            _arr(rng.uniform(0.0, 0.3)),
            angle=_arr(rng.uniform(-2e-3, 2e-3)),
            dtype=F64,
        ),
        lt.VerticalCorrector(
            _arr(rng.uniform(0.0, 0.3)),
            angle=_arr(rng.uniform(-2e-3, 2e-3)),
            dtype=F64,
        ),
    ]


@pytest.mark.parametrize("energy_ev", ENERGIES)
def test_static_elements_symplectic_fuzz(energy_ev):
    rng = np.random.RandomState(int(energy_ev % 97) + 7)
    for _ in range(8):
        for element in _random_static_elements(rng):
            defect = _symplectic_defect(element, energy_ev)
            assert defect < 1e-13, (
                f"{type(element).__name__} map violates the symplectic form"
                f" by {defect:.3e} at E={energy_ev:.1e} eV: {element!r}"
            )


def test_segment_product_symplectic():
    """A composed lattice map (FODO cell with bends and a tilted quad) stays
    symplectic — the matmul chain introduces no defect."""
    rng = np.random.RandomState(3)
    cell = lt.Segment(
        [
            lt.Drift(_arr(0.4), dtype=F64),
            lt.Quadrupole(_arr(0.2), k1=_arr(8.3), tilt=_arr(0.11), dtype=F64),
            lt.Drift(_arr(0.3), dtype=F64),
            lt.Dipole(
                length=_arr(0.6),
                angle=_arr(0.21),
                e1=_arr(0.05),
                fringe_integral=_arr(0.45),
                gap=_arr(0.02),
                dtype=F64,
            ),
            lt.Drift(_arr(0.3), dtype=F64),
            lt.Quadrupole(_arr(0.2), k1=_arr(-7.9), dtype=F64),
            lt.Solenoid(length=_arr(0.25), k=_arr(2.2), dtype=F64),
        ]
    )
    defect = _symplectic_defect(cell, 1.5e8)
    assert defect < 1e-12, f"segment map symplectic defect {defect:.3e}"
    del rng


@pytest.mark.parametrize(
    "energy_ev,voltage,phase_deg",
    [
        (6e6, 18.15975e6, 0.0),
        (6e6, 18.15975e6, 30.0),
        (2e7, 5e6, -45.0),
        (1e8, 3e7, 10.0),
    ],
)
def test_cavity_particle_jacobian_matches_rmatrix(energy_ev, voltage, phase_deg):
    """The Jacobian of the nonlinear particle path at the reference orbit
    reproduces ``_cavity_rmatrix`` — two independent implementations of the
    same physics (matrix assembly vs per-particle update) must agree.  Rows
    0-4 and r66 match exactly; r65 matches up to the exact beta_0^2 factor
    documented in the module docstring."""
    cavity = lt.Cavity(
        length=_arr(1.0377),
        voltage=_arr(voltage),
        phase=_arr(phase_deg),
        frequency=_arr(1.3e9),
        dtype=F64,
    )
    energy = _arr(energy_ev)

    def particle_map(x6):
        p = jnp.concatenate([x6, jnp.ones((1,), F64)])[None, None, :]
        beam = lt.ParticleBeam(
            particles=p,
            energy=energy,
            particle_charges=jnp.ones((1, 1), F64),
        )
        return cavity.track(beam).particles[0, 0, :6]

    jac = np.asarray(jax.jacobian(particle_map)(jnp.zeros((6,), F64)))
    R = np.asarray(cavity.transfer_map(energy)[0])[:6, :6]

    np.testing.assert_allclose(jac[:5], R[:5], rtol=0, atol=1e-12)
    np.testing.assert_allclose(jac[5, 5], R[5, 5], rtol=1e-12)
    np.testing.assert_allclose(jac[5, :4], R[5, :4], rtol=0, atol=1e-12)

    gamma0 = energy_ev / ELECTRON_MASS_EV
    beta0_sq = 1.0 - 1.0 / gamma0**2
    if phase_deg == 0.0:
        # r65 ∝ sin(phi) vanishes at on-crest phase — both paths agree on 0.
        np.testing.assert_allclose(jac[5, 4], 0.0, atol=1e-12)
        np.testing.assert_allclose(R[5, 4], 0.0, atol=1e-12)
    else:
        np.testing.assert_allclose(jac[5, 4], beta0_sq * R[5, 4], rtol=1e-12)


def test_inactive_cavity_jacobian_is_symplectic_drift():
    """With voltage 0 the cavity must degrade to a symplectic (drift) map."""
    cavity = lt.Cavity(
        length=_arr(1.0377),
        voltage=_arr(0.0),
        phase=_arr(30.0),
        frequency=_arr(1.3e9),
        dtype=F64,
    )
    defect = _symplectic_defect(cavity, 6e6)
    assert defect < 1e-12
