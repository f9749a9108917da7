"""Deterministic generator for a synthetic ASTRA beam fixture.

The reference test suite loads an ACHIP beam distribution file that is not
distributable (see SURVEY.md §4: the fixture is absent from the mount, with
its golden moments fully specified in the reference's
``tests/test_astra_import.py:12-23``).  This module generates a statistically
equivalent beam: trace-space samples are standardized to hit the golden
moments, then the ASTRA coordinate transformation (the inverse of
``lynx_tpu.converters.astra.from_astrabeam``) is inverted to write a valid
ASTRA text file.  Generation is deterministic (fixed seed) so tests never
need a large binary blob in the repository.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lynx_tpu.constants import ELECTRON_MASS_EV

# Golden values from the reference's test suite.
N_PARTICLES = 100_000
ENERGY_EV = 107_315_902.44394557
TOTAL_CHARGE_C = 5e-13
SIGMA = {
    "x": 1.7489789752e-4,
    "xp": 3.6794021e-6,
    "y": 1.788330571e-4,
    "yp": 3.7540553e-6,
    "s": 8.0115523815e-6,
    "p": 2.2804534e-3,
}
MU = {"x": 8.24955e-7, "xp": 5.9885e-8, "y": -1.7276e-6, "yp": -1.1746e-7}
# Mild phase-space correlations so twiss parameters are non-trivial.
COR = {"x": -0.3, "y": -0.35, "s": 0.1}  # correlation coefficients


def generate(path: Path, n: int = N_PARTICLES, seed: int = 314159) -> Path:
    rng = np.random.default_rng(seed)

    def correlated_pair(sigma_a, sigma_b, rho, mu_a=0.0, mu_b=0.0):
        z = rng.standard_normal((2, n))
        # Standardize exactly, then apply the correlation and moments.
        z = (z - z.mean(axis=1, keepdims=True)) / z.std(axis=1, ddof=1, keepdims=True)
        # Orthogonalize second row against first for an exact sample rho.
        z1 = z[0]
        z2 = z[1] - (z[1] @ z1) / (z1 @ z1) * z1
        z2 = (z2 - z2.mean()) / z2.std(ddof=1)
        b = rho * z1 + np.sqrt(1 - rho**2) * z2
        return mu_a + sigma_a * z1, mu_b + sigma_b * b

    x, xp = correlated_pair(SIGMA["x"], SIGMA["xp"], COR["x"], MU["x"], MU["xp"])
    y, yp = correlated_pair(SIGMA["y"], SIGMA["yp"], COR["y"], MU["y"], MU["yp"])
    s, p = correlated_pair(SIGMA["s"], SIGMA["p"], COR["s"])

    # Invert the trace-space -> ASTRA transformation.
    gamma_ref = ENERGY_EV / ELECTRON_MASS_EV
    beta_ref = np.sqrt(1 - gamma_ref**-2)
    p_ref = np.sqrt(gamma_ref**2 - 1) * ELECTRON_MASS_EV  # eV/c

    px = xp * p_ref
    py = yp * p_ref
    gamma = gamma_ref * (1 + beta_ref * p)
    u_norm = np.sqrt(gamma**2 - 1) * ELECTRON_MASS_EV
    pz = np.sqrt(np.maximum(u_norm**2 - px**2 - py**2, 0.0))
    beta = np.sqrt(1 - gamma**-2)
    uz_unit = pz / u_norm
    z = -s * beta * uz_unit
    x_astra = x - beta * (px / u_norm) * s
    y_astra = y - beta * (py / u_norm) * s

    # Reference particle: first row, z and pz absolute; others relative.
    # The reader zeroes row 0's z and pz, so the written row-0 phase space is
    # replaced by (0, p_ref); make row 0 the reference exactly.
    out = np.zeros((n, 10))
    out[:, 0] = x_astra
    out[:, 1] = y_astra
    out[:, 2] = z
    out[:, 3] = px
    out[:, 4] = py
    out[:, 5] = pz - p_ref
    out[0, 2] = 0.0  # absolute z of reference
    out[0, 5] = p_ref  # absolute pz of reference
    out[:, 6] = 0.0  # clock time
    out[:, 7] = -TOTAL_CHARGE_C / n * 1e9  # charge in nC (negative: electrons)
    out[:, 8] = 1  # species index
    out[:, 9] = 5  # status: alive

    path.parent.mkdir(parents=True, exist_ok=True)
    np.savetxt(path, out, fmt="%.12e")
    return path


def ensure_fixture(directory: Path) -> Path:
    """Generate the fixture file if it does not exist yet; return its path."""
    path = Path(directory) / "ACHIP_EA1_2021.1351.001"
    if not path.exists():
        generate(path)
    return path


if __name__ == "__main__":
    print(ensure_fixture(Path(__file__).parent))
