"""Public-API parity contract vs the reference (jank324/lynx / Cheetah).

The parameter names below were extracted from the reference's constructor
signatures (``lynx/accelerator/*.py`` ``__init__``s and
``lynx/particles/*.py`` classmethods, minus torch's ``device``/``dtype``
factory kwargs, plus our explicit PRNG ``key`` where the reference used
implicit global randomness).  A reference user's keyword-argument calls must
work unchanged.
"""

import inspect

import lynx_tpu as lt

ELEMENT_SIGNATURES = {
    # reference lynx/accelerator/drift.py:36
    "Drift": {"length", "name"},
    # quadrupole.py:42
    "Quadrupole": {"length", "k1", "misalignment", "tilt", "name"},
    # dipole.py:45
    "Dipole": {
        "length", "angle", "e1", "e2", "tilt",
        "fringe_integral", "fringe_integral_exit", "gap", "name",
    },
    # rbend.py:44
    "RBend": {
        "length", "angle", "e1", "e2", "tilt",
        "fringe_integral", "fringe_integral_exit", "gap", "name",
    },
    # cavity.py:41
    "Cavity": {"length", "voltage", "phase", "frequency", "name"},
    # solenoid.py:40
    "Solenoid": {"length", "k", "misalignment", "name"},
    # undulator.py:36
    "Undulator": {"length", "is_active", "name"},
    # horizontal_corrector.py:38 / vertical_corrector.py:38
    "HorizontalCorrector": {"length", "angle", "name"},
    "VerticalCorrector": {"length", "angle", "name"},
    # aperture.py:40
    "Aperture": {"x_max", "y_max", "shape", "is_active", "name"},
    # bpm.py:29
    "BPM": {"is_active", "name"},
    # screen.py:54
    "Screen": {
        "resolution", "pixel_size", "binning", "misalignment",
        "is_active", "name",
    },
    # marker.py:24
    "Marker": {"name"},
    # custom_transfer_map.py:27
    "CustomTransferMap": {"transfer_map", "length", "name"},
    # segment.py:40
    "Segment": {"elements", "name"},
}

BEAM_CLASSMETHODS = {
    "ParameterBeam": {
        # parameter_beam.py:47
        "from_parameters": {
            "mu_x", "mu_xp", "mu_y", "mu_yp", "sigma_x", "sigma_xp",
            "sigma_y", "sigma_yp", "sigma_s", "sigma_p",
            "cor_x", "cor_y", "cor_s", "energy", "total_charge",
        },
        # parameter_beam.py:146
        "from_twiss": {
            "beta_x", "alpha_x", "emittance_x", "beta_y", "alpha_y",
            "emittance_y", "energy", "sigma_s", "sigma_p", "cor_s",
            "total_charge",
        },
    },
    "ParticleBeam": {
        # particle_beam.py:47
        "from_parameters": {
            "num_particles", "mu_x", "mu_y", "mu_xp", "mu_yp",
            "sigma_x", "sigma_y", "sigma_xp", "sigma_yp", "sigma_s",
            "sigma_p", "cor_x", "cor_y", "cor_s", "energy", "total_charge",
        },
        # particle_beam.py:180
        "from_twiss": {
            "num_particles", "beta_x", "alpha_x", "emittance_x",
            "beta_y", "alpha_y", "emittance_y", "energy", "sigma_s",
            "sigma_p", "cor_s", "total_charge",
        },
        # particle_beam.py:266
        "uniform_3d_ellipsoid": {
            "num_particles", "radius_x", "radius_y", "radius_s",
            "sigma_xp", "sigma_yp", "sigma_p", "energy", "total_charge",
        },
        # particle_beam.py:387
        "make_linspaced": {
            "num_particles", "mu_x", "mu_y", "mu_xp", "mu_yp",
            "sigma_x", "sigma_y", "sigma_xp", "sigma_yp", "sigma_s",
            "sigma_p", "energy", "total_charge",
        },
    },
}


def test_element_constructor_signatures():
    for cls_name, expected in ELEMENT_SIGNATURES.items():
        cls = getattr(lt, cls_name)
        params = set(inspect.signature(cls.__init__).parameters)
        params -= {"self", "dtype"}
        missing = expected - params
        assert not missing, f"{cls_name} missing ctor params: {sorted(missing)}"


def test_beam_classmethod_signatures():
    for cls_name, methods in BEAM_CLASSMETHODS.items():
        cls = getattr(lt, cls_name)
        for meth_name, expected in methods.items():
            params = set(inspect.signature(getattr(cls, meth_name)).parameters)
            params -= {"cls", "dtype", "key"}
            missing = expected - params
            assert not missing, (
                f"{cls_name}.{meth_name} missing params: {sorted(missing)}"
            )


def test_package_exports_match_reference():
    """Everything the reference re-exports at top level exists here
    (reference ``lynx/__init__.py:1-19``)."""
    for name in [
        "Aperture", "BPM", "Beam", "Cavity", "CustomTransferMap", "Dipole",
        "Drift", "Element", "HorizontalCorrector", "Marker", "ParameterBeam",
        "ParticleBeam", "Quadrupole", "RBend", "Screen", "Segment",
        "Solenoid", "Undulator", "VerticalCorrector",
    ]:
        assert hasattr(lt, name), name
