"""Test configuration.

Forces the CPU backend with 8 virtual devices (the TPU-emulation fake backend
for multi-chip sharding tests) and enables float64 for bit-parity physics
tests.  NOTE: the ``JAX_PLATFORMS`` environment variable alone is NOT enough
in TPU-attached environments — the platform must be switched via
``jax.config`` before first use.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))

from resources.astra_fixture import ensure_fixture  # noqa: E402

RESOURCES = Path(__file__).parent / "resources"


@pytest.fixture(scope="session")
def astra_beam_path() -> str:
    """Path to the (generated-on-demand) synthetic ASTRA fixture."""
    return str(ensure_fixture(RESOURCES))
