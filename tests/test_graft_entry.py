"""Driver-contract smoke tests for ``__graft_entry__`` (the compile-check
interface the round driver grades): ``entry()`` must jit on one device,
``dryrun_multichip(n)`` must build a mesh and run a full sharded train step
plus pipelined tracking. Run in a subprocess exactly like the driver does
(fresh process, JAX_PLATFORMS=cpu + virtual device count)."""

import os
import pathlib
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).parent.parent


def _run(code: str, n_devices: int, timeout: float) -> None:
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}",
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        timeout=timeout,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]


def test_entry_compiles_small():
    """entry()'s forward jits and produces the ARES screen image (shrunk
    beam via the shared _flagship helper; full size runs in bench/driver)."""
    _run(
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "from __graft_entry__ import _flagship;"
        "from lynx_tpu.functional import track;"
        "segment, beam = _flagship(num_particles=2000);"
        "out = jax.jit(lambda s, b: track(s, b)[1]['AREABSCR1'])(segment, beam);"
        "assert out.shape == (1, 2040, 2448), out.shape",
        n_devices=1,
        timeout=420,
    )


def test_dryrun_multichip_2_devices():
    _run(
        "import __graft_entry__ as g; g.dryrun_multichip(2)",
        n_devices=2,
        timeout=420,
    )
