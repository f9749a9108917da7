"""Headline benchmark: ARES EA tracking throughput on one TPU chip.

Reproduces the reference's speed contract (``tests/test_speed.py:21-28``):
the ARES Experimental Area subcell (AREASOLA1 -> AREABSCR1), a 100,000-
particle beam, an active screen — track + screen read.  The reference's bar
is < 0.1 s per track on a CI CPU (PyTorch Cheetah), i.e. 10 tracks/s;
``vs_baseline`` is measured against that.

Headline value: per-track throughput with B=8 settings batched per
dispatch (the production operating mode; amortizes the ~1 ms per-call
dispatch floor of remotely-attached chips).  The JSON line also carries
the serial (B=1) flagship number and the settings-sweep north-star
(vectorized ParameterBeam env-steps/s, BASELINE.md >= 1e6/chip target).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "serial_tracks_per_s": N, "batch_size": 8,
     "sweep_env_steps_per_s": N, "backend": "tpu"|"cpu_fallback"|...}

If the accelerator backend is unreachable (remote-TPU tunnel down), the
bench falls back to a smaller, honestly-labeled CPU run ("backend":
"cpu_fallback") rather than recording nothing.

Modes:
    python bench.py                   # run + print the JSON line
    python bench.py --check           # also fail (exit 1) on >20% regression
                                      # against .bench_baseline.json
    python bench.py --update-baseline # run + store result as the baseline
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

# Make `__graft_entry__` (and the package) importable regardless of the
# caller's working directory.
_REPO_DIR = str(Path(__file__).resolve().parent)
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

BASELINE_TRACKS_PER_S = 10.0  # reference: < 0.1 s / track on CPU
BASELINE_FILE = Path(__file__).parent / ".bench_baseline.json"
REGRESSION_TOLERANCE = 0.20

# Workload sizes (module-level so the CPU smoke test can shrink them).
FLAGSHIP_PARTICLES = 100_000
SWEEP_BATCH = 100_000
N_ITERS = 30

#: Wall-clock budget for the accelerator measurement subprocess.  Remote
#: compiles take 2-9 min each; three compiled programs plus timing fits
#: comfortably — but a wedged tunnel mid-compile must not hang the bench.
MEASURE_TIMEOUT_S = 2100.0


def _require_backend(timeout_s: float = 180.0, retries: int = 2) -> str:
    """Probe the accelerator backend in a killable subprocess (backend init
    blocks indefinitely in native code when the remote-TPU tunnel is wedged);
    retries with backoff cover transient tunnel wedges.  Returns the backend
    name, or ``"cpu_fallback"`` after forcing the CPU backend when the
    accelerator is unreachable — a labeled CPU measurement beats recording
    nothing when the remote chip's tunnel is down."""
    last = "unknown"
    for attempt in range(retries + 1):
        try:
            probe = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, jax.numpy as jnp;"
                    "jnp.arange(4).sum().block_until_ready();"
                    "print(jax.default_backend())",
                ],
                timeout=timeout_s,
                check=True,
                capture_output=True,
            )
            return probe.stdout.decode().strip() or "unknown"
        except subprocess.TimeoutExpired:
            last = "init timed out"
        except subprocess.CalledProcessError as error:
            last = f"init failed: {error.stderr.decode()[-500:]}"
        if attempt < retries:
            time.sleep(60.0)
    print(
        f"bench: accelerator backend unreachable ({last}); falling back to"
        " the CPU backend (result labeled 'cpu_fallback')",
        file=sys.stderr,
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu_fallback"


def _validate_windowed_histogram(timeout_s: float = 300.0) -> None:
    """Compile the windowed MXU histogram kernel in a killable subprocess;
    if Mosaic fails to lower it (or the compile wedges), force the proven
    scatter path for this bench run instead of dying."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "from lynx_tpu.ops import histogram as h;"
        "x = jnp.linspace(0.4, 0.6, 1024);"
        "y = jnp.linspace(0.45, 0.55, 1024);"
        "w = jnp.ones((1024,));"
        "out = jax.jit(lambda x, y, w: h.windowed_matmul_histogram_2d("
        "x, y, w, (0.0, 1.0), (0.0, 1.0), (2448, 2040),"
        " window=(256, 1024)))(x, y, w);"
        "out.block_until_ready()"
    )
    try:
        subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as err:
        from lynx_tpu.ops import histogram

        histogram.SCREEN_MATMUL_PATH = False
        detail = (
            "compile timed out"
            if isinstance(err, subprocess.TimeoutExpired)
            else err.stderr.decode()[-300:]
        )
        print(
            f"bench: windowed histogram kernel unavailable, using scatter"
            f" path ({detail})",
            file=sys.stderr,
        )


def _time_calls(fn, args, n_iters: int) -> float:
    """Steady-state seconds per call (compile + warmup excluded)."""
    import jax

    jax.block_until_ready(fn(*args))  # compile
    jax.block_until_ready(fn(*args))  # warm
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n_iters


def _flagship_throughput(batch: int) -> float:
    """Tracks/s for the flagship (track + full screen read) at ``batch``
    settings per dispatch."""
    import jax
    from __graft_entry__ import _flagship
    from lynx_tpu.functional import track

    batch_shape = () if batch == 1 else (batch,)
    segment, beam = _flagship(
        num_particles=FLAGSHIP_PARTICLES, batch_shape=batch_shape
    )

    @jax.jit
    def forward(segment, beam):
        _, diagnostics = track(segment, beam)
        return diagnostics["AREABSCR1"]

    per_call = _time_calls(forward, (segment, beam), n_iters=N_ITERS)
    return batch / per_call


def _sweep_env_steps_per_s(batch: int = None) -> float:
    """Vectorized settings-sweep rate: B ParameterBeam instances through the
    ARES EA per second (the RL/env north-star, BASELINE.md >= 1e6/chip)."""
    import jax
    import jax.numpy as jnp

    from lynx_tpu.envs import make_env
    from lynx_tpu.envs.ares_ea import default_params

    batch = SWEEP_BATCH if batch is None else batch
    env = make_env()
    params = jax.vmap(default_params)(
        jax.random.split(jax.random.PRNGKey(1), batch)
    )

    @jax.jit
    def sweep(magnets, params):
        return env.batched_beam_parameters(magnets, params)

    magnets = jnp.zeros((batch, env.num_actions))
    per_call = _time_calls(sweep, (magnets, params), n_iters=max(N_ITERS // 2, 1))
    return batch / per_call


def check_regression(
    current: dict, baseline: dict, tolerance: float = REGRESSION_TOLERANCE
) -> list[str]:
    """Return a list of regression messages (empty = pass): any throughput
    key that dropped more than ``tolerance`` vs the stored baseline."""
    failures = []
    for key in ("value", "serial_tracks_per_s", "sweep_env_steps_per_s"):
        if key in baseline and key in current and baseline[key]:
            ratio = current[key] / baseline[key]
            if ratio < 1.0 - tolerance:
                failures.append(
                    f"{key}: {current[key]:.3g} is {100 * (1 - ratio):.1f}% below"
                    f" baseline {baseline[key]:.3g}"
                )
    return failures


def _measure(backend: str) -> dict:
    """Run the three measurements on the CURRENT backend; assemble the
    result dict."""
    batch = 8
    serial = _flagship_throughput(batch=1)
    batched = _flagship_throughput(batch=batch)
    sweep = _sweep_env_steps_per_s()

    # Headline = the better dispatch mode.  On accelerators batched wins
    # (it amortizes the per-call dispatch floor); on the CPU fallback the
    # cache-resident serial run can win instead.
    headline = max(batched, serial)
    return {
        "metric": "ares_ea_100k_track_and_screen_read_throughput",
        "value": round(headline, 3),
        "unit": "tracks/s",
        "vs_baseline": round(headline / BASELINE_TRACKS_PER_S, 3),
        "headline_mode": "batched" if batched >= serial else "serial",
        "serial_tracks_per_s": round(serial, 3),
        "batched_tracks_per_s": round(batched, 3),
        "batch_size": batch,
        "sweep_env_steps_per_s": round(sweep, 1),
        "backend": backend,
    }


def _measure_in_subprocess() -> dict | None:
    """Run the accelerator measurement in a killable subprocess: the remote
    tunnel can wedge MID-compile (observed), which would otherwise hang the
    whole bench past any deadline.  Returns the parsed result, or ``None``
    to fall back to CPU."""
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--measure-only"],
            timeout=MEASURE_TIMEOUT_S,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench: accelerator measurement timed out (tunnel wedge?);"
            " falling back to CPU",
            file=sys.stderr,
        )
        return None
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(
            f"bench: accelerator measurement failed (rc {proc.returncode});"
            " falling back to CPU",
            file=sys.stderr,
        )
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def _cpu_fallback_sizes() -> None:
    global N_ITERS, SWEEP_BATCH
    N_ITERS = 5
    SWEEP_BATCH = 10_000


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", action="store_true")
    parser.add_argument("--update-baseline", action="store_true")
    parser.add_argument(
        "--measure-only",
        action="store_true",
        help="internal: measure on the current backend and print the JSON",
    )
    args = parser.parse_args()

    if args.measure_only:
        import jax

        backend = jax.default_backend()
        if backend == "tpu":
            _validate_windowed_histogram()
        print(json.dumps(_measure(backend)))
        return

    backend = _require_backend()
    result = None
    if backend != "cpu_fallback":
        result = _measure_in_subprocess()
        if result is None:
            backend = "cpu_fallback"

    if result is None:
        # The windowed-kernel probe subprocess would hang on the dead tunnel,
        # and screen_histogram_2d auto-routes to scatter off-TPU anyway.
        _cpu_fallback_sizes()
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        result = _measure("cpu_fallback")
    print(json.dumps(result))

    if args.update_baseline:
        BASELINE_FILE.write_text(json.dumps(result, indent=2) + "\n")
    elif args.check and BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text())
        if baseline.get("backend", backend) == backend:
            failures = check_regression(result, baseline)
            if failures:
                for failure in failures:
                    print(f"bench regression: {failure}", file=sys.stderr)
                sys.exit(1)
        else:
            print(
                "bench: skipping regression check (baseline backend"
                f" {baseline.get('backend')!r} != current {backend!r})",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
