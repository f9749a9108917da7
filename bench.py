"""Headline benchmark: ARES EA tracking throughput on one TPU chip.

Reproduces the reference's speed contract (``tests/test_speed.py:21-28``):
the ARES Experimental Area subcell (AREASOLA1 -> AREABSCR1), a 100,000-
particle beam, an active screen — track + screen read.  The reference's bar
is < 0.1 s per track on a CI CPU (PyTorch Cheetah), i.e. 10 tracks/s;
``vs_baseline`` is measured against that.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

BASELINE_TRACKS_PER_S = 10.0  # reference: < 0.1 s / track on CPU


def _require_backend(timeout_s: float = 180.0) -> None:
    """Fail fast (non-zero exit) if the accelerator backend cannot
    initialize.  Backend init blocks indefinitely in native code when the
    remote-TPU tunnel is wedged, so probe it in a killable subprocess."""
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        sys.exit("bench: accelerator backend unreachable (init timed out)")
    except subprocess.CalledProcessError as error:
        sys.exit(f"bench: backend init failed: {error.stderr.decode()[-500:]}")


def main() -> None:
    _require_backend()
    import jax
    from __graft_entry__ import entry

    forward, (segment, beam) = entry()
    jitted = jax.jit(forward)

    # Warm up / compile.
    jax.block_until_ready(jitted(segment, beam))

    # Steady-state timing.
    n_iters = 30
    start = time.perf_counter()
    for _ in range(n_iters):
        out = jitted(segment, beam)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    tracks_per_s = n_iters / elapsed
    print(
        json.dumps(
            {
                "metric": "ares_ea_100k_track_and_screen_read_throughput",
                "value": round(tracks_per_s, 3),
                "unit": "tracks/s",
                "vs_baseline": round(tracks_per_s / BASELINE_TRACKS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
