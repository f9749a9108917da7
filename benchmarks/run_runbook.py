"""One-command on-device runbook (see benchmarks/README.md).

Runs the serial validation + measurement sequence against the real chip,
each step in its own killable subprocess (the remote-TPU tunnel can wedge
mid-compile), logging everything under ``benchmarks/results/``:

    1. backend probe (real device op, not just import)
    2. tpu_validation.py      — Pallas-kernel correctness on device
    3. particle_ab.py         — particle-layout A/B numbers
    4. breakdown.py           — component timings
    5. bench.py --update-baseline

Steps 3-5 run even if 2 fails (bench has its own scatter fallback); the
summary at the end says what passed, what failed, and what routing
decisions remain (see the README's decision table).

Usage: python benchmarks/run_runbook.py [--skip-validation] [--quick]
"""

from __future__ import annotations

import argparse
import datetime
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
RESULTS = REPO / "benchmarks" / "results"

STEPS = [
    # (name, args, timeout_s)
    ("tpu_validation", [sys.executable, "benchmarks/tpu_validation.py"], 1800),
    ("particle_ab", [sys.executable, "benchmarks/particle_ab.py"], 1800),
    ("breakdown", [sys.executable, "benchmarks/breakdown.py"], 1800),
    # Round-4 A/Bs: flagship dispatch modes, observation-method routing,
    # aperture-fidelity kernels (all skipped by --quick).
    (
        "batched_breakdown",
        [sys.executable, "benchmarks/batched_breakdown.py"],
        2400,
    ),
    (
        "aperture_sweep_ab",
        [sys.executable, "benchmarks/aperture_sweep_ab.py"],
        2400,
    ),
    # Budget > bench's internal probe (<=180 s x 3) + per-metric
    # measurement subprocesses + the below-floor retry pass (retries stop
    # STARTING at 2400 s, so the last can end ~3300 s) + CPU-fallback run,
    # so bench normally self-terminates before the runbook's kill.
    ("bench", [sys.executable, "bench.py", "--update-baseline"], 4800),
]


def probe_backend(timeout_s: float = 180.0) -> bool:
    code = (
        "import jax, jax.numpy as jnp;"
        "jnp.arange(4).sum().block_until_ready();"
        "print(jax.default_backend())"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print("probe: backend init timed out (tunnel dead)")
        return False
    backend = out.stdout.strip()
    print(f"probe: backend = {backend!r} (rc {out.returncode})")
    return out.returncode == 0 and backend not in ("", "cpu")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-validation", action="store_true")
    parser.add_argument(
        "--quick", action="store_true",
        help="skip particle_ab and breakdown; probe + validation + bench only",
    )
    args = parser.parse_args()

    if not probe_backend():
        print("runbook: no accelerator — aborting (nothing written)")
        return 2

    RESULTS.mkdir(exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    statuses = {}
    for name, cmd, timeout_s in STEPS:
        if args.skip_validation and name == "tpu_validation":
            statuses[name] = "skipped"
            continue
        if args.quick and name in (
            "particle_ab",
            "breakdown",
            "batched_breakdown",
            "aperture_sweep_ab",
        ):
            statuses[name] = "skipped"
            continue
        log = RESULTS / f"{stamp}_{name}.log"
        print(f"=== {name} (timeout {timeout_s}s) -> {log}")
        start = time.time()
        try:
            with open(log, "w") as fh:
                proc = subprocess.run(
                    cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
                    timeout=timeout_s,
                )
            statuses[name] = "ok" if proc.returncode == 0 else f"rc {proc.returncode}"
        except subprocess.TimeoutExpired:
            statuses[name] = "timeout"
        print(f"    {statuses[name]} ({time.time() - start:.0f}s)")
        # Canonical latest-run copy is the only git-tracked artifact;
        # timestamped logs stay local history (ADVICE r3).
        (RESULTS / f"latest_{name}.log").write_text(log.read_text())
        tail = log.read_text().splitlines()[-8:]
        for line in tail:
            print("   |", line)

    print("\n=== runbook summary")
    for name, status in statuses.items():
        print(f"  {name}: {status}")
    print(
        "\nNext (benchmarks/README.md): if tpu_validation is green, unpin"
        " SCREEN_MATMUL_PATH in __graft_entry__.entry(); use particle_ab"
        " numbers to route or delete _fused_particle_flush /"
        " PARTICLE_ROWS_PATH; commit bench's .bench_baseline.json."
    )
    return 0 if all(s in ("ok", "skipped") for s in statuses.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
