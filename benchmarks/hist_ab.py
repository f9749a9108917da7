"""On-device A/B of windowed count-histogram kernel variants (VERDICT r3
next #3: close the remaining ~43% to the int8 MXU roofline; the stated
residual is the in-kernel one-hot build on the VPU).

Variants (self-contained copies; the production kernel is untouched until
a winner emerges):

  base        — the shipped kernel: int32 iota==lx compares -> int8 one-hot,
                two interleaved 1024-particle half-tiles per 2048 tile.
  i16         — compares in int16 (VPU processes 2x the lanes per cycle).
  pretransA   — build A already transposed ((win_x, chunk)) so the MXU
                consumes it without a relayout.
  chunk2048   — 4096-particle tiles, two 2048 halves (double contraction
                depth per dot).
  i16_pretA   — both i16 and pretransA.
  twolevel_*  — A_t one-hot factored as (hi // 8 match) & (lo % 8 match):
                7.5x fewer compares, but the sublane repeat/tile expansions
                relayout and it measured ~1.8x SLOWER than the dense
                compare (0.202 vs 0.112 ms, TPU v5 lite 2026-08-21) —
                recorded as a negative result.

Workload: the flagship screen read shape (100k particles, the ARES
(244, 950)-derived window -> (952, 256) kernel window after swap+round).

Prints one JSON line per variant.
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json

import jax
import jax.numpy as jnp


def make_kernel(win_x, win_y, tile_n, compare_dtype, pretrans, halves=None,
                twolevel=False):
    from jax.experimental import pallas as pl

    if halves is None:
        halves = 2 if tile_n % 2048 == 0 else 1
    chunk = tile_n // halves

    def kernel_twolevel(lx_ref, ly_ref, out_ref):
        """A_t built as H & L: hi-part one-hot (rows // 8) AND lo-part
        one-hot (rows % 8) — win_x/8 + 8 rows of compares instead of
        win_x, then one AND per cell, with the factors expanded to
        (win_x, chunk) via jnp.repeat / concatenate.  Requires win_x to
        be a multiple of 8 (the production kernel windows always are)."""
        assert win_x % 8 == 0, "twolevel variant needs 8-aligned win_x"

        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        n_hi = win_x // 8
        dots = []
        for k in range(halves):
            sl = slice(k * chunk, (k + 1) * chunk)
            lx = lx_ref[sl]
            ly = ly_ref[sl]
            col_y = jax.lax.broadcasted_iota(jnp.int32, (chunk, win_y), 1)
            B = (ly[:, None] == col_y).astype(jnp.int8)
            hi = lx // 8
            lo = lx - hi * 8
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, chunk), 0)
            H = (hi[None, :] == iota_hi)  # (n_hi, chunk) bool
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0)
            L = (lo[None, :] == iota_lo)  # (8, chunk) bool
            # A_t[8*h + l, n] = H[h, n] & L[l, n]
            Hrep = jnp.repeat(H, 8, axis=0)          # (win_x, chunk)
            Ltile = jnp.concatenate([L] * n_hi, 0)   # (win_x, chunk)
            A_t = (Hrep & Ltile).astype(jnp.int8)
            dots.append(
                jax.lax.dot_general(
                    A_t, B, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
        acc = out_ref[...]
        for d in dots:
            acc = acc + d[None]
        out_ref[...] = acc

    if twolevel:
        return kernel_twolevel

    def kernel(lx_ref, ly_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        dots = []
        for k in range(halves):
            sl = slice(k * chunk, (k + 1) * chunk)
            lx = lx_ref[sl].astype(compare_dtype)
            ly = ly_ref[sl].astype(compare_dtype)
            col_y = jax.lax.broadcasted_iota(compare_dtype, (chunk, win_y), 1)
            B = (ly[:, None] == col_y).astype(jnp.int8)
            if pretrans:
                col_x = jax.lax.broadcasted_iota(
                    compare_dtype, (win_x, chunk), 0
                )
                A_t = (lx[None, :] == col_x).astype(jnp.int8)
                dots.append(
                    jax.lax.dot_general(
                        A_t,
                        B,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                )
            else:
                col_x = jax.lax.broadcasted_iota(
                    compare_dtype, (chunk, win_x), 1
                )
                A = (lx[:, None] == col_x).astype(jnp.int8)
                dots.append(
                    jax.lax.dot_general(
                        A,
                        B,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                )

        acc = out_ref[...]
        for d in dots:
            acc = acc + d[None]
        out_ref[...] = acc

    return kernel


def run_variant(name, spec, lx, ly, win_x, win_y):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lynx_tpu.profiling import marginal_seconds_per_iter

    tile_n = spec["tile_n"]
    N = lx.shape[0]
    n_tiles = -(-N // tile_n)
    pad = n_tiles * tile_n - N
    if pad:
        lx = jnp.pad(lx, (0, pad), constant_values=-1)
        ly = jnp.pad(ly, (0, pad), constant_values=-1)

    kernel = make_kernel(
        win_x, win_y, tile_n, spec["compare_dtype"], spec["pretrans"],
        halves=spec.get("halves"), twolevel=spec.get("twolevel", False),
    )
    vec_spec = pl.BlockSpec(
        (tile_n,), lambda b, i: (b * n_tiles + i,), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, win_x, win_y), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )

    def hist(lx, ly):
        return pl.pallas_call(
            kernel,
            grid=(1, n_tiles),
            in_specs=[vec_spec, vec_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((1, win_x, win_y), jnp.int32),
        )(lx, ly)

    # Correctness vs numpy before timing.
    import numpy as np

    out = np.asarray(jax.jit(hist)(lx, ly))[0]
    mask = np.asarray(lx) >= 0
    ref = np.zeros((win_x, win_y), np.int64)
    np.add.at(ref, (np.asarray(lx)[mask], np.asarray(ly)[mask]), 1)
    assert (out == ref).all(), f"{name}: kernel does not match numpy"

    def step(lx_c):
        out = hist(lx_c, ly)
        # Loop-carried dependence for ints: the select always passes lx_c
        # through (counts are non-negative) but XLA cannot prove it for
        # int32 sums, so iterations can neither fold nor overlap.
        return jnp.where(jnp.sum(out) >= 0, lx_c, 0)

    seconds = marginal_seconds_per_iter(step, lx, 16, 256)
    return seconds


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--particles", type=int, default=100_000)
    parser.add_argument("--win", default="952,256")
    parser.add_argument(
        "--variants", default="base,i16,pretransA,chunk2048,i16_pretA"
    )
    args = parser.parse_args()
    win_x, win_y = (int(v) for v in args.win.split(","))

    VARIANTS = {
        "base": dict(tile_n=2048, compare_dtype=jnp.int32, pretrans=False),
        "i16": dict(tile_n=2048, compare_dtype=jnp.int16, pretrans=False),
        "pretransA": dict(tile_n=2048, compare_dtype=jnp.int32, pretrans=True),
        "chunk2048": dict(tile_n=4096, compare_dtype=jnp.int32, pretrans=False),
        "i16_pretA": dict(tile_n=2048, compare_dtype=jnp.int16, pretrans=True),
        "pretA_h1": dict(tile_n=2048, compare_dtype=jnp.int32, pretrans=True, halves=1),
        "pretA_h4": dict(tile_n=2048, compare_dtype=jnp.int32, pretrans=True, halves=4),
        "pretA_t4096h2": dict(tile_n=4096, compare_dtype=jnp.int32, pretrans=True, halves=2),
        # Round-5 variants: larger tiles cut out_ref VMEM accumulate
        # traffic (2 MB per grid step) and per-step overhead; more halves
        # per tile deepen the VPU-build / MXU-matmul overlap window.
        "pretA_t4096h4": dict(tile_n=4096, compare_dtype=jnp.int32, pretrans=True, halves=4),
        "pretA_t8192h4": dict(tile_n=8192, compare_dtype=jnp.int32, pretrans=True, halves=4),
        "pretA_t8192h8": dict(tile_n=8192, compare_dtype=jnp.int32, pretrans=True, halves=8),
        "pretA_t16384h8": dict(tile_n=16384, compare_dtype=jnp.int32, pretrans=True, halves=8),
        "i16_t8192h8": dict(tile_n=8192, compare_dtype=jnp.int16, pretrans=True, halves=8),
        # NOTE: the twolevel kernel hardcodes int32 compares and the
        # pretransposed layout; compare_dtype/pretrans are not knobs here.
        "twolevel_t4096h4": dict(tile_n=4096, compare_dtype=jnp.int32, pretrans=True, halves=4, twolevel=True),
        "twolevel_t2048h2": dict(tile_n=2048, compare_dtype=jnp.int32, pretrans=True, halves=2, twolevel=True),
    }

    key = jax.random.PRNGKey(0)
    # Realistic occupancy: gaussian spot inside the window.
    lx = jnp.clip(
        (jax.random.normal(key, (args.particles,)) * (win_x / 8) + win_x / 2),
        0,
        win_x - 1,
    ).astype(jnp.int32)
    ly = jnp.clip(
        (
            jax.random.normal(jax.random.PRNGKey(1), (args.particles,))
            * (win_y / 8)
            + win_y / 2
        ),
        0,
        win_y - 1,
    ).astype(jnp.int32)

    for name in args.variants.split(","):
        try:
            seconds = run_variant(name, VARIANTS[name], lx, ly, win_x, win_y)
            record = {
                "variant": name,
                "ms_per_read": round(seconds * 1e3, 4),
                "win": [win_x, win_y],
                "particles": args.particles,
            }
        except Exception as error:  # pragma: no cover
            record = {"variant": name, "error": repr(error)[:300]}
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
