"""Inter-bounce wavefront compaction for the fused pipeline's trace calls.

Dead lanes (sky misses, Russian-roulette kills, emissive terminations)
still ride every traversal dispatch: the clustered/dense Pallas kernels
skip FULLY-dead [16,128] tiles for free, but a tile with one alive lane
pays its full cluster sweep. Measured open-scene lane occupancy is 0.087
(PERF.md "Compaction headroom"), i.e. >10x waste in partially-alive
tiles on the hosek/terrain scene class.

This module compacts alive lanes to the FRONT of the wavefront around
each trace call, so dead lanes collapse into fully-dead tail tiles that
the existing per-tile gate skips. Three properties make this the
TPU-shaped design (vs the two measured dead ends — 39 ms global argsort,
and lane regeneration's 2.3x/stage premium, PERF.md round 3):

- The permutation comes from a stable binary partition computed with ONE
  int32 cumsum — no sort. dest[i] = rank of lane i among its class
  (alive first, dead after), which is simultaneously the row-scatter
  destination for inputs and the row-GATHER index that restores result
  order (dest is the inverse permutation of the compaction).
- All per-lane planes move as ONE stacked [M, K] row scatter/gather —
  row granularity (K*4 bytes) instead of the catastrophic per-element
  [M] gathers (~13 ms each, CLAUDE.md).
- Trace results are per-lane independent (the sweep only uses tile
  membership for visit GATING — any-lane unions), so
  trace(compact(x))[dest] == trace(x) bit-exactly; everything downstream
  is untouched. This replaces the SIMT scheduling OptiX provides the
  reference for free (shared.h:52-57, renderer.h:520-521).

Gate: FREDHOLM_COMPACT = "0" (off) | "1" (always) | "auto" (clustered
scenes only — dense-scene dispatches are cheap enough that the permute
overhead can dominate; measured on-chip before flipping the default).
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp

_MODE = _os.environ.get("FREDHOLM_COMPACT", "0")  # default pending chip A/B
assert _MODE in ("0", "1", "auto"), "FREDHOLM_COMPACT must be 0|1|auto"


def enabled(dev: dict) -> bool:
    mode = dev.get("compact", _MODE)
    if mode == "0":
        return False
    if mode == "1":
        return True
    return not dev.get("use_dense", True)


def partition_dest(alive):
    """Stable binary-partition destinations: alive lanes keep their
    relative order at the front, dead lanes theirs at the back.
    Returns int32 [M]; dest is its own inverse's gather index."""
    a = alive.astype(jnp.int32)
    ca = jnp.cumsum(a)
    cd = jnp.cumsum(1 - a)
    n_alive = ca[-1]
    return jnp.where(alive, ca - 1, n_alive + cd - 1)


def _scatter_rows(dest, x):
    """y[dest[i], :] = x[i, :] — dest is a bijection on [0, M)."""
    return jnp.zeros_like(x).at[dest].set(
        x, unique_indices=True, mode="promise_in_bounds"
    )


def compact_rays(dest, o, d, t):
    """Permute component-form ray planes (V3, V3, [M]) to alive-first
    order with one [M, 7] row scatter."""
    x = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, t], axis=-1)
    y = _scatter_rows(dest, x)
    from ..fused.cvec import V3

    return (
        V3(y[:, 0], y[:, 1], y[:, 2]),
        V3(y[:, 3], y[:, 4], y[:, 5]),
        y[:, 6],
    )


def uncompact_hits(dest, res: dict) -> dict:
    """Restore original lane order of a closest-hit result dict with one
    f32 and (if present) one int32 row gather. res planes: hit (bool),
    t/u/v (f32), prim (int32), optional inst (int32)."""
    ints = [k for k in ("prim", "inst", "slot") if k in res]
    # int planes ride the SAME stacked f32 row gather: a separate [M]
    # int32 gather is per-element (the catastrophic access class,
    # CLAUDE.md ~13 ms at 262k lanes). prim/inst ids are exact in f32 up
    # to 2^24, far above any scene here.
    xf = jnp.stack(
        [res["t"], res["u"], res["v"], res["hit"].astype(jnp.float32)]
        + [res[k].astype(jnp.float32) for k in ints],
        axis=-1,
    )
    yf = xf[dest]
    out = {
        "t": yf[:, 0],
        "u": yf[:, 1],
        "v": yf[:, 2],
        "hit": yf[:, 3] > 0.5,
    }
    for j, k in enumerate(ints):
        out[k] = yf[:, 4 + j].astype(jnp.int32)
    return out


def uncompact_occ(dest, occluded):
    """Restore original lane order of an any-hit boolean plane."""
    return occluded.astype(jnp.float32)[dest] > 0.5
