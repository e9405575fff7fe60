"""Blocked (swizzled) pixel order for ray coherence.

Row-major pixel order makes a [64, 128]-lane ray tile cover two full image
rows — a footprint so wide that every tile overlaps most of the scene and
the traversal kernels' `any(hit)` gates stop culling anything. Swizzling
pixels into [8, 128] blocks (block-row-major) makes each ray tile a compact
64x128-PIXEL screen region instead, which is what the predicated cluster
sweep (accel/pallas_clustered.py) and the dead-tile skip need to be
selective. This is the TPU analog of the reference GPU's 2D thread-block
launch (pt.cu:418: one CUDA block = one compact screen tile).

The swizzle is pure index arithmetic at ray generation (no gathers), and
the inverse is a single reshape-transpose-reshape per AOV (an XLA
transpose, HBM-bandwidth cheap) — so the integrator works internally in
swizzled order and still RETURNS pixel-linear arrays; no consumer changes.

Active only when width % 128 == 0 and the rendered band height % 8 == 0
(all bench/golden shapes qualify; anything else falls back to linear).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BLOCK_H = 8
BLOCK_W = 128
BLOCK = BLOCK_H * BLOCK_W


def swizzle_active(width: int, tile_height: int, clustered: bool = False) -> bool:
    """Whether to render this band in blocked pixel order.

    Measured on the dev TPU: swizzling buys selectivity for the clustered
    sweep's tile gates but costs ~10% on dense scenes (the extra transpose
    + slightly worse sampler index arithmetic with nothing to cull), so the
    default is clustered-only. FREDHOLM_SWIZZLE=0 forces off, =always
    forces on (perf A/B knobs).
    """
    import os

    knob = os.environ.get("FREDHOLM_SWIZZLE", "auto")
    if knob == "0":
        return False
    if knob != "always" and not clustered:
        return False
    return width % BLOCK_W == 0 and tile_height % BLOCK_H == 0


def swizzled_pixel_coords(width: int, tile_height: int, y0):
    """(px, py) uint32 arrays of length width*tile_height, ordered so that
    consecutive lanes form [8, 128]-pixel blocks; py includes the band
    offset y0."""
    n = width * tile_height
    s = jnp.arange(n, dtype=jnp.uint32)
    wb = width // BLOCK_W
    block = s // np.uint32(BLOCK)
    within = s % np.uint32(BLOCK)
    py = (block // np.uint32(wb)) * np.uint32(BLOCK_H) + within // np.uint32(
        BLOCK_W
    )
    px = (block % np.uint32(wb)) * np.uint32(BLOCK_W) + within % np.uint32(
        BLOCK_W
    )
    return px, py + jnp.asarray(y0, jnp.uint32)


def unswizzle(arr, width: int, tile_height: int):
    """Swizzled [N, ...] -> pixel-linear [N, ...]: one transpose."""
    hb = tile_height // BLOCK_H
    wb = width // BLOCK_W
    tail = arr.shape[1:]
    a = arr.reshape((hb, wb, BLOCK_H, BLOCK_W) + tail)
    a = jnp.swapaxes(a, 1, 2)
    return a.reshape((tile_height * width,) + tail)


def swizzle_array(arr, width: int, tile_height: int):
    """Pixel-linear [N, ...] -> swizzled [N, ...] (inverse of unswizzle)."""
    hb = tile_height // BLOCK_H
    wb = width // BLOCK_W
    tail = arr.shape[1:]
    a = arr.reshape((hb, BLOCK_H, wb, BLOCK_W) + tail)
    a = jnp.swapaxes(a, 1, 2)
    return a.reshape((tile_height * width,) + tail)
