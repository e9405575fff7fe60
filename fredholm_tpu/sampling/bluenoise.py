"""Screen-space blue-noise dithered sampling.

Selectable-mode equivalent of /root/reference/fredholm/modules/
blue-noise.cu (Heitz/Belcour-style screen-space blue-noise sampling; the
reference wires it into SamplerState but only uses it in a commented-out
light-sampling path, pt.cu:866-868 — here it is a real sampler mode).

Design (dithered quasi-Monte Carlo, Georgiev & Fajardo 2016): every pixel
draws from ONE shared Owen-scrambled Sobol sequence, Cranley-Patterson
rotated by a per-pixel blue-noise value from our void-and-cluster ranking
tile (assets/bluenoise_rank_128.npy, tools/gen_bluenoise.py):

    u(pixel, index, dim) = fract(sobol_owen(index, dim, frame_seed)
                                 + bn(pixel) + fract(dim * phi))

The toroidal rotation preserves each pixel's per-dimension stratification
over sample index, while the SPATIAL arrangement of the rotation values is
blue — so at low spp the Monte Carlo error is distributed as blue noise in
screen space (visually far less clumpy than white-noise decorrelation at
equal variance). The per-dimension golden-ratio offset decorrelates
dimensions without a second table lookup; crucially the ranking tile is
gathered ONCE per sample (sampler init), not per draw — irregular per-lane
HBM gathers are the most expensive primitive on this TPU (see CLAUDE.md).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .sobol import sobol_owen_float

_ASSET = os.path.join(
    os.path.dirname(__file__), "..", "assets", "bluenoise_rank_128.npy"
)
_TILE_SIZE = 128
_PHI = 0.6180339887498949  # fract(golden ratio)


def _load_tile() -> np.ndarray:
    if os.path.exists(_ASSET):
        return np.load(_ASSET)
    # deterministic fallback (white noise ranking) if the asset was not built
    rng = np.random.default_rng(0)
    return rng.permutation(_TILE_SIZE * _TILE_SIZE).astype(np.uint32).reshape(
        _TILE_SIZE, _TILE_SIZE
    )


_RANK = _load_tile()
# normalized dither values in [0, 1)
_DITHER = (_RANK.astype(np.float32) + 0.5) / float(_RANK.size)


def bn_shift(pixel_i, pixel_j) -> jnp.ndarray:
    """Per-pixel blue-noise rotation value in [0,1) (one tile gather)."""
    tile = jnp.asarray(_DITHER)
    pi = jnp.asarray(pixel_i).astype(jnp.uint32) % np.uint32(_TILE_SIZE)
    pj = jnp.asarray(pixel_j).astype(jnp.uint32) % np.uint32(_TILE_SIZE)
    return tile[pj, pi]


def _dim_offset(dimension):
    """fract(dim * phi): decorrelates dimensions with zero table lookups."""
    d = jnp.asarray(dimension).astype(jnp.float32)
    return jnp.mod(d * np.float32(_PHI), 1.0)


def blue_noise_1d(shift, index, dimension, frame_seed=0):
    """1D blue-noise dithered draw.

    shift: [N] per-pixel rotation from bn_shift(); index: [N] sample index
    (per-pixel spp count); dimension: python int or traced uint32 scalar;
    frame_seed: scalar uint32 decorrelating independent renders.
    """
    base = sobol_owen_float(
        jnp.asarray(index).astype(jnp.uint32),
        dimension,
        jnp.asarray(frame_seed).astype(jnp.uint32),
    )
    return jnp.mod(base + shift + _dim_offset(dimension), 1.0)


def blue_noise_2d(shift, index, dimension, frame_seed=0):
    """2D blue-noise dithered draw from a Sobol dimension pair; [..., 2]."""
    d = jnp.asarray(dimension).astype(jnp.uint32)
    u0 = blue_noise_1d(shift, index, d, frame_seed)
    u1 = blue_noise_1d(shift, index, d + jnp.uint32(1), frame_seed)
    return jnp.stack([u0, u1], axis=-1)
