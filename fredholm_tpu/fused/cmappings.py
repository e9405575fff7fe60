"""Component-form sample mappings + sampler draws for the fused kernels.

Mirrors sampling/mappings.py, sampling/cmj.py and sampling/sobol.py with
2D points as (u, v) tuples and directions as V3 — every op elementwise, no
stacked trailing axes. The sobol/cmj integer hashing in sampling/ is
already layout-agnostic and is reused directly; only the stacking wrappers
are re-expressed here.

Reference: /root/reference/fredholm/modules/sampling.cu:47-110, cmj.cu,
sobol.cu:10661-10742.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.rng import xxhash32_4
from ..sampling.cmj import CMJ_M, CMJ_N, cmj_permute_pow2, cmj_randfloat
from ..sampling.sobol import sobol_owen_float
from .cvec import V3, normalize

_U = np.uint32


def draw_sobol_1d(sample_idx, dim: int, seed):
    """Owen-Sobol 1D draw at STATIC dimension `dim` — the matrix row bakes
    into the kernel as constants (sampling.cu:19-22)."""
    return sobol_owen_float(sample_idx, int(dim), seed)


def draw_cmj_2d(n_spp, image_idx, depth: int, scramble):
    """CMJ 2D draw at STATIC dimension slot `depth` (cmj.cu:60-82);
    returns (fx, fy)."""
    n_spp = jnp.asarray(n_spp).astype(jnp.uint32)
    index = n_spp % _U(CMJ_M * CMJ_N)
    key = xxhash32_4(
        n_spp // _U(CMJ_M * CMJ_N),
        image_idx,
        jnp.uint32(depth),
        scramble,
    )
    index_p = cmj_permute_pow2(index, CMJ_M * CMJ_N, key * _U(0x51633E2D))
    sx = cmj_permute_pow2(index_p % _U(CMJ_M), CMJ_M, key * _U(0xA511E9B3))
    sy = cmj_permute_pow2(index_p // _U(CMJ_M), CMJ_N, key * _U(0x63D83595))
    jx = cmj_randfloat(index_p, key * _U(0xA399D265))
    jy = cmj_randfloat(index_p, key * _U(0x711AD6A5))
    fx = (
        (index_p % _U(CMJ_M)).astype(jnp.int32).astype(jnp.float32)
        + (sy.astype(jnp.int32).astype(jnp.float32) + jx) / CMJ_N
    ) / CMJ_M
    fy = (
        (index_p // _U(CMJ_M)).astype(jnp.int32).astype(jnp.float32)
        + (sx.astype(jnp.int32).astype(jnp.float32) + jy) / CMJ_M
    ) / CMJ_N
    return fx, fy


def sample_concentric_disk(u0, u1):
    """Shirley-Chiu concentric disk map (sampling.cu:54-64); returns (x, y)."""
    x = 2.0 * u0 - 1.0
    y = 2.0 * u1 - 1.0
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_y = jnp.where(y == 0.0, 1.0, y)
    theta = jnp.where(
        use_x,
        0.25 * jnp.pi * (y / safe_x),
        0.5 * jnp.pi - 0.25 * jnp.pi * (x / safe_y),
    )
    px = r * jnp.cos(theta)
    py = r * jnp.sin(theta)
    degenerate = (x == 0.0) & (y == 0.0)
    return (
        jnp.where(degenerate, 0.0, px),
        jnp.where(degenerate, 0.0, py),
    )


def sample_cosine_weighted_hemisphere(u0, u1) -> V3:
    """Cosine hemisphere about +Y (sampling.cu:66-78)."""
    x, z = sample_concentric_disk(u0, u1)
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - z * z))
    return V3(x, y, z)


def sample_triangle(u0, u1):
    """Uniform barycentrics (sampling.cu:80-84); returns (b0, b1)."""
    su0 = jnp.sqrt(u0)
    return 1.0 - su0, u1 * su0


def sample_vndf(wo: V3, ax, ay, u0, u1) -> V3:
    """Heitz 2018 GGX visible-normal sampling (sampling.cu:87-110)."""
    vh = normalize(V3(ax * wo.x, wo.y, ay * wo.z))

    lensq = vh.x * vh.x + vh.z * vh.z
    inv_len = jnp.where(
        lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-30)), 0.0
    )
    has_len = lensq > 0.0
    t1 = V3(
        jnp.where(has_len, vh.z * inv_len, 0.0),
        jnp.zeros_like(vh.y),
        jnp.where(has_len, -vh.x * inv_len, 1.0),
    )
    t2 = V3(
        vh.y * t1.z - vh.z * t1.y,
        vh.z * t1.x - vh.x * t1.z,
        vh.x * t1.y - vh.y * t1.x,
    )

    r = jnp.sqrt(u0)
    phi = 2.0 * jnp.pi * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.y)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = V3(
        p1 * t1.x + p2 * t2.x + p3 * vh.x,
        p1 * t1.y + p2 * t2.y + p3 * vh.y,
        p1 * t1.z + p2 * t2.z + p3 * vh.z,
    )
    return normalize(V3(ax * nh.x, jnp.maximum(nh.y, 0.0), ay * nh.z))
