"""Sample-space mappings (disk, hemisphere, triangle, GGX VNDF).

TPU-native re-implementation of /root/reference/fredholm/modules/sampling.cu
:47-150. All functions are vectorized over leading batch dimensions; the
branchy concentric-disk map becomes `jnp.where` selects.

Local frames have +Y as the normal (matching the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import normalize, vec3


def sample_uniform_disk(u):
    """sampling.cu:47-52; u: [..., 2] -> [..., 2]."""
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_concentric_disk(u):
    """Shirley-Chiu concentric disk map (sampling.cu:54-64)."""
    u0 = 2.0 * u - 1.0
    x, y = u0[..., 0], u0[..., 1]
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_y = jnp.where(y == 0.0, 1.0, y)
    theta = jnp.where(
        use_x,
        0.25 * jnp.pi * (y / safe_x),
        0.5 * jnp.pi - 0.25 * jnp.pi * (x / safe_y),
    )
    p = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    degenerate = jnp.logical_and(x == 0.0, y == 0.0)
    return jnp.where(degenerate[..., None], jnp.zeros_like(p), p)


def sample_cosine_weighted_hemisphere(u):
    """Cosine hemisphere about +Y (sampling.cu:66-78); returns [..., 3]."""
    d = sample_concentric_disk(u)
    x, z = d[..., 0], d[..., 1]
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - z * z))
    return vec3(x, y, z)


def sample_triangle(u):
    """Uniform barycentric sample (sampling.cu:80-84); returns [..., 2]."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def sample_vndf(wo, alpha, u):
    """Heitz 2018 GGX visible-normal sampling (sampling.cu:87-110).

    wo: [..., 3] outgoing dir in local frame (+Y normal); alpha: [..., 2]
    anisotropic roughness; u: [..., 2]. Returns the sampled half-vector.
    """
    ax = alpha[..., 0]
    ay = alpha[..., 1]
    vh = normalize(vec3(ax * wo[..., 0], wo[..., 1], ay * wo[..., 2]))

    lensq = vh[..., 0] ** 2 + vh[..., 2] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-30)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        vec3(vh[..., 2] * inv_len, jnp.zeros_like(inv_len), -vh[..., 0] * inv_len),
        jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype=vh.dtype), vh.shape
        ),
    )
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 1])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh
    )
    ne = normalize(
        vec3(ax * nh[..., 0], jnp.maximum(nh[..., 1], 0.0), ay * nh[..., 2])
    )
    return ne


def discrete_sample_cdf(weights, u):
    """Sample an index from a small discrete distribution.

    Vectorized analog of DiscreteDistribution1D (sampling.cu:112-150).
    weights: [..., K] non-negative; u: [...] uniform. Returns (idx, pmf).
    Zero-total-weight batches fall back to index K-1 with pmf 0 (matching the
    reference's fall-through).
    """
    total = jnp.sum(weights, axis=-1, keepdims=True)
    safe_total = jnp.where(total > 0.0, total, 1.0)
    pmf = weights / safe_total
    cdf = jnp.cumsum(pmf, axis=-1)
    k = weights.shape[-1]
    idx = jnp.sum((u[..., None] >= cdf).astype(jnp.int32), axis=-1)
    idx = jnp.minimum(idx, k - 1)
    sel_pmf = jnp.take_along_axis(pmf, idx[..., None], axis=-1)[..., 0]
    return idx, sel_pmf
