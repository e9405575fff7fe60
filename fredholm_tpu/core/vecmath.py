"""Vector math over stacked jnp arrays (shape [..., 3]).

TPU-native replacement for the reference's float3/float4 helpers
(sutil/vec_math.h) and device math utilities
(/root/reference/fredholm/modules/math.cu). Everything is written as pure
functions over arrays whose trailing dimension is the vector dimension, so a
single call evaluates the whole wavefront batch on the VPU.

Local shading frames follow the reference convention: +Y is the shading
normal (math.cu:19-35, bxdf.cu:9-79).
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basic vector ops


def vec3(x, y, z):
    """Stack three same-shaped arrays into a [..., 3] vector array."""
    return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)


def splat(s, like=None):
    """Broadcast a scalar (or [...] array) to a [..., 3] vector."""
    s = jnp.asarray(s)
    return jnp.broadcast_to(s[..., None], s.shape + (3,))


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def length2(a):
    # math.cu:37-40
    return dot(a, a)


def normalize(a, eps: float = 0.0):
    n2 = jnp.maximum(dot(a, a), eps)
    return a * jax_rsqrt(n2)[..., None]


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)


def lerp(a, b, t):
    return a + (b - a) * t


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def reflect(w, n):
    """Mirror w about n (both unit); bxdf.cu:81-84."""
    return normalize(-w + 2.0 * dot(w, n)[..., None] * n)


def refract(w, n, ior_i, ior_t):
    """Snell refraction of w about n. Returns (wt, ok) where ok=False marks
    total internal reflection; bxdf.cu:86-94."""
    eta = ior_i / ior_t
    th = -eta[..., None] * (w - dot(w, n)[..., None] * n)
    th2 = dot(th, th)
    ok = th2 <= 1.0
    tp = -jnp.sqrt(jnp.maximum(1.0 - th2, 0.0))[..., None] * n
    return th + tp, ok


# ---------------------------------------------------------------------------
# frames


def orthonormal_basis(n):
    """Duff et al. 2017 branchless ONB (math.cu:7-17).

    Returns (tangent, bitangent) for unit normal n [..., 3].
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    tangent = vec3(
        1.0 + sign * n[..., 0] * n[..., 0] * a,
        sign * b,
        -sign * n[..., 0],
    )
    bitangent = vec3(
        b,
        sign + n[..., 1] * n[..., 1] * a,
        -n[..., 1],
    )
    return tangent, bitangent


def world_to_local(v, t, n, b):
    """World direction -> local frame where +Y = n (math.cu:19-25)."""
    return vec3(dot(v, t), dot(v, n), dot(v, b))


def local_to_world(v, t, n, b):
    """Local (+Y up) direction -> world (math.cu:27-35)."""
    return (
        v[..., 0:1] * t + v[..., 1:2] * n + v[..., 2:3] * b
    )


# ---------------------------------------------------------------------------
# color


def rgb_to_luminance(rgb):
    # math.cu:90-93 (Bruce Lindbloom sRGB-D65 Y row)
    w = jnp.asarray([0.2126729, 0.7151522, 0.0721750], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def rgb_to_xyz(rgb):
    m = jnp.asarray(
        [
            [0.4887180, 0.3106803, 0.2006017],
            [0.1762044, 0.8129847, 0.0108109],
            [0.0000000, 0.0102048, 0.9897952],
        ],
        dtype=rgb.dtype,
    )
    return _mat3_vec(m, rgb)


def xyz_to_rgb(xyz):
    m = jnp.asarray(
        [
            [2.3706743, -0.9000405, -0.4706338],
            [-0.5138850, 1.4253036, 0.0885814],
            [0.0052982, -0.0146949, 1.0093968],
        ],
        dtype=xyz.dtype,
    )
    return _mat3_vec(m, xyz)


# ---------------------------------------------------------------------------
# spherical


def cartesian_to_spherical(w):
    """Returns (theta, phi) with theta from +Y pole, phi in [0, 2pi)
    (math.cu:111-118)."""
    theta = jnp.arccos(jnp.clip(w[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(w[..., 2], w[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


def spherical_to_cartesian(theta, phi):
    st = jnp.sin(theta)
    return vec3(st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi))


def deg_to_rad(deg):
    return deg * (jnp.pi / 180.0)


# ---------------------------------------------------------------------------
# transforms (row-major 3x4 matrices, [..., 3, 4])


def _mat3_vec(m3, v):
    # explicit fp32 multiply-adds on the VPU; 3-wide matmuls would otherwise
    # be routed to the MXU at bf16 default precision
    return jnp.sum(m3 * v[..., None, :], axis=-1)


def transform_position(m, p):
    """Apply affine [3,4] matrix rows to positions (shared.h:28-33)."""
    return _mat3_vec(m[..., :, :3], p) + m[..., :, 3]


def transform_direction(m, v):
    return _mat3_vec(m[..., :, :3], v)


def transform_normal(m_inv, n):
    """Normals transform by the inverse-transpose: given world_to_object rows
    m_inv, world normal = m_inv^T @ n (shared.h:42-50)."""
    return jnp.sum(m_inv[..., :, :3] * n[..., :, None], axis=-2)


# ---------------------------------------------------------------------------
# misc


def is_finite3(v):
    return jnp.all(jnp.isfinite(v), axis=-1)


def ray_origin_offset(p, n):
    """Robust ray-origin offset along the geometric normal, Ray Tracing Gems
    ch.6 (pt.cu:401-416). Bit-level integer offset for large magnitudes,
    float offset near the origin."""
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    int_scale = 256.0

    of_i = (int_scale * n).astype(jnp.int32)
    p_i32 = jnp.asarray(p, dtype=jnp.float32).view(jnp.int32)
    shifted = jnp.where(p < 0.0, p_i32 - of_i, p_i32 + of_i)
    p_shift = shifted.view(jnp.float32)
    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_shift)
