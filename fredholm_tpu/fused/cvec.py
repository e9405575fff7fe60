"""Component-form vector math (V3 = three same-shaped arrays).

Mirror of core/vecmath.py (the [..., 3]-stacked reference) in a layout the
TPU Mosaic compiler loves: each component is its own [sublane, lane] tile,
so every op below is a pure VPU elementwise op with no trailing-axis-3
reshuffling. Used by the fused Pallas megakernel; shape-agnostic, so the
same functions also run under plain jnp for tests.

Reference semantics: /root/reference/fredholm/modules/math.cu and
sutil/vec_math.h (via core/vecmath.py, which stays the oracle).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    """Vector/color as three same-shaped component arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # NamedTuple inherits tuple's + and *; override with elementwise math.
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def v3(x, y, z) -> V3:
    return V3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def vfull(s, like: V3) -> V3:
    return V3(
        jnp.full_like(like.x, s),
        jnp.full_like(like.y, s),
        jnp.full_like(like.z, s),
    )


def vsplat(s) -> V3:
    """Scalar array -> V3 with the value in every component."""
    return V3(s, s, s)


def from_stacked(a) -> V3:
    """[..., 3] -> V3 (test/adapter helper; not used in kernels)."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_stacked(v: V3):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def where3(mask, a: V3, b: V3) -> V3:
    return V3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(a: V3):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: V3, eps: float = 0.0) -> V3:
    n2 = jnp.maximum(dot(a, a), eps)
    inv = jax.lax.rsqrt(n2)
    return V3(a.x * inv, a.y * inv, a.z * inv)


def lerp(a, b, t):
    return a + (b - a) * t


def reflect(w: V3, n: V3) -> V3:
    """Mirror w about n (both unit); bxdf.cu:81-84."""
    d = dot(w, n)
    return normalize(V3(-w.x + 2.0 * d * n.x, -w.y + 2.0 * d * n.y, -w.z + 2.0 * d * n.z))


def refract(w: V3, n: V3, ior_i, ior_t):
    """Snell refraction; returns (wt, ok); bxdf.cu:86-94."""
    eta = ior_i / ior_t
    wn = dot(w, n)
    th = V3(
        -eta * (w.x - wn * n.x),
        -eta * (w.y - wn * n.y),
        -eta * (w.z - wn * n.z),
    )
    th2 = dot(th, th)
    ok = th2 <= 1.0
    tp = -jnp.sqrt(jnp.maximum(1.0 - th2, 0.0))
    return V3(th.x + tp * n.x, th.y + tp * n.y, th.z + tp * n.z), ok


def orthonormal_basis(n: V3):
    """Duff et al. 2017 branchless ONB (math.cu:7-17)."""
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    tangent = V3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    bitangent = V3(b, sign + n.y * n.y * a, -n.y)
    return tangent, bitangent


def world_to_local(v: V3, t: V3, n: V3, b: V3) -> V3:
    """World direction -> local (+Y = n) frame (math.cu:19-25)."""
    return V3(dot(v, t), dot(v, n), dot(v, b))


def local_to_world(v: V3, t: V3, n: V3, b: V3) -> V3:
    return V3(
        v.x * t.x + v.y * n.x + v.z * b.x,
        v.x * t.y + v.y * n.y + v.z * b.y,
        v.x * t.z + v.y * n.z + v.z * b.z,
    )


def rgb_to_luminance(c: V3):
    # math.cu:90-93
    return 0.2126729 * c.x + 0.7151522 * c.y + 0.0721750 * c.z


def is_finite3(v: V3):
    return jnp.isfinite(v.x) & jnp.isfinite(v.y) & jnp.isfinite(v.z)


def _offset_component(p, n):
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    int_scale = 256.0
    of_i = (int_scale * n).astype(jnp.int32)
    p_i32 = jax.lax.bitcast_convert_type(p.astype(jnp.float32), jnp.int32)
    shifted = jnp.where(p < 0.0, p_i32 - of_i, p_i32 + of_i)
    p_shift = jax.lax.bitcast_convert_type(shifted, jnp.float32)
    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_shift)


def ray_origin_offset(p: V3, n: V3) -> V3:
    """Robust ray-origin offset (Ray Tracing Gems ch.6; pt.cu:401-416)."""
    return V3(
        _offset_component(p.x, n.x),
        _offset_component(p.y, n.y),
        _offset_component(p.z, n.z),
    )
