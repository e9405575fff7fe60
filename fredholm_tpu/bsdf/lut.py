"""Directional-albedo lookup tables for energy-based lobe weighting.

Capability equivalent of /root/reference/fredholm/modules/lut.cu: a 16x16
GGX reflection table split into (F0=1, Schlick-tail) channels, a 16^3
reflection table for eta<1, and a 16x16 sheen table, with the same
truncate-then-bilinear fetch (lut.cu:965-1081). The reference embeds ~1000
lines of precomputed values; we instead *compute* the tables by Monte Carlo
integration of our own lobe implementations (tools/gen_luts.py caches them
to assets/).

Derivation for the reflection split (lut.cu:985-994): with Schlick fresnel,
E(wo; F0) = F0 * R + (1 - F0) * G where
  R = E_vndf[ G2/G1 ]               (fresnel == 1)
  G = E_vndf[ (1-|wo.wh|)^5 G2/G1 ] (Schlick tail)
since f*cos/pdf_vndf = F * G2/G1 under VNDF sampling.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

LUT_SIZE = 16
_N_SAMPLES = 4096
_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")
_REFLECTION_PATH = os.path.join(_ASSET_DIR, "lut_reflection.npy")
_REFLECTION_IOR1_PATH = os.path.join(_ASSET_DIR, "lut_reflection_ior1.npy")
_SHEEN_PATH = os.path.join(_ASSET_DIR, "lut_sheen.npy")


def _hammersley(n):
    i = np.arange(n)
    u0 = (i + 0.5) / n
    u1 = np.zeros(n)
    f = 0.5
    k = i.copy()
    while k.max() > 0:
        u1 += f * (k & 1)
        k >>= 1
        f *= 0.5
    return np.stack([u0, u1], -1).astype(np.float32)


def _grid_wo_alpha(size: int, n_samples: int):
    """Broadcast (cell, sample) batch: wo [size*size, 1, 3],
    alpha [size*size, 1, 2], u [1, n_samples, 2]."""
    from .lobes import roughness_to_alpha

    cos_o = (np.arange(size) + 0.5) / size
    rough = np.maximum((np.arange(size) + 0.5) / size, 0.01)
    co, rr = np.meshgrid(cos_o, rough, indexing="ij")
    co = co.reshape(-1)
    rr = rr.reshape(-1)
    sin_o = np.sqrt(np.maximum(1.0 - co * co, 0.0))
    wo = np.stack([sin_o, co, np.zeros_like(co)], -1).astype(np.float32)
    alpha = np.asarray(
        roughness_to_alpha(jnp.asarray(rr, jnp.float32), jnp.float32(0.0))
    )
    u = _hammersley(n_samples)
    return (
        jnp.asarray(wo)[:, None, :],
        jnp.asarray(alpha)[:, None, :],
        jnp.asarray(u)[None, :, :],
    )


def _vndf_weights_grid(size: int, n_samples: int):
    """VNDF sample weights for the whole (cos_o, roughness) grid at once;
    returns (w [C, S], cos_wh [C, S]) with C = size*size."""
    from ..sampling.mappings import sample_vndf
    from .lobes import ggx_g1, ggx_g2
    from ..core.vecmath import reflect

    wo, alpha, u = _grid_wo_alpha(size, n_samples)
    wo_b = jnp.broadcast_to(wo, (wo.shape[0], n_samples, 3))
    alpha_b = jnp.broadcast_to(alpha, (wo.shape[0], n_samples, 2))
    u_b = jnp.broadcast_to(u, (wo.shape[0], n_samples, 2))
    wh = sample_vndf(wo_b, alpha_b, u_b)
    wi = reflect(wo_b, wh)
    w = ggx_g2(wo_b, wi, alpha_b) / jnp.maximum(ggx_g1(wo_b, alpha_b), 1e-8)
    # reflections below the horizon carry no energy
    w = jnp.where(wi[..., 1] > 0.0, w, 0.0)
    cos_wh = jnp.abs(jnp.sum(wo_b * wh, -1))
    return np.asarray(w), np.asarray(cos_wh)


def compute_reflection_lut(size: int = LUT_SIZE, n_samples: int = _N_SAMPLES):
    """[size, size, 2] float32: R (F0=1) and G (Schlick tail) channels over
    (cos_theta_o, roughness)."""
    w, cos_wh = _vndf_weights_grid(size, n_samples)
    r = w.mean(-1).reshape(size, size)
    g = (w * (1.0 - cos_wh) ** 5).mean(-1).reshape(size, size)
    return np.stack([r, g], -1).astype(np.float32)


def compute_reflection_ior1_lut(size: int = LUT_SIZE, n_samples: int = 1024):
    """[size, size, size] float32 over (cos_theta_o, roughness, eta<1):
    directional albedo of GGX reflection with true dielectric fresnel
    evaluated from the dense side (lut.cu reflection-at-eta<1 table)."""
    from .fresnel import fresnel_dielectric

    w, cos_wh = _vndf_weights_grid(size, n_samples)
    out = np.zeros((size, size, size), np.float32)
    for k in range(size):
        eta = max((k + 0.5) / size, 0.05)
        fr = np.asarray(
            fresnel_dielectric(jnp.asarray(cos_wh), jnp.float32(eta))
        )
        out[:, :, k] = (w * fr).mean(-1).reshape(size, size)
    return out


def compute_sheen_lut(size: int = LUT_SIZE, n_samples: int = _N_SAMPLES):
    """[size, size] float32 sheen directional albedo over
    (cos_theta_o, roughness): E_cosine[pi * f_sheen]."""
    from ..sampling.mappings import sample_cosine_weighted_hemisphere
    from .lobes import sheen_eval

    u = _hammersley(n_samples)
    wi = sample_cosine_weighted_hemisphere(jnp.asarray(u))[None, :, :]
    cos_o = (np.arange(size) + 0.5) / size
    rough = np.maximum((np.arange(size) + 0.5) / size, 0.01)
    co, rr = np.meshgrid(cos_o, rough, indexing="ij")
    co = co.reshape(-1)
    sin_o = np.sqrt(np.maximum(1.0 - co * co, 0.0))
    wo = jnp.asarray(
        np.stack([sin_o, co, np.zeros_like(co)], -1).astype(np.float32)
    )[:, None, :]
    n_cells = wo.shape[0]
    wo_b = jnp.broadcast_to(wo, (n_cells, n_samples, 3))
    wi_b = jnp.broadcast_to(wi, (n_cells, n_samples, 3))
    rr_b = jnp.asarray(rr.reshape(-1, 1).astype(np.float32))
    f = sheen_eval(jnp.broadcast_to(rr_b, (n_cells, n_samples)), wo_b, wi_b)
    return np.asarray(
        np.pi * np.asarray(f[..., 0]).mean(-1).reshape(size, size)
    ).astype(np.float32)


def _load_or_compute(path, fn):
    if os.path.exists(path):
        return np.load(path)
    table = fn()
    try:
        np.save(path, table)
    except OSError:
        pass
    return table


_reflection = None
_reflection_ior1 = None
_sheen = None


# NOTE: cache host numpy arrays and convert per call — caching a jnp array
# created inside a traced context would leak a tracer into module state.


def reflection_lut_np() -> np.ndarray:
    """Host-side table (for code that bakes it into kernels as constants)."""
    global _reflection
    if _reflection is None:
        _reflection = _load_or_compute(_REFLECTION_PATH, compute_reflection_lut)
    return _reflection


def reflection_lut():
    return jnp.asarray(reflection_lut_np())


def reflection_ior1_lut():
    global _reflection_ior1
    if _reflection_ior1 is None:
        _reflection_ior1 = _load_or_compute(
            _REFLECTION_IOR1_PATH, compute_reflection_ior1_lut
        )
    return jnp.asarray(_reflection_ior1)


def sheen_lut_np() -> np.ndarray:
    """Host-side table (for code that bakes it into kernels as constants)."""
    global _sheen
    if _sheen is None:
        _sheen = _load_or_compute(_SHEEN_PATH, compute_sheen_lut)
    return _sheen


def sheen_lut():
    return jnp.asarray(sheen_lut_np())


# ---------------------------------------------------------------------------
# fetches (bilinear with truncated base index, lut.cu:965-983)


def _bilinear_fetch_2d(table, u, v):
    size = table.shape[0]
    i = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
    j = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
    i1 = jnp.minimum(i + 1, size - 1)
    j1 = jnp.minimum(j + 1, size - 1)
    hx = u * size - i
    hy = v * size - j
    t0 = table[i, j]
    t1 = table[i1, j]
    t2 = table[i, j1]
    t3 = table[i1, j1]
    if table.ndim == 3:
        hx = hx[..., None]
        hy = hy[..., None]
    tx0 = (1.0 - hx) * t0 + hx * t1
    tx1 = (1.0 - hx) * t2 + hx * t3
    return (1.0 - hy) * tx0 + hy * tx1


def compute_directional_albedo_reflection(wo, roughness, f0):
    """lut.cu:985-994: albedo = F0*R + (1-F0)*G at (|wo.y|, roughness)."""
    u = jnp.abs(wo[..., 1])
    v = jnp.clip(roughness, 0.0, 1.0)
    rg = _bilinear_fetch_2d(reflection_lut(), u, v)
    return f0 * rg[..., 0] + (1.0 - f0) * rg[..., 1]


def compute_directional_albedo_reflection_ior1(wo, roughness, eta):
    """Trilinear fetch of the eta<1 table (lut.cu:1038-1053)."""
    table = reflection_ior1_lut()
    size = table.shape[0]
    u = jnp.abs(wo[..., 1])
    v = jnp.clip(roughness, 0.0, 1.0)
    z = jnp.clip(eta, 0.0, 1.0)

    def idx(x):
        i = jnp.clip((x * size).astype(jnp.int32), 0, size - 1)
        return i, jnp.minimum(i + 1, size - 1), x * size - i

    i, i1, hx = idx(u)
    j, j1, hy = idx(v)
    k, k1, hz = idx(z)
    c000 = table[i, j, k]
    c100 = table[i1, j, k]
    c010 = table[i, j1, k]
    c110 = table[i1, j1, k]
    c001 = table[i, j, k1]
    c101 = table[i1, j, k1]
    c011 = table[i, j1, k1]
    c111 = table[i1, j1, k1]
    c00 = c000 * (1 - hx) + c100 * hx
    c01 = c001 * (1 - hx) + c101 * hx
    c10 = c010 * (1 - hx) + c110 * hx
    c11 = c011 * (1 - hx) + c111 * hx
    c0 = c00 * (1 - hy) + c10 * hy
    c1 = c01 * (1 - hy) + c11 * hy
    return c0 * (1 - hz) + c1 * hz


def compute_directional_albedo_sheen(wo, roughness):
    """lut.cu:1075-1081."""
    u = jnp.abs(wo[..., 1])
    v = jnp.clip(roughness, 0.0, 1.0)
    return _bilinear_fetch_2d(sheen_lut(), u, v)
