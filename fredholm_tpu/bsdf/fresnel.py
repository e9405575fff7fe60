"""Fresnel terms: Schlick, dielectric, conductor, artist-friendly metallic,
polarized variants and Airy thin-film interference.

TPU-native re-implementation of /root/reference/fredholm/modules/bxdf.cu
:107-116, :267-424 (Gulbrandsen 2014 artist fresnel; Belcour & Barla 2017
thin-film). Vectorized over [...]-shaped batches; colors are [..., 3].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import xyz_to_rgb


def fresnel_schlick(cos, f0):
    """bxdf.cu:267-271."""
    t = jnp.maximum(1.0 - cos, 0.0)
    return f0 + jnp.maximum(1.0 - f0, 0.0) * t**5


def fresnel_dielectric(cos, ior):
    """Exact unpolarized dielectric fresnel (bxdf.cu:274-283).

    `ior` is the relative IOR eta_t/eta_i; cos is |cos| at the interface.
    Returns 1 under total internal reflection.
    """
    temp = ior * ior + cos * cos - 1.0
    g = jnp.sqrt(jnp.maximum(temp, 0.0))
    t0 = (g - cos) / (g + cos)
    t1 = ((g + cos) * cos - 1.0) / ((g - cos) * cos + 1.0)
    fr = 0.5 * t0 * t0 * (1.0 + t1 * t1)
    return jnp.where(temp < 0.0, 1.0, fr)


def fresnel_conductor(cos, ior, k):
    """Unpolarized conductor fresnel (bxdf.cu:286-299); ior/k are [..., 3]."""
    cos = cos[..., None] if jnp.ndim(cos) < jnp.ndim(ior) else cos
    c2 = cos * cos
    two_eta_cos = 2.0 * ior * cos
    t0 = ior * ior + k * k
    t1 = t0 * c2
    rs = (t0 - two_eta_cos + c2) / (t0 + two_eta_cos + c2)
    rp = (t1 - two_eta_cos + 1.0) / (t1 + two_eta_cos + 1.0)
    return 0.5 * (rp + rs)


def artist_friendly_metallic_fresnel(reflectivity, edge_tint):
    """Gulbrandsen 2014 (bxdf.cu:107-116): map artist (reflectivity, edge
    tint) colors to physical (n, k)."""
    r = jnp.clip(reflectivity, 0.0, 0.99)
    g = edge_tint
    r_sqrt = jnp.sqrt(r)
    n = g * (1.0 - r) / (1.0 + r) + (1.0 - g) * (1.0 + r_sqrt) / (1.0 - r_sqrt)
    t1 = n + 1.0
    t2 = n - 1.0
    k = jnp.sqrt(jnp.maximum((r * (t1 * t1) - t2 * t2) / (1.0 - r), 0.0))
    return n, k


# ---------------------------------------------------------------------------
# polarized fresnel + thin film (Belcour & Barla 2017), bxdf.cu:301-424


def fresnel_dielectric_polarized(cos, ior1, ior2):
    """Returns (R_p, R_s, phi_p, phi_s); bxdf.cu:301-323."""
    sin2 = 1.0 - cos * cos
    eta = ior1 / ior2
    tir = eta * eta * sin2 > 1.0

    # TIR phases
    inv_eta2 = 1.0 / jnp.maximum(eta * eta, 1e-12)
    s = jnp.sqrt(jnp.maximum(sin2 - inv_eta2, 0.0))
    phi_p_tir = 2.0 * jnp.arctan(-eta * eta * s / jnp.maximum(cos, 1e-12))
    phi_s_tir = 2.0 * jnp.arctan(-s / jnp.maximum(cos, 1e-12))

    cos2 = jnp.sqrt(jnp.maximum(1.0 - eta * eta * sin2, 0.0))
    r_p = (ior2 * cos - ior1 * cos2) / jnp.maximum(ior2 * cos + ior1 * cos2, 1e-12)
    r_s = (ior1 * cos - ior2 * cos2) / jnp.maximum(ior1 * cos + ior2 * cos2, 1e-12)
    rp2 = r_p * r_p
    rs2 = r_s * r_s
    phi_p = jnp.where(r_p < 0.0, jnp.pi, 0.0)
    phi_s = jnp.where(r_s < 0.0, jnp.pi, 0.0)

    R_p = jnp.where(tir, 1.0, rp2)
    R_s = jnp.where(tir, 1.0, rs2)
    phi_p = jnp.where(tir, phi_p_tir, phi_p)
    phi_s = jnp.where(tir, phi_s_tir, phi_s)
    return R_p, R_s, phi_p, phi_s


def fresnel_conductor_polarized(cos, ior1, ior2, k2):
    """Returns (R_p, R_s, phi_p, phi_s) as [..., 3]; bxdf.cu:325-354.

    ior1 may be a per-lane [...] array (thin-film wiring passes the film
    IOR per material); it is lifted to [..., 1] so every product with the
    [..., 3] layer parameters broadcasts element-wise, never outer."""
    cos_ = cos[..., None]
    ior1 = jnp.broadcast_to(jnp.asarray(ior1), cos.shape)[..., None]
    a = ior2 * ior2 * (1.0 - k2 * k2) - ior1 * ior1 * (1.0 - cos_ * cos_)
    b = jnp.sqrt(jnp.maximum(a * a + (2.0 * ior2 * ior2 * k2) ** 2, 0.0))
    u = jnp.sqrt(jnp.maximum(0.5 * (a + b), 0.0))
    v = jnp.sqrt(jnp.maximum(0.5 * (b - a), 0.0))

    def sq(x):
        return x * x

    R_s = (sq(ior1 * cos_ - u) + v * v) / jnp.maximum(
        sq(ior1 * cos_ + u) + v * v, 1e-12
    )
    phi_s = jnp.arctan2(
        2.0 * ior1 * v * cos_, u * u + v * v - sq(ior1 * cos_)
    ) + jnp.pi
    R_p = (
        sq(ior2 * ior2 * (1.0 - k2 * k2) * cos_ - ior1 * u)
        + sq(2.0 * ior2 * ior2 * k2 * cos_ - ior1 * v)
    ) / jnp.maximum(
        sq(ior2 * ior2 * (1.0 - k2 * k2) * cos_ + ior1 * u)
        + sq(2.0 * ior2 * ior2 * k2 * cos_ + ior1 * v),
        1e-12,
    )
    phi_p = jnp.arctan2(
        2.0 * ior1 * ior2 * ior2 * cos_ * (2.0 * k2 * u - (1.0 - k2 * k2) * v),
        sq(ior2 * ior2 * (1.0 + k2 * k2) * cos_) - ior1 * ior1 * (u * u + v * v),
    )

    # pure-dielectric layers fall back to the scalar polarized formula
    is_dielectric = jnp.all(k2 == 0.0, axis=-1)
    dp, ds, dphi_p, dphi_s = fresnel_dielectric_polarized(
        cos, ior1[..., 0], ior2[..., 0]
    )
    R_p = jnp.where(is_dielectric[..., None], dp[..., None], R_p)
    R_s = jnp.where(is_dielectric[..., None], ds[..., None], R_s)
    phi_p = jnp.where(is_dielectric[..., None], dphi_p[..., None], phi_p)
    phi_s = jnp.where(is_dielectric[..., None], dphi_s[..., None], phi_s)
    return R_p, R_s, phi_p, phi_s


def _eval_sensitivity(opd, shift):
    """Spectral sensitivity of the CIE observer as 3 gaussians in OPD space
    (bxdf.cu:357-371); opd: [...], shift: [..., 3]."""
    phase = 2.0 * jnp.pi * opd[..., None]
    val = jnp.asarray([5.4856e-13, 4.4201e-13, 5.2481e-13])
    pos = jnp.asarray([1.6810e6, 1.7953e6, 2.2084e6])
    var = jnp.asarray([4.3278e9, 9.3046e9, 6.6121e9])
    xyz = (
        val
        * jnp.sqrt(2.0 * jnp.pi * var)
        * jnp.cos(pos * phase + shift)
        * jnp.exp(-var * phase * phase)
    )
    x_extra = (
        9.7470e-14
        * jnp.sqrt(2.0 * jnp.pi * 4.5282e9)
        * jnp.cos(2.2399e6 * phase[..., 0] + shift[..., 0])
        * jnp.exp(-4.5282e9 * phase[..., 0] * phase[..., 0])
    )
    xyz = xyz.at[..., 0].add(x_extra) if hasattr(xyz, "at") else xyz
    xyz = xyz / 1.0685e-7
    return xyz_to_rgb(xyz)


def fresnel_airy(cos, ior1, ior2, thickness_nm, ior3, k3):
    """Airy thin-film interference reflectance (bxdf.cu:375-424).

    cos: [...]; ior1, ior2, thickness_nm: scalars or [...];
    ior3, k3: [..., 3]. Returns [..., 3] in [0, 1].
    """
    R12p, R12s, phi12p, phi12s = fresnel_dielectric_polarized(cos, ior1, ior2)
    T12p = 1.0 - R12p
    T12s = 1.0 - R12s

    s1 = 1.0 - cos * cos
    eta = ior1 / ior2
    c2 = jnp.sqrt(jnp.maximum(1.0 - eta * eta * s1, 0.0))

    phi21p = jnp.pi - phi12p
    phi21s = jnp.pi - phi12s

    R23p, R23s, phi23p, phi23s = fresnel_conductor_polarized(cos, ior2, ior3, k3)

    opd = 2.0 * ior2 * (thickness_nm * 1e-9) * c2
    phi2p = phi21p[..., None] + phi23p
    phi2s = phi21s[..., None] + phi23s

    T121p = (T12p * T12p)[..., None]
    Rsp = T121p * R23p / jnp.maximum(1.0 - R23p * R12p[..., None], 1e-12)
    T121s = (T12s * T12s)[..., None]
    Rss = T121s * R23s / jnp.maximum(1.0 - R23s * R12s[..., None], 1e-12)

    I = R12p[..., None] + Rsp + R12s[..., None] + Rss

    cmp_ = Rsp - jnp.sqrt(T121p)
    cms = Rss - jnp.sqrt(T121s)
    for m in range(1, 4):
        cmp_ = cmp_ * jnp.sqrt(jnp.maximum(R23p * R12p[..., None], 0.0))
        cms = cms * jnp.sqrt(jnp.maximum(R23s * R12s[..., None], 0.0))
        sp = 2.0 * _eval_sensitivity(m * opd, m * phi2p)
        ss = 2.0 * _eval_sensitivity(m * opd, m * phi2s)
        I = I + (cmp_ * sp + cms * ss)

    I = 0.5 * I
    return jnp.clip(I, 0.0, 1.0)
