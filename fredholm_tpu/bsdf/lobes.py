"""BxDF lobes, vectorized over wavefront batches.

TPU-native re-implementation of /root/reference/fredholm/modules/bxdf.cu:
Lambert, Oren-Nayar, diffuse transmission (flipped Oren-Nayar BTDF), GGX
microfacet reflection with dielectric/conductor fresnel (VNDF sampling),
Walter07 rough dielectric transmission with TIR fallback, and the
Estevez-Kulla production sheen lobe. Local frames have +Y as the shading
normal. Every function maps over [..., 3] direction batches; lobe parameters
are [...]-shaped (per-lane) arrays, so one call shades the whole wavefront.

Each lobe exposes eval(...), sample(...), pdf(...); sample returns
(wi, f, pdf) like the reference's `sample(wo, u, f, pdf)`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import dot, normalize, reflect, refract, splat
from ..sampling.mappings import (
    sample_cosine_weighted_hemisphere,
    sample_vndf,
)
from .fresnel import fresnel_airy, fresnel_conductor, fresnel_dielectric

INV_PI = 1.0 / jnp.pi


# ---------------------------------------------------------------------------
# shading-frame trig (bxdf.cu:9-79); +Y is the normal


def cos_theta(w):
    return w[..., 1]


def abs_cos_theta(w):
    return jnp.abs(w[..., 1])


def sin2_theta(w):
    return jnp.maximum(1.0 - w[..., 1] ** 2, 0.0)


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def abs_sin_theta(w):
    return sin_theta(w)


def sin_phi(w):
    return w[..., 2] / jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-20))


def cos_phi(w):
    return w[..., 0] / jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-20))


def roughness_to_alpha(roughness, anisotropy):
    """Imageworks remap (bxdf.cu:96-104); returns [..., 2]."""
    r2 = roughness * roughness
    return jnp.stack([r2 * (1.0 + anisotropy), r2 * (1.0 - anisotropy)], axis=-1)


# ---------------------------------------------------------------------------
# Lambert (bxdf.cu:119-148)


def lambert_eval(albedo, wo, wi):
    return albedo * INV_PI


def lambert_pdf(wo, wi):
    return abs_cos_theta(wi) * INV_PI


def lambert_sample(albedo, wo, u):
    wi = sample_cosine_weighted_hemisphere(u)
    return wi, lambert_eval(albedo, wo, wi), lambert_pdf(wo, wi)


# ---------------------------------------------------------------------------
# Oren-Nayar (bxdf.cu:151-205)


def _oren_nayar_core(albedo, roughness, wo, wi):
    sigma2 = roughness * roughness
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)

    s_theta_o = sin_theta(wo)
    s_theta_i = sin_theta(wi)
    both = (s_theta_i > 1e-4) & (s_theta_o > 1e-4)
    c = cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    c_max = jnp.where(both, jnp.maximum(c, 0.0), 0.0)

    use_i = abs_cos_theta(wi) > abs_cos_theta(wo)
    s_alpha = jnp.where(use_i, s_theta_o, s_theta_i)
    t_beta = jnp.where(
        use_i,
        s_theta_i / jnp.maximum(abs_cos_theta(wi), 1e-8),
        s_theta_o / jnp.maximum(abs_cos_theta(wo), 1e-8),
    )
    return albedo * ((a + b * c_max * s_alpha * t_beta) * INV_PI)[..., None]


def oren_nayar_eval(albedo, roughness, wo, wi):
    return _oren_nayar_core(albedo, roughness, wo, wi)


def oren_nayar_pdf(wo, wi):
    return abs_cos_theta(wi) * INV_PI


def oren_nayar_sample(albedo, roughness, wo, u):
    wi = sample_cosine_weighted_hemisphere(u)
    return wi, oren_nayar_eval(albedo, roughness, wo, wi), oren_nayar_pdf(wo, wi)


# ---------------------------------------------------------------------------
# Diffuse transmission: Oren-Nayar flipped about the normal (bxdf.cu:209-264)


def diffuse_transmission_eval(albedo, roughness, wo, wi):
    return _oren_nayar_core(albedo, roughness, wo, wi)


def diffuse_transmission_pdf(wo, wi):
    return abs_cos_theta(wi) * INV_PI


def diffuse_transmission_sample(albedo, roughness, wo, u):
    wi = -sample_cosine_weighted_hemisphere(u)
    return (
        wi,
        diffuse_transmission_eval(albedo, roughness, wo, wi),
        diffuse_transmission_pdf(wo, wi),
    )


# ---------------------------------------------------------------------------
# GGX common (bxdf.cu:484-512 etc.)


def ggx_d(wh, alpha):
    ax = alpha[..., 0]
    ay = alpha[..., 1]
    t = (
        wh[..., 0] ** 2 / jnp.maximum(ax * ax, 1e-12)
        + wh[..., 2] ** 2 / jnp.maximum(ay * ay, 1e-12)
        + wh[..., 1] ** 2
    )
    return 1.0 / (jnp.pi * ax * ay * t * t)


def ggx_lambda(w, alpha):
    ax = alpha[..., 0]
    ay = alpha[..., 1]
    t = (ax * ax * w[..., 0] ** 2 + ay * ay * w[..., 2] ** 2) / jnp.maximum(
        w[..., 1] ** 2, 1e-12
    )
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + t))


def ggx_g1(w, alpha):
    return 1.0 / (1.0 + ggx_lambda(w, alpha))


def ggx_g2(wo, wi, alpha):
    return 1.0 / (1.0 + ggx_lambda(wo, alpha) + ggx_lambda(wi, alpha))


def ggx_d_visible(w, wh, alpha):
    return (
        ggx_g1(w, alpha)
        * jnp.abs(dot(w, wh))
        * ggx_d(wh, alpha)
        / jnp.maximum(abs_cos_theta(w), 1e-8)
    )


# ---------------------------------------------------------------------------
# Microfacet reflection, dielectric fresnel (bxdf.cu:428-518)


def microfacet_reflection_dielectric_eval(ior, alpha, wo, wi):
    wh = normalize(wo + wi, eps=1e-20)
    f = fresnel_dielectric(jnp.abs(dot(wo, wh)), ior)
    d = ggx_d(wh, alpha)
    g = ggx_g2(wo, wi, alpha)
    denom = jnp.maximum(abs_cos_theta(wo) * abs_cos_theta(wi), 1e-8)
    return splat(0.25 * f * d * g / denom)


def microfacet_reflection_dielectric_pdf(alpha, wo, wi):
    wh = normalize(wo + wi, eps=1e-20)
    return 0.25 * ggx_d_visible(wo, wh, alpha) / jnp.maximum(
        jnp.abs(dot(wo, wh)), 1e-8
    )


def microfacet_reflection_dielectric_sample(ior, alpha, wo, u):
    wh = sample_vndf(wo, alpha, u)
    wi = reflect(wo, wh)
    f = microfacet_reflection_dielectric_eval(ior, alpha, wo, wi)
    pdf = microfacet_reflection_dielectric_pdf(alpha, wo, wi)
    return wi, f, pdf


# ---------------------------------------------------------------------------
# Microfacet reflection with thin-film Airy fresnel (bxdf.cu:428-457 with
# thin_film_thickness > 0). Spectral (RGB) fresnel; per-lane thickness 0
# falls back to the plain dielectric term so mixed wavefronts are exact.


def microfacet_reflection_thinfilm_eval(
    ior, tf_ior, tf_thickness, alpha, wo, wi
):
    wh = normalize(wo + wi, eps=1e-20)
    cos_wh = jnp.abs(dot(wo, wh))
    f_airy = fresnel_airy(
        cos_wh,
        jnp.ones_like(cos_wh),
        tf_ior,
        tf_thickness,
        splat(jnp.broadcast_to(ior, cos_wh.shape)),
        jnp.zeros(cos_wh.shape + (3,)),
    )
    f_plain = splat(fresnel_dielectric(cos_wh, ior))
    f = jnp.where((tf_thickness > 0.0)[..., None], f_airy, f_plain)
    d = ggx_d(wh, alpha)
    g = ggx_g2(wo, wi, alpha)
    denom = jnp.maximum(abs_cos_theta(wo) * abs_cos_theta(wi), 1e-8)
    return f * (0.25 * d * g / denom)[..., None]


def microfacet_reflection_thinfilm_sample(
    ior, tf_ior, tf_thickness, alpha, wo, u
):
    wh = sample_vndf(wo, alpha, u)
    wi = reflect(wo, wh)
    f = microfacet_reflection_thinfilm_eval(
        ior, tf_ior, tf_thickness, alpha, wo, wi
    )
    pdf = microfacet_reflection_dielectric_pdf(alpha, wo, wi)
    return wi, f, pdf


# ---------------------------------------------------------------------------
# Microfacet reflection, conductor fresnel (bxdf.cu:522-611)


def microfacet_reflection_conductor_eval(ior3, k3, alpha, wo, wi):
    wh = normalize(wo + wi, eps=1e-20)
    f = fresnel_conductor(jnp.abs(dot(wo, wh)), ior3, k3)
    d = ggx_d(wh, alpha)
    g = ggx_g2(wo, wi, alpha)
    denom = jnp.maximum(abs_cos_theta(wo) * abs_cos_theta(wi), 1e-8)
    return 0.25 * f * (d * g / denom)[..., None]


def microfacet_reflection_conductor_pdf(alpha, wo, wi):
    return microfacet_reflection_dielectric_pdf(alpha, wo, wi)


def microfacet_reflection_conductor_sample(ior3, k3, alpha, wo, u):
    wh = sample_vndf(wo, alpha, u)
    wi = reflect(wo, wh)
    f = microfacet_reflection_conductor_eval(ior3, k3, alpha, wo, wi)
    pdf = microfacet_reflection_conductor_pdf(alpha, wo, wi)
    return wi, f, pdf


# ---------------------------------------------------------------------------
# Microfacet transmission, Walter 2007 (bxdf.cu:615-740)


def _transmission_half_vector(ior_i, ior_t, wo, wi):
    wh = normalize(-(ior_i[..., None] * wo + ior_t[..., None] * wi), eps=1e-20)
    return jnp.where((wh[..., 1] < 0.0)[..., None], -wh, wh)


def microfacet_transmission_eval(ior_i, ior_t, alpha, wo, wi):
    wh = _transmission_half_vector(ior_i, ior_t, wo, wi)
    f = fresnel_dielectric(jnp.abs(dot(wo, wh)), ior_t / ior_i)
    d = ggx_d(wh, alpha)
    g = ggx_g2(wo, wi, alpha)
    wo_dot_wh = dot(wo, wh)
    wi_dot_wh = dot(wi, wh)
    t = ior_i * wo_dot_wh + ior_t * wi_dot_wh
    denom = jnp.maximum(
        abs_cos_theta(wo) * abs_cos_theta(wi) * t * t, 1e-10
    )
    val = (
        jnp.abs(wo_dot_wh)
        * jnp.abs(wi_dot_wh)
        * ior_t
        * ior_t
        * jnp.maximum(1.0 - f, 0.0)
        * g
        * d
        / denom
    )
    return splat(val)


def microfacet_transmission_pdf(ior_i, ior_t, alpha, wo, wi):
    wh = _transmission_half_vector(ior_i, ior_t, wo, wi)
    wi_dot_wh = dot(wi, wh)
    t = ior_i * dot(wo, wh) + ior_t * wi_dot_wh
    return (
        ggx_d_visible(wo, wh, alpha)
        * ior_t
        * ior_t
        * jnp.abs(wi_dot_wh)
        / jnp.maximum(t * t, 1e-10)
    )


def microfacet_transmission_sample(ior_i, ior_t, alpha, wo, u):
    wh = sample_vndf(wo, alpha, u)
    wt, ok = refract(wo, wh, ior_i, ior_t)

    # total internal reflection fallback (bxdf.cu:659-679)
    wr = reflect(wo, wh)
    fr = fresnel_dielectric(jnp.abs(dot(wo, wh)), ior_t / ior_i)
    d = ggx_d(wh, alpha)
    g_r = ggx_g2(wo, wr, alpha)
    denom_r = jnp.maximum(abs_cos_theta(wo) * abs_cos_theta(wr), 1e-8)
    f_tir = splat(0.25 * fr * d * g_r / denom_r)
    pdf_tir = 0.25 * ggx_d_visible(wo, wh, alpha) / jnp.maximum(
        jnp.abs(dot(wr, wh)), 1e-8
    )

    f_t = microfacet_transmission_eval(ior_i, ior_t, alpha, wo, wt)
    pdf_t = microfacet_transmission_pdf(ior_i, ior_t, alpha, wo, wt)

    wi = jnp.where(ok[..., None], wt, wr)
    f = jnp.where(ok[..., None], f_t, f_tir)
    pdf = jnp.where(ok, pdf_t, pdf_tir)
    return wi, f, pdf


# ---------------------------------------------------------------------------
# Production sheen (Estevez & Kulla 2017; bxdf.cu:743-822)


def _sheen_l(x, roughness):
    def interp(p0, p1):
        t = 1.0 - roughness
        t2 = t * t
        return t2 * p0 + (1.0 - t2) * p1

    a = interp(25.3245, 21.5473)
    b = interp(3.32435, 3.82987)
    c = interp(0.16801, 0.19823)
    d = interp(-1.27393, -1.97760)
    e = interp(-4.85967, -4.32054)
    return a / (1.0 + b * jnp.power(jnp.maximum(x, 1e-8), c)) + d * x + e


def _sheen_lambda(w, roughness):
    cos = abs_cos_theta(w)
    return jnp.where(
        cos < 0.5,
        jnp.exp(_sheen_l(cos, roughness)),
        jnp.exp(2.0 * _sheen_l(0.5, roughness) - _sheen_l(1.0 - cos, roughness)),
    )


def sheen_d(wh, roughness):
    s = abs_sin_theta(wh)
    inv_r = 1.0 / jnp.maximum(roughness, 1e-4)
    return (2.0 + inv_r) * jnp.power(jnp.maximum(s, 1e-8), inv_r) / (2.0 * jnp.pi)


def sheen_eval(roughness, wo, wi):
    wh = normalize(wo + wi, eps=1e-20)
    d = sheen_d(wh, roughness)
    g = 1.0 / (1.0 + _sheen_lambda(wo, roughness) + _sheen_lambda(wi, roughness))
    denom = jnp.maximum(abs_cos_theta(wo) * abs_cos_theta(wi), 1e-8)
    return splat(0.25 * d * g / denom)


def sheen_pdf(wo, wi):
    return abs_cos_theta(wi) * INV_PI


def sheen_sample(roughness, wo, u):
    wh = sample_cosine_weighted_hemisphere(u)
    wi = reflect(wo, wh)
    return wi, sheen_eval(roughness, wo, wi), sheen_pdf(wo, wi)
