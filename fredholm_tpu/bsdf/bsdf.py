"""Arnold-Standard-Surface-style layered BSDF, vectorized over a wavefront.

TPU-native re-implementation of /root/reference/fredholm/modules/bsdf.cu:
seven lobes (coat, metal, specular, transmission, sheen, diffuse
transmission, diffuse reflection) with directional-albedo-based energy
weights, multiplicative layer attenuation, and discrete lobe selection for
sampling. Where the reference evaluates lobes behind `if` guards, we
evaluate all lobes masked — the idiomatic divergence-free TPU form, matching
the always-eval-weighted structure of bsdf.cu:129-211.

API:
  ctx = setup(wo, sp, is_entering)   # per-wavefront precomputation (ctor)
  f = eval(ctx, wo, wi)              # [N, 3]
  wi, f, pdf = sample(ctx, wo, u, v) # lobe-select + per-lobe sample
  pdf = eval_pdf(ctx, wo, wi)        # [N]

`sp` is a ShadingParams dict of [N]/[N,3] arrays (shared.h:173-199 fields).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..core.vecmath import lerp, rgb_to_luminance
from ..sampling.mappings import discrete_sample_cdf
from . import lobes
from .fresnel import artist_friendly_metallic_fresnel
from .lut import (
    compute_directional_albedo_reflection,
    compute_directional_albedo_sheen,
)

N_LOBES = 7


def _sanitize3(v):
    return jnp.where(jnp.isfinite(v), v, 0.0)


def _sanitize1(v):
    return jnp.where(jnp.isfinite(v), v, 0.0)


ALL_LOBES = ("coat", "metal", "specular", "transmission", "sheen",
             "diffuse_t", "diffuse_r")


def setup(wo, sp: Dict, is_entering, lobes_on=ALL_LOBES,
          energy_conserving_coat: bool = False) -> Dict:
    """BSDF 'constructor' (bsdf.cu:11-127).

    `lobes_on` is a STATIC tuple naming the lobes any material in the scene
    can activate; the host derives it from material parameters so scenes
    that never use e.g. transmission skip that lobe's code entirely — the
    static analog of the reference's per-thread zero-weight guards
    (bsdf.cu:129-176).
    """
    ni = jnp.where(is_entering, 1.0, 1.5)
    nt = jnp.where(is_entering, 1.5, 1.0)
    eta = nt / ni

    on = frozenset(lobes_on)
    coat_lum = rgb_to_luminance(sp["coat_color"])
    spec_lum = rgb_to_luminance(sp["specular_color"])
    sheen_lum = rgb_to_luminance(sp["sheen_color"])

    f0 = ((nt - ni) / (nt + ni)) ** 2
    zero = jnp.zeros_like(sp["coat"])
    coat_albedo = (
        jnp.where(
            (sp["coat"] * coat_lum > 0.0) & is_entering,
            compute_directional_albedo_reflection(wo, sp["coat_roughness"], f0),
            0.0,
        )
        if "coat" in on
        else zero
    )
    spec_albedo = (
        jnp.where(
            (sp["specular"] * spec_lum > 0.0) & (eta >= 1.0),
            compute_directional_albedo_reflection(
                wo, sp["specular_roughness"], f0
            ),
            0.0,
        )
        if "specular" in on
        else zero
    )
    sheen_albedo = (
        jnp.where(
            (sp["sheen"] * sheen_lum > 0.0) & is_entering,
            compute_directional_albedo_sheen(wo, sp["sheen_roughness"]),
            0.0,
        )
        if "sheen" in on
        else zero
    )

    # NOTE: the reference computes the coat absorption color *before* the
    # coat directional albedo is filled in (bsdf.cu:27-30 reads the
    # zero-initialized member), so absorption = lerp(1, coat_color, coat)
    # and coated materials GAIN energy. Default reproduces that for image
    # parity; energy_conserving_coat applies the intended attenuation.
    absorb_albedo = coat_albedo if energy_conserving_coat else 0.0
    coat_absorption = lerp(
        jnp.ones_like(sp["coat_color"]),
        sp["coat_color"] * (1.0 - absorb_albedo)[..., None]
        if energy_conserving_coat
        else sp["coat_color"],
        sp["coat"][..., None],
    )

    # disable reflective lobes when evaluating from inside (bsdf.cu:56-62)
    coat = jnp.where(is_entering, sp["coat"], 0.0)
    metalness = jnp.where(is_entering, sp["metalness"], 0.0)
    specular = jnp.where(is_entering, sp["specular"], 0.0)
    sheen = jnp.where(is_entering, sp["sheen"], 0.0)
    diffuse = jnp.where(is_entering, sp["diffuse"], 0.0)

    # lobe weights (bsdf.cu:67-93)
    c = coat * coat_albedo
    s = specular * spec_albedo
    sh = sheen * sheen_albedo
    w0 = c
    w1 = (1.0 - c) * metalness
    w2 = (1.0 - c) * (1.0 - metalness) * s
    w3 = (1.0 - c) * (1.0 - metalness) * (1.0 - s) * sp["transmission"]
    w4 = (1.0 - c) * (1.0 - metalness) * (1.0 - s) * sh
    w5 = (
        (1.0 - c)
        * (1.0 - metalness)
        * (1.0 - s)
        * (1.0 - sp["transmission"])
        * (1.0 - sh)
        * sp["subsurface"]
        * sp["thin_walled"]
    )
    w6 = (
        (1.0 - c)
        * (1.0 - metalness)
        * (1.0 - s)
        * (1.0 - sp["transmission"])
        * (1.0 - sh)
        * (1.0 - sp["subsurface"])
        * diffuse
    )
    weights = jnp.stack([w0, w1, w2, w3, w4, w5, w6], axis=-1)
    total = jnp.sum(weights, axis=-1, keepdims=True)
    pmf = weights / jnp.where(total > 0.0, total, 1.0)

    if "metal" in on:
        metal_n, metal_k = artist_friendly_metallic_fresnel(
            jnp.clip(sp["base_color"], 0.0, 0.99),
            jnp.clip(sp["specular_color"], 0.0, 0.99),
        )
    else:
        metal_n = metal_k = jnp.ones_like(sp["base_color"])

    return {
        "lobes_on": on,
        "sp": {
            **sp,
            "coat": coat,
            "metalness": metalness,
            "specular": specular,
            "sheen": sheen,
            "diffuse": diffuse,
        },
        "ni": ni,
        "nt": nt,
        "eta": eta,
        "coat_lum": coat_lum,
        "spec_lum": spec_lum,
        "sheen_lum": sheen_lum,
        "coat_absorption": coat_absorption,
        "coat_albedo": coat_albedo,
        "spec_albedo": spec_albedo,
        "sheen_albedo": sheen_albedo,
        "pmf": pmf,
        "metal_n": metal_n,
        "metal_k": metal_k,
        "coat_alpha": lobes.roughness_to_alpha(
            sp["coat_roughness"], jnp.zeros_like(sp["coat_roughness"])
        ),
        "spec_alpha": lobes.roughness_to_alpha(
            sp["specular_roughness"], jnp.zeros_like(sp["specular_roughness"])
        ),
    }


def _lobe_evals(ctx, wo, wi):
    """All seven lobe values + pdfs at (wo, wi), guard-masked like
    bsdf.cu:129-176 / :295-339. Returns (f [N,7,3], pdf [N,7])."""
    sp = ctx["sp"]

    coat_on = sp["coat"] * ctx["coat_lum"] > 0.0
    metal_on = sp["metalness"] > 0.0
    spec_on = sp["specular"] * ctx["spec_lum"] > 0.0
    trans_on = sp["transmission"] > 0.0
    sheen_on = sp["sheen"] * ctx["sheen_lum"] > 0.0
    difft_on = sp["subsurface"] * sp["thin_walled"] > 0.0
    diffr_on = sp["diffuse"] > 0.0

    def gate3(on, v):
        return jnp.where(on[..., None], _sanitize3(v), 0.0)

    def gate1(on, v):
        return jnp.where(on, _sanitize1(v), 0.0)

    on = ctx["lobes_on"]
    z3 = jnp.zeros(wo.shape, wo.dtype)
    z1 = jnp.zeros(wo.shape[:-1], wo.dtype)

    if "coat" in on:
        f_coat = gate3(
            coat_on,
            lobes.microfacet_reflection_dielectric_eval(
                ctx["eta"], ctx["coat_alpha"], wo, wi
            ),
        )
        p_coat = gate1(
            coat_on,
            lobes.microfacet_reflection_dielectric_pdf(ctx["coat_alpha"], wo, wi),
        )
    else:
        f_coat, p_coat = z3, z1

    if "metal" in on:
        f_metal = gate3(
            metal_on,
            lobes.microfacet_reflection_conductor_eval(
                ctx["metal_n"], ctx["metal_k"], ctx["spec_alpha"], wo, wi
            ),
        )
        p_metal = gate1(
            metal_on,
            lobes.microfacet_reflection_conductor_pdf(ctx["spec_alpha"], wo, wi),
        )
    else:
        f_metal, p_metal = z3, z1

    if "specular" in on:
        if "thin_film" in on:
            # Airy interference fresnel on the specular lobe
            # (bxdf.cu:448-454); static-gated so film-free scenes compile
            # none of it
            f_spec_v = lobes.microfacet_reflection_thinfilm_eval(
                ctx["eta"], sp["thin_film_ior"], sp["thin_film_thickness"],
                ctx["spec_alpha"], wo, wi,
            )
        else:
            f_spec_v = lobes.microfacet_reflection_dielectric_eval(
                ctx["eta"], ctx["spec_alpha"], wo, wi
            )
        f_spec = gate3(spec_on, f_spec_v)
        p_spec = gate1(
            spec_on,
            lobes.microfacet_reflection_dielectric_pdf(ctx["spec_alpha"], wo, wi),
        )
    else:
        f_spec, p_spec = z3, z1

    if "transmission" in on:
        f_trans = gate3(
            trans_on,
            lobes.microfacet_transmission_eval(
                ctx["ni"], ctx["nt"], ctx["spec_alpha"], wo, wi
            ),
        )
        p_trans = gate1(
            trans_on,
            lobes.microfacet_transmission_pdf(
                ctx["ni"], ctx["nt"], ctx["spec_alpha"], wo, wi
            ),
        )
    else:
        f_trans, p_trans = z3, z1

    if "sheen" in on:
        f_sheen = gate3(sheen_on, lobes.sheen_eval(sp["sheen_roughness"], wo, wi))
        p_sheen = gate1(sheen_on, lobes.sheen_pdf(wo, wi))
    else:
        f_sheen, p_sheen = z3, z1

    if "diffuse_t" in on:
        f_dt = gate3(
            difft_on,
            lobes.diffuse_transmission_eval(
                sp["base_color"], sp["diffuse_roughness"], wo, wi
            ),
        )
        p_dt = gate1(difft_on, lobes.diffuse_transmission_pdf(wo, wi))
    else:
        f_dt, p_dt = z3, z1

    if "diffuse_r" in on:
        f_dr = gate3(
            diffr_on,
            lobes.oren_nayar_eval(
                sp["base_color"], sp["diffuse_roughness"], wo, wi
            ),
        )
        p_dr = gate1(diffr_on, lobes.oren_nayar_pdf(wo, wi))
    else:
        f_dr, p_dr = z3, z1

    f = jnp.stack([f_coat, f_metal, f_spec, f_trans, f_sheen, f_dt, f_dr], axis=-2)
    pdf = jnp.stack([p_coat, p_metal, p_spec, p_trans, p_sheen, p_dt, p_dr], axis=-1)
    return f, pdf


def _layer_multipliers(ctx):
    """Per-lobe throughput multipliers used by sample() (bsdf.cu:221-290);
    returns [N, 7, 3]."""
    sp = ctx["sp"]
    one = jnp.ones_like(sp["base_color"])
    ca = ctx["coat_absorption"]
    spec_att = 1.0 - sp["specular"][..., None] * sp["specular_color"] * ctx[
        "spec_albedo"
    ][..., None]
    sheen_att = 1.0 - (sp["sheen"] * ctx["sheen_albedo"])[..., None]

    m0 = sp["coat"][..., None] * one
    m1 = ca * sp["metalness"][..., None]
    base2 = ca * (1.0 - sp["metalness"])[..., None]
    m2 = base2 * sp["specular"][..., None] * sp["specular_color"]
    base3 = base2 * spec_att
    m3 = base3 * sp["transmission"][..., None] * sp["transmission_color"]
    base4 = base3 * (1.0 - sp["transmission"])[..., None]
    m4 = base4 * sp["sheen"][..., None] * sp["sheen_color"]
    base5 = base4 * sheen_att
    m5 = (
        base5
        * sp["subsurface"][..., None]
        * sp["subsurface_color"]
        * sp["thin_walled"][..., None]
    )
    m6 = base5 * (1.0 - sp["subsurface"])[..., None] * sp["diffuse"][..., None]
    return jnp.stack([m0, m1, m2, m3, m4, m5, m6], axis=-2)


def eval(ctx, wo, wi):
    """Layered mixture evaluation (bsdf.cu:129-212); returns [N, 3]."""
    sp = ctx["sp"]
    f, _ = _lobe_evals(ctx, wo, wi)
    coat, metal, spec, trans, sheen, dt, dr = [f[..., k, :] for k in range(7)]

    ret = sp["coat"][..., None] * coat
    f_mult = ctx["coat_absorption"]

    ret = ret + f_mult * sp["metalness"][..., None] * metal
    f_mult = f_mult * (1.0 - sp["metalness"])[..., None]

    ret = ret + f_mult * sp["specular"][..., None] * sp["specular_color"] * spec
    f_mult = f_mult * (
        1.0
        - sp["specular"][..., None]
        * sp["specular_color"]
        * ctx["spec_albedo"][..., None]
    )

    ret = ret + f_mult * sp["transmission"][..., None] * sp[
        "transmission_color"
    ] * trans
    f_mult = f_mult * (1.0 - sp["transmission"])[..., None]

    ret = ret + f_mult * sp["sheen"][..., None] * sp["sheen_color"] * sheen
    f_mult = f_mult * (1.0 - (sp["sheen"] * ctx["sheen_albedo"])[..., None])

    ret = ret + f_mult * sp["subsurface"][..., None] * sp[
        "subsurface_color"
    ] * sp["thin_walled"][..., None] * dt
    f_mult = f_mult * (1.0 - sp["subsurface"])[..., None]

    ret = ret + f_mult * sp["diffuse"][..., None] * dr
    return ret


def eval_pdf(ctx, wo, wi):
    """Mixture pdf (bsdf.cu:295-345); returns [N]."""
    _, pdf = _lobe_evals(ctx, wo, wi)
    return jnp.sum(ctx["pmf"] * pdf, axis=-1)


def sample(ctx, wo, u, v):
    """Sample one lobe then its direction (bsdf.cu:214-293).

    u: [N] lobe-select uniform; v: [N, 2] direction uniforms.
    Returns (wi [N,3], f [N,3], pdf [N]).
    """
    sp = ctx["sp"]
    idx, pmf_sel = discrete_sample_cdf(ctx["pmf"], u)

    on = ctx["lobes_on"]
    z3 = jnp.zeros(wo.shape, wo.dtype)
    z1 = jnp.zeros(wo.shape[:-1], wo.dtype)

    # candidate directions from every active lobe (masked-eval + select)
    if "coat" in on:
        wi0, f0, p0 = lobes.microfacet_reflection_dielectric_sample(
            ctx["eta"], ctx["coat_alpha"], wo, v
        )
    else:
        wi0, f0, p0 = z3, z3, z1
    if "metal" in on:
        wi1, f1, p1 = lobes.microfacet_reflection_conductor_sample(
            ctx["metal_n"], ctx["metal_k"], ctx["spec_alpha"], wo, v
        )
    else:
        wi1, f1, p1 = z3, z3, z1
    if "specular" in on:
        if "thin_film" in on:
            wi2, f2, p2 = lobes.microfacet_reflection_thinfilm_sample(
                ctx["eta"], sp["thin_film_ior"], sp["thin_film_thickness"],
                ctx["spec_alpha"], wo, v,
            )
        else:
            wi2, f2, p2 = lobes.microfacet_reflection_dielectric_sample(
                ctx["eta"], ctx["spec_alpha"], wo, v
            )
    else:
        wi2, f2, p2 = z3, z3, z1
    if "transmission" in on:
        wi3, f3, p3 = lobes.microfacet_transmission_sample(
            ctx["ni"], ctx["nt"], ctx["spec_alpha"], wo, v
        )
    else:
        wi3, f3, p3 = z3, z3, z1
    if "sheen" in on:
        wi4, f4, p4 = lobes.sheen_sample(sp["sheen_roughness"], wo, v)
    else:
        wi4, f4, p4 = z3, z3, z1
    if "diffuse_t" in on:
        wi5, f5, p5 = lobes.diffuse_transmission_sample(
            sp["base_color"], sp["diffuse_roughness"], wo, v
        )
    else:
        wi5, f5, p5 = z3, z3, z1
    if "diffuse_r" in on:
        wi6, f6, p6 = lobes.oren_nayar_sample(
            sp["base_color"], sp["diffuse_roughness"], wo, v
        )
    else:
        wi6, f6, p6 = z3, z3, z1

    wis = jnp.stack([wi0, wi1, wi2, wi3, wi4, wi5, wi6], axis=-2)  # [N,7,3]
    fs = jnp.stack([f0, f1, f2, f3, f4, f5, f6], axis=-2)
    ps = jnp.stack([p0, p1, p2, p3, p4, p5, p6], axis=-1)  # [N,7]

    mult = _layer_multipliers(ctx)  # [N,7,3]
    fs = fs * mult

    idx_e = idx[..., None]
    wi = jnp.take_along_axis(wis, idx_e[..., None], axis=-2)[..., 0, :]
    f = jnp.take_along_axis(fs, idx_e[..., None], axis=-2)[..., 0, :]
    pdf = jnp.take_along_axis(ps, idx_e, axis=-1)[..., 0] * pmf_sel
    return wi, _sanitize3(f), _sanitize1(pdf)
