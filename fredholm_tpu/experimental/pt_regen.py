"""Persistent wavefront with sample-slot regeneration.

The unrolled fused pipeline (pt_fused.py) runs every lane through all
max_depth bounce stages even after the lane's path dies (Russian roulette,
miss, emissive hit) — measured lane occupancy is 0.37 on the closed Cornell
box and 0.087 on open scenes (PERF.md "Compaction headroom"). Classic
stream compaction loses on this hardware (a 147k-lane argsort+permute is
~39 ms); this module implements the data-movement-free alternative: when a
lane's path dies, the SAME slot immediately starts the pixel's next
progressive sample.

This is the TPU replacement for the reference's hidden SIMT scheduling
(OptiX keeps warps busy across thread-divergent path lengths;
/root/reference/fredholm/include/fredholm/shared.h:52-57,
renderer.h:520-521 launch geometry) — the wavefront analog from the
wavefront-path-tracing literature (Laine et al. 2013 style regeneration).

Correctness: every sampler draw is a pure function of (pixel, sample
number, depth, slot) — pt_fused's draws are keyed, not consumed from a
stream — so a regenerated sample is BIT-IDENTICAL to the same sample
rendered by the unrolled pipeline; only the lane/stage packing differs.
The per-lane dynamic path depth needs dynamic Sobol dimensions, provided
by sampling/sobol.sobol_owen_float_dyn (branchless masked row select).

Accounting: per-lane completed-sample counters feed the SAME per-pixel
streaming average as render_progressive (pt.cu:480-501 analog), so
progressive semantics (`render(n);render(m) == render(n+m)`) and
checkpoint/resume keep working.

Host protocol: the wavefront state lives on device; a jitted chunk of
CHUNK_STAGES pipeline stages is dispatched repeatedly until every lane has
completed its target sample count (one scalar sync per chunk).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..integrator import pt as pt_mod
from ..sampling.sobol import sobol_owen_float_dyn
from ..fused import cbsdf
from ..fused.cmappings import (
    draw_cmj_2d,
    draw_sobol_1d,
    sample_concentric_disk,
    sample_cosine_weighted_hemisphere,
    sample_triangle,
)
from ..fused.cvec import (
    V3,
    cross,
    dot,
    is_finite3,
    length,
    local_to_world,
    normalize,
    orthonormal_basis,
    ray_origin_offset,
    rgb_to_luminance,
    to_stacked,
    vsplat,
    where3,
    world_to_local,
)
from ..fused.pt_fused import (
    COL,
    _apply_tex_overrides,
    emission_from_attrs,
    fetch_texture_planes,
    RAY_TMAX,
    SHADOW_RAY_EPS,
    _SV,
    _USV,
    FusedConfig,
    _attr3,
    _clip3,
    _concat_rays,
    _gather_attrs,
    _interp3,
    _resolve_pending,
    _select_light,
    _shading_params_from_attr,
    _sv3,
    _trace_c,
    eval_sky_c,
    pack_scalars,
    raygen_body,
)

import os as _os

# pipeline stages per jit dispatch (one host sync each); results are
# chunk-size independent (the wavefront state is carried across chunks).
# Smaller chunks compile much faster on XLA:CPU — tests set this to 4
CHUNK_STAGES = int(_os.environ.get("FREDHOLM_REGEN_CHUNK", "8"))


def _z3(like):
    z = jnp.zeros_like(like)
    return V3(z, z, z)


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# state


def init_state(n: int, base_count, cfg: FusedConfig) -> Dict:
    """Fresh wavefront: every lane idle/drained; first stage respawns all."""
    # every leaf gets its OWN buffer: the chunk jit donates the state, and
    # XLA rejects donating one buffer through two arguments
    def f():
        return jnp.zeros((n,), jnp.float32)

    def b():
        return jnp.zeros((n,), bool)

    def v3():
        return V3(f(), f(), f())

    def dead_ray():
        return (v3(), v3(), f() - 1.0)

    blocks = list(cfg.nee_blocks) + ["light", "rad"]
    state = {
        # fresh buffer (+0), NOT an alias of the caller's sample_count:
        # the chunk jit donates the whole state
        "count": _u32(base_count) + jnp.uint32(0),
        "alive": b(),
        "fin": b(),
        "depth": jnp.zeros((n,), jnp.uint32),
        "thr": v3(),
        "rad": v3(),
        "p_tpf": v3(),
        "p_pdf_l": f(),
        "p_wi_l_y": f(),
        "p_c_sky": v3(),
        "s_rad": v3(),
        "s_pos": v3(),
        "s_nrm": v3(),
        "s_depth": f(),
        "s_u": f(),
        "s_v": f(),
        "s_alb": v3(),
        "nv": jnp.float32(0.0),
        "slots": jnp.float32(0.0),
        "rays": {blk: dead_ray() for blk in blocks},
    }
    if cfg.has_dl:
        state["p_c_dl"] = v3()
    if cfg.has_area:
        state["p_c_area"] = v3()
    return state


# ---------------------------------------------------------------------------
# one pipeline stage


def regen_stage(cfg: FusedConfig, dev, sv, usv, image_idx, px, py, target,
                state: Dict) -> Dict:
    """trace -> resolve pending -> finalize -> shade (dynamic depth) ->
    respawn. Semantics per path are identical to pt_fused.mega_body; depth
    is a per-lane uint32 instead of the unrolled static d."""
    n = image_idx.shape[0]
    seed_hash = usv[_USV["seed_hash"]]
    blocks = list(cfg.nee_blocks) + ["light", "rad"]

    # ---- 1. trace everything emitted by the previous stage
    ray_list = [state["rays"][b] for b in blocks]
    o_all, d_all, t_all = _concat_rays(ray_list)
    hit_all = _trace_c(dev, o_all, d_all, t_all)

    def blk(arr, i):
        return arr[i * n:(i + 1) * n]

    li = blocks.index("light")
    ri = blocks.index("rad")
    rhit = {
        "hit": blk(hit_all["hit"], ri),
        "t": blk(hit_all["t"], ri),
        "u": blk(hit_all["u"], ri),
        "v": blk(hit_all["v"], ri),
    }
    prim2 = jnp.concatenate(
        [blk(hit_all["prim"], li), blk(hit_all["prim"], ri)]
    )
    inst2 = None
    if "inst" in hit_all:
        inst2 = jnp.concatenate(
            [blk(hit_all["inst"], li), blk(hit_all["inst"], ri)]
        )
    attrs2 = _gather_attrs(dev, prim2, inst=inst2)
    fetch_texture_planes(
        dev, cfg, attrs2,
        jnp.concatenate([blk(hit_all["u"], li), rhit["u"]]),
        jnp.concatenate([blk(hit_all["v"], li), rhit["v"]]),
    )
    lattr = {c: v[:n] for c, v in attrs2.items()}
    rattr = {c: v[n:] for c, v in attrs2.items()}

    # ---- 2. resolve the previous stage's pending transport (zero-weight
    # pendings from idle/fresh lanes resolve harmlessly to +0)
    resolve = {
        "l_hit": blk(hit_all["hit"], li),
        "l_u": blk(hit_all["u"], li),
        "l_v": blk(hit_all["v"], li),
        "l_o": state["rays"]["light"][0],
        "l_d": state["rays"]["light"][1],
        "tpf": state["p_tpf"],
        "pdf_l": state["p_pdf_l"],
        "wi_l_y": state["p_wi_l_y"],
        "lattr": lattr,
    }
    for bi, b in enumerate(blocks):
        if b in ("light", "rad"):
            continue
        resolve["occ_" + b] = blk(hit_all["hit"], bi)
        resolve["c_" + b] = state["p_c_" + b]
    rad = _resolve_pending(cfg, sv, state["rad"], resolve)
    zero = jnp.zeros_like(rad.x)
    z3 = V3(zero, zero, zero)

    # ---- 3. finalize samples that died while shading last stage (their
    # pendings just resolved); NaN scrub as in final_resolve_body
    fin = state["fin"]
    rad = where3(is_finite3(rad), rad, z3)
    s_rad = state["s_rad"] + where3(fin, rad, z3)
    count = state["count"] + fin.astype(jnp.uint32)
    rad = where3(fin, z3, rad)

    # ---- 4. shade the radiance-ray hit at the lane's dynamic depth
    alive_in = state["alive"]
    thr = state["thr"]
    depth = state["depth"]
    depth0 = depth == 0
    hit = rhit["hit"]
    direction = state["rays"]["rad"][1]
    n1 = np.uint32(cfg.n1)
    n2 = np.uint32(cfg.n2)
    n_pixels = usv[_USV["n_pixels"]]
    sample_idx = image_idx + count * n_pixels
    cmj_base = _u32(2) + depth * n2

    # sky on depth-0 miss (pt.cu:504-523); deeper misses carry no radiance
    # (the bounce direction's sky is collected by the light-ray MIS term)
    sky_le = eval_sky_c(cfg, sv, direction)
    miss_first = alive_in & ~hit & depth0
    rad = rad + where3(miss_first, thr * sky_le, z3)
    alive = alive_in & hit
    nv = state["nv"] + jnp.sum(alive.astype(jnp.float32))
    slots = state["slots"] + np.float32(n)

    # surface info
    w1 = rhit["u"]
    w2 = rhit["v"]
    w0 = 1.0 - w1 - w2
    x = _interp3(rattr, COL["v0"], w0, w1, w2)
    fv0 = _attr3(rattr, "v0")
    fv1 = _attr3(rattr, "v1")
    fv2 = _attr3(rattr, "v2")
    n_g = normalize(cross(fv1 - fv0, fv2 - fv0), eps=1e-20)
    n_s = normalize(_interp3(rattr, COL["n0"], w0, w1, w2), eps=1e-20)
    texcoord_u = (
        w0 * rattr[COL["uv0"]] + w1 * rattr[COL["uv1"]]
        + w2 * rattr[COL["uv2"]]
    )
    texcoord_v = (
        w0 * rattr[COL["uv0"] + 1] + w1 * rattr[COL["uv1"] + 1]
        + w2 * rattr[COL["uv2"] + 1]
    )
    is_entering = dot(-direction, n_g) > 0.0
    flip = jnp.where(is_entering, 1.0, -1.0)
    n_s = V3(n_s.x * flip, n_s.y * flip, n_s.z * flip)
    n_g = V3(n_g.x * flip, n_g.y * flip, n_g.z * flip)
    tangent, bitangent = orthonormal_basis(n_s)

    sp = _shading_params_from_attr(rattr)
    _apply_tex_overrides(cfg, sp, rattr)

    # depth-0 AOVs accumulate straight into the per-lane sums (one
    # contribution per sample, zeros on a primary miss — identical to the
    # unrolled path's per-sample AOV planes)
    capture = alive & depth0
    s_pos = state["s_pos"] + where3(capture, x, z3)
    s_nrm = state["s_nrm"] + where3(capture, n_s, z3)
    s_depth = state["s_depth"] + jnp.where(capture, rhit["t"], 0.0)
    s_u = state["s_u"] + jnp.where(capture, texcoord_u, 0.0)
    s_v = state["s_v"] + jnp.where(capture, texcoord_v, 0.0)
    s_alb = state["s_alb"] + where3(capture, sp["base_color"], z3)

    # emissive first hit terminates (pt.cu:745-760)
    emissive = rattr[COL["has_emission"]] > 0.0
    emit_now = capture & emissive
    le0 = emission_from_attrs(cfg, rattr)
    rad = rad + where3(emit_now, thr * le0, z3)
    alive = alive & ~emit_now

    # BSDF context
    wo = world_to_local(-direction, tangent, n_s, bitangent)
    ctx = cbsdf.setup(wo, sp, is_entering, cfg.lobes_on)
    shadow_origin = ray_origin_offset(x, n_g)
    shadow_tmax = jnp.where(alive, RAY_TMAX, -1.0)

    rays = {}
    pending = {}

    # ---- NEE; draw order [dl], sky, [area] (pt.cu:767-890)
    cmj_slot = 0
    if cfg.has_dl:
        ux, uy = draw_cmj_2d(
            count, image_idx, cmj_base + np.uint32(cmj_slot), seed_hash
        )
        cmj_slot += 1
        dist = 1e9
        dxx, dyy = sample_concentric_disk(ux, uy)
        ddir_s = _sv3(sv, _SV["dl_dir"])
        ddir = V3(ddir_s.x + zero, ddir_s.y + zero, ddir_s.z + zero)
        disk_r = dist * jnp.tan(jnp.deg2rad(0.5 * sv[_SV["dl_angle"]]))
        t_dl, b_dl = orthonormal_basis(ddir)
        p_sun = V3(
            dist * ddir.x + disk_r * (t_dl.x * dxx + b_dl.x * dyy),
            dist * ddir.y + disk_r * (t_dl.y * dxx + b_dl.y * dyy),
            dist * ddir.z + disk_r * (t_dl.z * dxx + b_dl.z * dyy),
        )
        sdir_dl = normalize(p_sun - shadow_origin)
        rays["dl"] = (shadow_origin, sdir_dl, shadow_tmax)

        wi = world_to_local(sdir_dl, tangent, n_s, bitangent)
        f = cbsdf.eval(ctx, wo, wi)
        pdf_bsdf = cbsdf.eval_pdf(ctx, wo, wi)
        mis_w = 1.0 / (1.0 + pdf_bsdf)
        wgt = _clip3(thr * vsplat(mis_w * jnp.abs(wi.y)) * f, 0.0, 1.0)
        le_dl = _sv3(sv, _SV["dl_le"])
        c_dl = V3(wgt.x * le_dl.x, wgt.y * le_dl.y, wgt.z * le_dl.z)
        pending["c_dl"] = where3(alive, c_dl, z3)

    ux, uy = draw_cmj_2d(
        count, image_idx, cmj_base + np.uint32(cmj_slot), seed_hash
    )
    cmj_slot += 1
    wi_sky = sample_cosine_weighted_hemisphere(ux, uy)
    sdir_sky = local_to_world(wi_sky, tangent, n_s, bitangent)
    cos_sky = jnp.abs(wi_sky.y)
    pdf_sky = cos_sky / jnp.pi
    rays["sky"] = (shadow_origin, sdir_sky, shadow_tmax)

    f = cbsdf.eval(ctx, wo, wi_sky)
    pdf_bsdf = cbsdf.eval_pdf(ctx, wo, wi_sky)
    mis_w = pdf_sky / (pdf_sky + pdf_bsdf)
    scale = jnp.where(
        pdf_sky > 0.0, mis_w * cos_sky / jnp.maximum(pdf_sky, 1e-12), 0.0
    )
    wgt = _clip3(thr * vsplat(scale) * f, 0.0, 1.0)
    sky_le_nee = eval_sky_c(cfg, sv, sdir_sky)
    pending["c_sky"] = where3(alive, wgt * sky_le_nee, z3)

    sobol_slot = 1
    if cfg.has_area:
        u1 = sobol_owen_float_dyn(
            sample_idx, 1 + sobol_slot, cfg.n1, depth, cfg.max_depth,
            seed_hash,
        )
        sobol_slot += 1
        ux, uy = draw_cmj_2d(
            count, image_idx, cmj_base + np.uint32(cmj_slot), seed_hash
        )
        cmj_slot += 1
        fv0l, fv1l, fv2l, fn0l, fn1l, fn2l, le_l, area_l = _select_light(
            dev["light_table"], cfg.n_lights, u1
        )
        b0, b1 = sample_triangle(ux, uy)
        lb0 = 1.0 - b0 - b1
        p_l = V3(
            lb0 * fv0l.x + b0 * fv1l.x + b1 * fv2l.x,
            lb0 * fv0l.y + b0 * fv1l.y + b1 * fv2l.y,
            lb0 * fv0l.z + b0 * fv1l.z + b1 * fv2l.z,
        )
        n_lv = V3(
            lb0 * fn0l.x + b0 * fn1l.x + b1 * fn2l.x,
            lb0 * fn0l.y + b0 * fn1l.y + b1 * fn2l.y,
            lb0 * fn0l.z + b0 * fn1l.z + b1 * fn2l.z,
        )
        pdf_area = 1.0 / (cfg.n_lights * jnp.maximum(area_l, 1e-12))

        to_l = p_l - shadow_origin
        r = length(to_l)
        inv_r = 1.0 / jnp.maximum(r, 1e-12)
        sdir_area = V3(to_l.x * inv_r, to_l.y * inv_r, to_l.z * inv_r)
        rays["area"] = (
            shadow_origin,
            sdir_area,
            jnp.where(alive, r - SHADOW_RAY_EPS, -1.0),
        )

        front = dot(-sdir_area, n_lv) > 0.0
        wi = world_to_local(sdir_area, tangent, n_s, bitangent)
        f = cbsdf.eval(ctx, wo, wi)
        pdf = (
            r * r / jnp.maximum(jnp.abs(dot(-sdir_area, n_lv)), 1e-12)
            * pdf_area
        )
        pdf_bsdf = cbsdf.eval_pdf(ctx, wo, wi)
        mis_w = pdf / (pdf + pdf_bsdf)
        wgt = _clip3(
            thr * vsplat(mis_w * jnp.abs(wi.y) / jnp.maximum(pdf, 1e-12)) * f,
            0.0,
            1.0,
        )
        pending["c_area"] = where3(alive & front, wgt * le_l, z3)

    # ---- BSDF-sampled light ray (pt.cu:892-925)
    u1 = sobol_owen_float_dyn(
        sample_idx, 1 + sobol_slot, cfg.n1, depth, cfg.max_depth, seed_hash
    )
    sobol_slot += 1
    ux, uy = draw_cmj_2d(
        count, image_idx, cmj_base + np.uint32(cmj_slot), seed_hash
    )
    cmj_slot += 1
    wi_l, f_l, pdf_l = cbsdf.sample(ctx, wo, u1, ux, uy)
    ldir = local_to_world(wi_l, tangent, n_s, bitangent)
    transmitted = dot(ldir, n_g) < 0.0
    lorigin = ray_origin_offset(x, where3(transmitted, -n_g, n_g))
    rays["light"] = (lorigin, ldir, jnp.where(alive, RAY_TMAX, -1.0))

    tpf_scale = jnp.where(
        pdf_l > 0.0, jnp.abs(wi_l.y) / jnp.maximum(pdf_l, 1e-12), 0.0
    )
    pending["tpf"] = where3(alive, thr * vsplat(tpf_scale) * f_l, z3)
    pending["pdf_l"] = pdf_l
    pending["wi_l_y"] = wi_l.y

    # ---- next bounce (pt.cu:927-943)
    u1 = sobol_owen_float_dyn(
        sample_idx, 1 + sobol_slot, cfg.n1, depth, cfg.max_depth, seed_hash
    )
    ux, uy = draw_cmj_2d(
        count, image_idx, cmj_base + np.uint32(cmj_slot), seed_hash
    )
    wi_n, f_n, pdf_n = cbsdf.sample(ctx, wo, u1, ux, uy)
    wi_world = local_to_world(wi_n, tangent, n_s, bitangent)
    bounce_w = jnp.where(
        pdf_n > 0.0, jnp.abs(wi_n.y) / jnp.maximum(pdf_n, 1e-12), 0.0
    )
    new_thr = thr * f_n * vsplat(bounce_w)
    transmitted = dot(wi_world, n_g) < 0.0
    new_o = ray_origin_offset(x, where3(transmitted, -n_g, n_g))

    alive_next = alive & is_finite3(new_thr) & (pdf_n > 0.0)

    # RR for depth+1 (dynamic Sobol dim; draws are keyed, never consumed,
    # so drawing at a clamped dim for soon-dead lanes is harmless)
    depth_bound = depth + 1 < np.uint32(cfg.max_depth)
    rr_sel = jnp.minimum(depth + 1, np.uint32(cfg.max_depth - 1))
    u_rr = sobol_owen_float_dyn(
        sample_idx, 1, cfg.n1, rr_sel, cfg.max_depth, seed_hash
    )
    rr_prob = jnp.clip(rgb_to_luminance(new_thr), 0.0, 1.0)
    rr_pass = (~depth_bound) | (u_rr < rr_prob)
    inv_rr = jnp.where(
        depth_bound, 1.0 / jnp.maximum(rr_prob, 1e-12), 1.0
    )
    new_thr = V3(new_thr.x * inv_rr, new_thr.y * inv_rr, new_thr.z * inv_rr)
    alive_next = alive_next & depth_bound & rr_pass

    # dead lanes keep stale ray state
    prev_o = state["rays"]["rad"][0]
    new_o = where3(alive_next, new_o, prev_o)
    new_d = where3(alive_next, wi_world, direction)
    new_thr = where3(alive_next, new_thr, thr)

    # ---- 5. respawn: a dying or idle lane immediately starts its pixel's
    # next progressive sample in the same slot
    died = alive_in & ~alive_next
    idle = ~alive_in
    k_new = count + died.astype(jnp.uint32)
    respawn = (died | idle) & (k_new < target)

    spawn = raygen_body(cfg, sv, usv, px, py, image_idx, k_new)
    new_o = where3(respawn, spawn["o"], new_o)
    new_d = where3(respawn, spawn["d"], new_d)
    new_thr = where3(respawn, spawn["thr"], new_thr)
    alive_out = alive_next | (respawn & spawn["alive"])
    depth_out = jnp.where(
        respawn, jnp.uint32(0), jnp.where(alive_next, depth + 1, depth)
    )
    rad_tmax = jnp.where(alive_out, RAY_TMAX, -1.0)
    rays["rad"] = (new_o, new_d, rad_tmax)

    out = {
        "count": count,
        "alive": alive_out,
        "fin": died,
        "depth": depth_out,
        "thr": new_thr,
        "rad": rad,
        "p_tpf": pending["tpf"],
        "p_pdf_l": pending["pdf_l"],
        "p_wi_l_y": pending["wi_l_y"],
        "p_c_sky": pending["c_sky"],
        "s_rad": s_rad,
        "s_pos": s_pos,
        "s_nrm": s_nrm,
        "s_depth": s_depth,
        "s_u": s_u,
        "s_v": s_v,
        "s_alb": s_alb,
        "nv": nv,
        "slots": slots,
        "rays": rays,
    }
    if cfg.has_dl:
        out["p_c_dl"] = pending["c_dl"]
    if cfg.has_area:
        out["p_c_area"] = pending["c_area"]
    return out


# ---------------------------------------------------------------------------
# jitted chunk + host driver


def _merge_static(arrays, dynamic, config):
    dev = dict(arrays)
    dev.update({k: getattr(config, k) for k in pt_mod.STATIC_DEV_KEYS})
    params = dict(dynamic)
    for k in ("width", "height", "max_depth", "sky_mode",
              "has_directional_light", "use_ibl_is", "sampler_mode"):
        params[k] = getattr(config, k)
    return dev, params


@partial(
    jax.jit,
    static_argnames=("config", "n_stages"),
    donate_argnums=(0,),
)
def _regen_chunk(state, arrays, dynamic, target, image_idx, px, py,
                 config, n_stages: int):
    dev, params = _merge_static(arrays, dynamic, config)
    cfg = FusedConfig(
        width=config.width,
        height=config.height,
        max_depth=config.max_depth,
        sky_mode=config.sky_mode,
        has_dl=config.has_directional_light,
        n_lights=config.n_lights,
        lobes_on=config.lobes_on,
        tex_kinds=getattr(config, "tex_kinds", ()),
    )
    sv, usv = pack_scalars(params, config.width * config.height)
    for _ in range(n_stages):
        state = regen_stage(
            cfg, dev, sv, usv, image_idx, px, py, target, state
        )
    return state


def render_progressive_regen(arrays, dynamic, config, layers, sample_count,
                             n_samples: int, chunk_stages: int = CHUNK_STAGES):
    """Accumulate exactly n_samples progressive samples per pixel through
    the regeneration wavefront; returns (layers, sample_count) with the
    same streaming-average semantics as pt.render_progressive."""
    from ..core.swizzle import (
        swizzle_active,
        swizzle_array,
        swizzled_pixel_coords,
        unswizzle,
    )

    width, height = config.width, config.height
    n = width * height
    swz = swizzle_active(width, height, clustered=config.use_clustered)
    if swz:
        px_u, py_u = swizzled_pixel_coords(width, height, 0)
    else:
        px_u = jnp.tile(jnp.arange(width, dtype=jnp.uint32), height)
        py_u = jnp.repeat(jnp.arange(height, dtype=jnp.uint32), width)
    image_idx = px_u + np.uint32(width) * py_u
    px = px_u.astype(jnp.float32)
    py = py_u.astype(jnp.float32)

    base = _u32(sample_count)
    if swz:
        base = swizzle_array(base, width, height)
    target = base + jnp.uint32(n_samples)

    cfg = FusedConfig(
        width=width,
        height=height,
        max_depth=config.max_depth,
        sky_mode=config.sky_mode,
        has_dl=config.has_directional_light,
        n_lights=config.n_lights,
        lobes_on=config.lobes_on,
        tex_kinds=getattr(config, "tex_kinds", ()),
    )
    state = init_state(n, base, cfg)
    # worst case every sample runs the full depth, plus drain slack
    max_chunks = (
        n_samples * config.max_depth + config.max_depth + 4
    ) // chunk_stages + 2
    for _ in range(max_chunks):
        state = _regen_chunk(
            state, arrays, dynamic, target, image_idx, px, py,
            config, chunk_stages,
        )
        if bool(jnp.all(state["count"] >= target)):
            break
    else:
        raise RuntimeError("regeneration wavefront failed to drain")

    # merge per-lane sums into the streaming-average layers
    sums = {
        "beauty": to_stacked(state["s_rad"]),
        "position": to_stacked(state["s_pos"]),
        "normal": to_stacked(state["s_nrm"]),
        "depth": state["s_depth"],
        "texcoord": jnp.stack([state["s_u"], state["s_v"]], axis=-1),
        "albedo": to_stacked(state["s_alb"]),
    }
    if swz:
        sums = {k: unswizzle(v, width, height) for k, v in sums.items()}

    sc = jnp.asarray(sample_count).astype(jnp.float32)
    denom = sc + np.float32(n_samples)
    new_layers = {}
    for k, s in sums.items():
        old = layers[k]
        c = (sc / denom)[..., None] if old.ndim > 1 else sc / denom
        d = denom[..., None] if old.ndim > 1 else denom
        new_layers[k] = c * old + s / d
    new_layers["n_path_vertices"] = (
        layers["n_path_vertices"] + state["nv"]
    )
    new_layers["n_lane_slots"] = layers["n_lane_slots"] + state["slots"]
    new_count = jnp.asarray(sample_count) + jnp.uint32(n_samples)
    return new_layers, new_count
