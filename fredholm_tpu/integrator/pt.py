"""Wavefront path-tracing integrator with NEE + MIS.

TPU-native re-design of the reference's OptiX megakernel
(/root/reference/fredholm/modules/pt.cu). The megakernel's per-thread
recursion becomes a staged wavefront: all N = W*H pixel lanes advance
together through a `lax.while_loop` over path depth; every stage (camera
raygen, BVH intersect, surface/shading fill, NEE shadow rays, BSDF light
ray, bounce) is a batched SoA pass. Per-lane termination (Russian roulette,
miss, emission) is a mask; dead lanes idle in the traversal loop.

Per-bounce structure mirrors pt.cu:418-944 exactly, including the sampler
dimension ordering, so images converge to the same result:
  RR -> trace radiance -> [miss: sky on first hit] ->
  NEE (directional?, sky, area?) -> BSDF light ray (MIS) -> next bounce.
"""

from __future__ import annotations

import os as _os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.pallas_clustered import (
    intersect_any_clustered,
    intersect_closest_clustered,
)
from ..accel.pallas_dense import (
    intersect_any_pallas,
    intersect_closest_pallas,
)
from ..accel.traverse import (
    intersect_any,
    intersect_any_dense,
    intersect_closest,
    intersect_closest_dense,
)
from ..bsdf import bsdf as bsdf_mod
from ..camera import pixel_uv, sample_ray_thinlens
from ..core.gather import gather_rows
from ..core.vecmath import (
    cartesian_to_spherical,
    cross,
    dot,
    is_finite3,
    length,
    local_to_world,
    normalize,
    orthonormal_basis,
    ray_origin_offset,
    rgb_to_luminance,
    vec3,
    world_to_local,
)
from ..sampling.mappings import (
    sample_concentric_disk,
    sample_cosine_weighted_hemisphere,
    sample_triangle,
)
from ..sampling.sampler import init_sampler_state, sample_1d, sample_2d
from ..scene.texture import fetch_or_constant, sample_texture
from ..sky.hosek import sky_radiance
from ..sky.ibl import fetch_ibl, ibl_pdf, sample_ibl

SHADOW_RAY_EPS = 1e-3  # pt.cu:11
RAY_TMAX = 1e9

SKY_CONSTANT = 0
SKY_IBL = 1
SKY_HOSEK = 2

# every dev-dict key the integrator branches on at TRACE time. These are
# python values that must never enter a traced pytree (a tracer bool in
# `if dev[...]` raises); any code handing a dev dict to a jit/shard_map
# boundary must split on exactly this set. Defined once HERE because the
# round-1 multichip failure came from three call sites each hand-picking a
# different subset (VERDICT.md weak #2).
STATIC_DEV_KEYS = (
    "n_lights",
    "any_heightmap",
    "any_normalmap",
    "any_textures",
    "use_dense",
    "use_pallas",
    "lobes_on",
    "has_alpha",
    "use_clustered",
    "inst_identity",
    # texture kinds the fused pipeline fetches in-pipeline (pt_fused.py)
    "tex_kinds",
    # wavefront compaction mode around fused trace calls (experimental/compact.py)
    "compact",
)


def _use_resident(dev, coherent: bool) -> bool:
    """Route INCOHERENT clustered dispatches (bounce/NEE rays, d > 0)
    through the ray-resident geometry-streamed kernel: an incoherent
    [16,128] tile visits ~2/3 of all superclusters, so the per-tile
    ordered kernel re-DMAs most of the scene's meta+blocks once per tile
    (~43% of bounce trace time, PERF.md round 4). Coherent dispatches
    (primaries, camera-tile shadow rays) keep the ordered kernel, whose
    front-to-back early exit wins when the tile gates are selective."""
    return (
        not coherent
        and _RESIDENT == "1"
        and dev.get("inst_identity", True)
        and "res_meta" in dev["clusters"]
    )


_RESIDENT = _os.environ.get("FREDHOLM_TRAV_RESIDENT", "0")


def _trace_closest_raw(dev, o, d, t_max, coherent=True):
    if dev["use_dense"]:
        if dev.get("use_pallas", True):
            return intersect_closest_pallas(dev["tri_soa"], o, d, t_max)
        return intersect_closest_dense(dev["bvh"], o, d, t_max)
    if dev.get("use_clustered", False):
        if _use_resident(dev, coherent):
            from ..experimental.pallas_resident import intersect_closest_resident

            return intersect_closest_resident(dev["clusters"], o, d, t_max)
        return intersect_closest_clustered(
            dev["clusters"], o, d, t_max,
            identity=dev.get("inst_identity", True),
        )
    return intersect_closest(dev["bvh"], o, d, t_max)


def _hit_alpha(dev, prim, bu, bv, slot=None):
    """Opacity at a hit point: base-color texture alpha channel and/or the
    dedicated alpha texture (anyhit programs, pt.cu:545-678)."""
    p = jnp.clip(prim, 0, dev["n_faces"] - 1)
    if slot is not None and "slot_attrs" in dev:
        _, _, fuv, mat = _slot_face_data(dev, slot)
    else:
        fuv = dev["face_uvs"][p]
        mat = dev["face_mat"][p]
    w0 = (1.0 - bu - bv)[..., None]
    uv = w0 * fuv[:, 0] + bu[..., None] * fuv[:, 1] + bv[..., None] * fuv[:, 2]
    m = dev["materials"]
    alpha = jnp.ones(prim.shape, jnp.float32)
    bc_id = m["base_color_texture_id"][mat]
    bc = sample_texture(dev["textures"], bc_id, uv)
    alpha = jnp.where(bc_id >= 0, jnp.minimum(alpha, bc[..., 3]), alpha)
    a_id = m["alpha_texture_id"][mat]
    at = sample_texture(dev["textures"], a_id, uv)
    alpha = jnp.where(a_id >= 0, jnp.minimum(alpha, at[..., 0]), alpha)
    return alpha


_ALPHA_MAX_RETRACE = 8


def trace_closest(dev, o, d, t_max, coherent=True):
    """optixTrace RAY_TYPE_RADIANCE/LIGHT analog: statically picks the
    Pallas fused dense kernel for small scenes (regular streaming, zero
    HBM intermediates) or the threaded-BVH traversal for large ones.
    Scenes with alpha-cutout materials re-trace through transparent hits
    (the wavefront form of optixIgnoreIntersection, pt.cu:575)."""
    hit = _trace_closest_raw(dev, o, d, t_max, coherent=coherent)
    if not dev.get("has_alpha", False):
        return hit

    def body(state):
        hit, origin, t_base, _ = state
        alpha = _hit_alpha(dev, hit["prim"], hit["u"], hit["v"],
                           slot=hit.get("slot"))
        cut = hit["hit"] & (alpha < 0.5)
        # advance past the transparent hit and re-trace
        new_origin = origin + (hit["t"] + 1e-4)[..., None] * d
        new_t_base = t_base + hit["t"] + 1e-4
        nxt = _trace_closest_raw(
            dev, new_origin, d, jnp.where(cut, t_max - new_t_base, -1.0),
            coherent=coherent,
        )
        merged = {
            "t": jnp.where(cut, nxt["t"], hit["t"]),
            "prim": jnp.where(cut, nxt["prim"], hit["prim"]),
            "u": jnp.where(cut, nxt["u"], hit["u"]),
            "v": jnp.where(cut, nxt["v"], hit["v"]),
            "hit": jnp.where(cut, nxt["hit"], hit["hit"]),
        }
        if "inst" in hit:
            merged["inst"] = jnp.where(cut, nxt["inst"], hit["inst"])
        if "slot" in hit:
            merged["slot"] = jnp.where(cut, nxt["slot"], hit["slot"])
        return merged, jnp.where(cut[..., None], new_origin, origin), jnp.where(cut, new_t_base, t_base), cut

    def cond(state):
        return jnp.any(state[3])

    # evaluate alpha at the initial hit OUTSIDE the loop: when every hit
    # is opaque (the common case even in alpha scenes) the while_loop
    # condition is false on entry and no re-trace runs at all
    alpha0 = _hit_alpha(dev, hit["prim"], hit["u"], hit["v"],
                        slot=hit.get("slot"))
    cut0 = hit["hit"] & (alpha0 < 0.5)
    state = (hit, o, jnp.zeros_like(hit["t"]), cut0)
    hit, origin, t_base, _ = jax.lax.while_loop(cond, body, state)
    # report t relative to the ORIGINAL origin
    hit = dict(hit)
    hit["t"] = hit["t"] + t_base
    return hit


def trace_any(dev, o, d, t_max, coherent=True):
    """optixTrace RAY_TYPE_SHADOW analog (terminate on first hit)."""
    if not dev.get("has_alpha", False):
        if dev["use_dense"]:
            if dev.get("use_pallas", True):
                return intersect_any_pallas(dev["tri_soa"], o, d, t_max)
            return intersect_any_dense(dev["bvh"], o, d, t_max)
        if dev.get("use_clustered", False):
            if _use_resident(dev, coherent):
                from ..experimental.pallas_resident import intersect_any_resident

                return intersect_any_resident(dev["clusters"], o, d, t_max)
            return intersect_any_clustered(
                dev["clusters"], o, d, t_max,
                identity=dev.get("inst_identity", True),
            )
        return intersect_any(dev["bvh"], o, d, t_max)
    # alpha scenes: a shadow ray is occluded by the first OPAQUE hit, so
    # reuse the alpha-aware closest trace
    hit = trace_closest(dev, o, d, t_max, coherent=coherent)
    return hit["hit"]


# ---------------------------------------------------------------------------
# sky


def eval_sky(params, v):
    """Environment radiance for directions v [N,3] (pt.cu:504-523)."""
    mode = params["sky_mode"]  # static python int
    if mode == SKY_IBL:
        return fetch_ibl(params["ibl"], v, params["sky_intensity"])
    if mode == SKY_HOSEK:
        theta, _ = cartesian_to_spherical(v)
        gamma = jnp.arccos(
            jnp.clip(dot(jnp.asarray(params["sun_direction"]), v), -1.0, 1.0)
        )
        return params["sky_intensity"] * sky_radiance(
            params["hosek"], theta, gamma
        )
    return jnp.broadcast_to(jnp.asarray(params["bg_color"]), v.shape)


# ---------------------------------------------------------------------------
# surface + shading params


def _gather_inst_rows(dev, inst):
    """[N, 24] per-lane instance transform rows (scene/device.py
    `_instance_table`); tiny one-hot gather over I <= 1024 instances."""
    table = dev["inst_table"]
    i = jnp.clip(inst, 0, table.shape[0] - 1)
    return gather_rows(table, i, True)


def _apply_inst_points(rows, pts):
    """rows [N,12] affine o2w; pts [N,V,3] -> world. Pure VPU component
    math (no dot_general: TPU matmul defaults to bf16)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]  # [N, V]
    c = lambda k: rows[:, k:k + 1]
    return jnp.stack(
        [
            c(0) * x + c(1) * y + c(2) * z + c(3),
            c(4) * x + c(5) * y + c(6) * z + c(7),
            c(8) * x + c(9) * y + c(10) * z + c(11),
        ],
        axis=-1,
    )


def _apply_inst_normals(rows, nrm):
    """rows [N,24] (cols 12:21 = inverse-transpose rotation); nrm [N,V,3]
    -> world, renormalized per vertex."""
    x, y, z = nrm[..., 0], nrm[..., 1], nrm[..., 2]
    c = lambda k: rows[:, 12 + k:12 + k + 1]
    w = jnp.stack(
        [
            c(0) * x + c(1) * y + c(2) * z,
            c(3) * x + c(4) * y + c(5) * z,
            c(6) * x + c(7) * y + c(8) * z,
        ],
        axis=-1,
    )
    return w / jnp.maximum(
        jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12
    )


def _slot_face_data(dev, slot):
    """fv/fn/fuv/mat_id [N,3,*] planes from the cluster-block fetch
    (fused/slot_fetch.py) — replaces three per-lane HBM row gathers on
    large scenes. Miss lanes (slot < 0) come back zero; every consumer
    masks on hit."""
    from ..fused.slot_fetch import fetch_geom_by_slot

    a = fetch_geom_by_slot(dev, slot)
    fv = jnp.stack([a[c] for c in range(0, 9)], -1).reshape(-1, 3, 3)
    fn = jnp.stack([a[c] for c in range(9, 18)], -1).reshape(-1, 3, 3)
    fuv = jnp.stack([a[c] for c in range(18, 24)], -1).reshape(-1, 3, 2)
    mat = jnp.round(a[25]).astype(jnp.int32)
    return fv, fn, fuv, mat


def fill_surface_info(dev, prim, bary_u, bary_v, ray_d, inst=None,
                      slot=None):
    """pt.cu:141-179 over a wavefront; prim: [N] int32 (clamped valid).

    For instanced scenes the face tables are OBJECT space: `inst` selects
    the per-hit transform applied after the gather (the IAS shading
    contract — world position/normals from object-space GAS attributes).
    """
    p = jnp.clip(prim, 0, dev["n_faces"] - 1)
    small = dev.get("use_dense", False)
    mat_slot = None
    if slot is not None and "slot_attrs" in dev:
        fv, fn, fuv, mat_slot = _slot_face_data(dev, slot)
    else:
        fv = gather_rows(dev["face_verts"], p, small)  # [N, 3, 3]
        fn = gather_rows(dev["face_normals"], p, small)
        fuv = gather_rows(dev["face_uvs"], p, small)
    if inst is not None and "inst_table" in dev:
        rows = _gather_inst_rows(dev, inst)
        fv = _apply_inst_points(rows, fv)
        fn = _apply_inst_normals(rows, fn)

    w0 = (1.0 - bary_u - bary_v)[..., None]
    w1 = bary_u[..., None]
    w2 = bary_v[..., None]

    x = w0 * fv[:, 0] + w1 * fv[:, 1] + w2 * fv[:, 2]
    n_g = normalize(cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), eps=1e-20)
    n_s = normalize(w0 * fn[:, 0] + w1 * fn[:, 1] + w2 * fn[:, 2], eps=1e-20)
    texcoord = w0 * fuv[:, 0] + w1 * fuv[:, 1] + w2 * fuv[:, 2]

    is_entering = dot(-ray_d, n_g) > 0.0
    flip = jnp.where(is_entering, 1.0, -1.0)[..., None]
    n_s = n_s * flip
    n_g = n_g * flip
    tangent, bitangent = orthonormal_basis(n_s)
    return {
        "x": x,
        "n_g": n_g,
        "n_s": n_s,
        "texcoord": texcoord,
        "tangent": tangent,
        "bitangent": bitangent,
        "is_entering": is_entering,
        "mat_id": (mat_slot if mat_slot is not None
                   else gather_rows(dev["face_mat"], p, small)),
    }


def fill_shading_params(dev, surf):
    """pt.cu:181-280: gather material constants, apply texture overrides."""
    m = dev["materials"]
    mid = surf["mat_id"]
    uv = surf["texcoord"]
    tex = dev["textures"]

    small = dev.get("use_dense", False)

    def g(name):
        return gather_rows(m[name], mid, small)

    sp = {}
    sp["diffuse"] = g("diffuse")
    sp["diffuse_roughness"] = g("diffuse_roughness")

    if not dev["any_textures"]:
        # scene has no textures: skip the whole fetch machinery statically
        sp["base_color"] = g("base_color")
        sp["specular"] = g("specular")
        sp["specular_color"] = g("specular_color")
        sp["specular_roughness"] = jnp.clip(g("specular_roughness"), 0.01, 1.0)
        sp["metalness"] = g("metalness")
        sp["coat"] = jnp.clip(g("coat"), 0.0, 1.0)
        sp["coat_roughness"] = jnp.clip(g("coat_roughness"), 0.0, 1.0)
        sp["coat_color"] = g("coat_color")
        sp["transmission"] = g("transmission")
        sp["transmission_color"] = g("transmission_color")
        sp["sheen"] = g("sheen")
        sp["sheen_color"] = g("sheen_color")
        sp["sheen_roughness"] = g("sheen_roughness")
        sp["subsurface"] = g("subsurface")
        sp["subsurface_color"] = g("subsurface_color")
        sp["thin_walled"] = g("thin_walled")
        sp["thin_film_thickness"] = g("thin_film_thickness")
        sp["thin_film_ior"] = g("thin_film_ior")
        return sp

    sp["base_color"] = fetch_or_constant(
        tex, g("base_color_texture_id"), uv, g("base_color")
    )
    sp["specular"] = g("specular")
    sp["specular_color"] = fetch_or_constant(
        tex, g("specular_color_texture_id"), uv, g("specular_color")
    )
    sp["specular_roughness"] = jnp.clip(
        fetch_or_constant(
            tex,
            g("specular_roughness_texture_id"),
            uv,
            g("specular_roughness")[..., None],
        )[..., 0],
        0.01,
        1.0,
    )
    sp["metalness"] = fetch_or_constant(
        tex, g("metalness_texture_id"), uv, g("metalness")[..., None]
    )[..., 0]

    # glTF metallic-roughness packing (pt.cu:230-236)
    mr_id = g("metallic_roughness_texture_id")
    mr = sample_texture(tex, mr_id, uv)
    has_mr = mr_id >= 0
    sp["specular_roughness"] = jnp.where(
        has_mr, jnp.clip(mr[..., 1], 0.01, 1.0), sp["specular_roughness"]
    )
    sp["metalness"] = jnp.where(
        has_mr, jnp.clip(mr[..., 2], 0.0, 1.0), sp["metalness"]
    )

    sp["coat"] = jnp.clip(
        fetch_or_constant(tex, g("coat_texture_id"), uv, g("coat")[..., None])[
            ..., 0
        ],
        0.0,
        1.0,
    )
    # NOTE: reference reads channel .y of the coat-roughness texture
    coat_rough_tex = sample_texture(tex, g("coat_roughness_texture_id"), uv)
    sp["coat_roughness"] = jnp.clip(
        jnp.where(
            g("coat_roughness_texture_id") >= 0,
            coat_rough_tex[..., 1],
            g("coat_roughness"),
        ),
        0.0,
        1.0,
    )
    sp["coat_color"] = g("coat_color")
    sp["transmission"] = g("transmission")
    sp["transmission_color"] = g("transmission_color")
    sp["sheen"] = g("sheen")
    sp["sheen_color"] = g("sheen_color")
    sp["sheen_roughness"] = g("sheen_roughness")
    sp["subsurface"] = g("subsurface")
    sp["subsurface_color"] = g("subsurface_color")
    sp["thin_walled"] = g("thin_walled")
    sp["thin_film_thickness"] = g("thin_film_thickness")
    sp["thin_film_ior"] = g("thin_film_ior")
    return sp


def apply_normal_mapping(dev, surf):
    """Bump (heightmap) + normal mapping (pt.cu:710-742). Returns
    (tangent, normal, bitangent)."""
    m = dev["materials"]
    tex = dev["textures"]
    mid = surf["mat_id"]
    uv = surf["texcoord"]
    tangent = surf["tangent"]
    normal = surf["n_s"]
    bitangent = surf["bitangent"]

    hm_id = m["heightmap_texture_id"][mid]
    if dev.get("any_heightmap", True):
        k = jnp.clip(hm_id, 0, tex["offset"].shape[0] - 1)
        du = 1.0 / tex["width"][k].astype(jnp.float32)
        dv = 1.0 / tex["height"][k].astype(jnp.float32)
        v0 = sample_texture(tex, hm_id, uv)[..., 0]
        vdu = sample_texture(
            tex, hm_id, uv + jnp.stack([du, jnp.zeros_like(du)], -1)
        )[..., 0]
        vdv = sample_texture(
            tex, hm_id, uv + jnp.stack([jnp.zeros_like(dv), dv], -1)
        )[..., 0]
        dfdu = vdu - v0
        dfdv = vdv - v0
        t_b = normalize(surf["tangent"] + dfdu[..., None] * surf["n_s"])
        b_b = normalize(surf["bitangent"] + dfdv[..., None] * surf["n_s"])
        n_b = normalize(cross(t_b, b_b))
        use = (hm_id >= 0)[..., None]
        tangent = jnp.where(use, t_b, tangent)
        bitangent = jnp.where(use, b_b, bitangent)
        normal = jnp.where(use, n_b, normal)

    nm_id = m["normalmap_texture_id"][mid]
    if dev.get("any_normalmap", True):
        val = sample_texture(tex, nm_id, uv)[..., :3] * 2.0 - 1.0
        n_m = normalize(
            local_to_world(
                # normal maps are tangent-space with +Z normal; our local
                # frame is +Y, so swizzle (x, z, y)
                jnp.stack([val[..., 0], val[..., 2], val[..., 1]], -1),
                surf["tangent"],
                surf["n_s"],
                surf["bitangent"],
            )
        )
        use = (nm_id >= 0)[..., None]
        normal = jnp.where(use, n_m, normal)
        t_m, b_m = orthonormal_basis(normal)
        tangent = jnp.where(use, t_m, tangent)
        bitangent = jnp.where(use, b_m, bitangent)

    return tangent, normal, bitangent


def get_emission(dev, mat_id, texcoord):
    """pt.cu:131-139."""
    m = dev["materials"]
    if not dev["any_textures"]:
        return m["emission_color"][mat_id]
    return fetch_or_constant(
        dev["textures"],
        m["emission_texture_id"][mat_id],
        texcoord,
        m["emission_color"][mat_id],
    )


def has_emission(dev, mat_id):
    """pt.cu:125-129."""
    m = dev["materials"]
    ec = m["emission_color"][mat_id]
    return (
        (ec[..., 0] > 0.0)
        | (ec[..., 1] > 0.0)
        | (ec[..., 2] > 0.0)
        | (m["emission_texture_id"][mat_id] >= 0)
    )


# ---------------------------------------------------------------------------
# lights


def sample_position_on_light(dev, u, v2):
    """Uniform area-light sampling (pt.cu:282-322). Returns
    (p, n, le, pdf_area)."""
    n_lights = dev["n_lights"]
    light_idx = jnp.clip(
        (u * n_lights).astype(jnp.int32), 0, max(n_lights - 1, 0)
    )
    # world-space light SoA (scene/device.py): small tables, one-hot gather;
    # valid for instanced scenes where face tables are object-space
    fv = gather_rows(dev["light_verts"], light_idx, True)
    fn = gather_rows(dev["light_normals"], light_idx, True)
    fuv = gather_rows(dev["light_uvs"], light_idx, True)

    bary = sample_triangle(v2)
    w0 = (1.0 - bary[..., 0] - bary[..., 1])[..., None]
    w1 = bary[..., 0:1]
    w2 = bary[..., 1:2]
    p = w0 * fv[:, 0] + w1 * fv[:, 1] + w2 * fv[:, 2]
    n = w0 * fn[:, 0] + w1 * fn[:, 1] + w2 * fn[:, 2]
    texcoord = w0 * fuv[:, 0] + w1 * fuv[:, 1] + w2 * fuv[:, 2]
    area = 0.5 * length(cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]))
    le = get_emission(
        dev, gather_rows(dev["light_mat"], light_idx, True), texcoord
    )
    pdf = 1.0 / (n_lights * jnp.maximum(area, 1e-12))
    return p, n, le, pdf


def sample_position_on_directional_light(params, u2):
    """pt.cu:324-342: point on the far-away sun disk."""
    dist = 1e9
    p_disk = sample_concentric_disk(u2)
    ddir = jnp.asarray(params["directional_light"]["dir"])
    angle = params["directional_light"]["angle"]
    disk_radius = dist * jnp.tan(jnp.deg2rad(0.5 * angle))
    t, b = orthonormal_basis(jnp.broadcast_to(ddir, p_disk.shape[:-1] + (3,)))
    return dist * ddir + disk_radius * (
        t * p_disk[..., 0:1] + b * p_disk[..., 1:2]
    )


def compute_mis_weight(pdf0, pdf1):
    """Balance heuristic (pt.cu:365-370)."""
    return pdf0 / (pdf0 + pdf1)


def regularize_weight(w):
    """Firefly clamp (pt.cu:372-376)."""
    return jnp.clip(w, 0.0, 1.0)


# ---------------------------------------------------------------------------
# one progressive sample for every pixel


def _mask3(m):
    return m[..., None]


def render_sample(dev: Dict, params: Dict, n_spp):
    """Trace ONE path per pixel; n_spp: [N] per-pixel accumulated counts.

    Returns dict of per-sample AOV values (radiance, position, normal,
    depth, texcoord, albedo), each [N, ...], NaN/Inf-scrubbed like
    pt.cu:469-478.
    """
    width = params["width"]
    height = params["height"]
    # tile support for multi-chip sharding: each shard renders a horizontal
    # band [y0, y0 + tile_height) of the global pixel grid
    tile_height = params.get("tile_height", height)  # static
    y0 = params.get("y0", 0)  # may be traced (axis_index under shard_map)
    n = width * tile_height
    max_depth = params["max_depth"]

    from ..core.swizzle import (
        swizzle_active,
        swizzle_array,
        swizzled_pixel_coords,
        unswizzle,
    )

    swz = swizzle_active(
        width, tile_height, clustered=dev.get("use_clustered", False)
    )
    if swz:
        # blocked pixel order for ray-tile coherence (core/swizzle.py);
        # outputs are transposed back to pixel-linear at the end
        px, py = swizzled_pixel_coords(width, tile_height, y0)
    else:
        px = jnp.tile(jnp.arange(width, dtype=jnp.uint32), tile_height)
        py = jnp.repeat(jnp.arange(tile_height, dtype=jnp.uint32), width)
        py = py + jnp.asarray(y0, jnp.uint32)
    image_idx = px + np.uint32(width) * py

    n_spp = jnp.asarray(n_spp)
    if swz and n_spp.ndim > 0:
        n_spp = swizzle_array(n_spp, width, tile_height)

    smp = init_sampler_state(
        image_idx, n_spp, width * height, params["seed"],
        mode=params.get("sampler_mode", "sobol_cmj"), width=width,
    )

    # camera ray (pt.cu:437-446)
    u_pixel, smp = sample_2d(smp)
    uv = pixel_uv(px, py, u_pixel, width, height)
    u_lens, smp = sample_2d(smp)
    origin, direction, _cam_pdf = sample_ray_thinlens(
        params["camera"], uv, u_lens
    )

    zeros3 = jnp.zeros((n, 3), jnp.float32)
    state = {
        "origin": origin,
        "direction": direction,
        "throughput": jnp.ones((n, 3), jnp.float32),
        "radiance": zeros3,
        "alive": jnp.ones((n,), bool),
        "firsthit": jnp.ones((n,), bool),
        "position": zeros3,
        "normal": zeros3,
        "depth_aov": jnp.zeros((n,), jnp.float32),
        "texcoord_aov": jnp.zeros((n, 2), jnp.float32),
        "albedo": zeros3,
        "smp": smp,
        "depth": jnp.int32(0),
        "n_path_vertices": jnp.zeros((), jnp.float32),
    }

    def cond(state):
        return (state["depth"] < max_depth) & jnp.any(state["alive"])

    def body(state):
        smp = state["smp"]
        alive = state["alive"]
        throughput = state["throughput"]

        # --- russian roulette (pt.cu:455-462)
        u_rr, smp = sample_1d(smp)
        rr_prob = jnp.where(
            state["depth"] == 0,
            1.0,
            jnp.clip(rgb_to_luminance(throughput), 0.0, 1.0),
        )
        alive = alive & (u_rr < rr_prob)
        throughput = throughput / jnp.maximum(rr_prob, 1e-12)[..., None]

        # --- trace radiance ray
        t_max = jnp.where(alive, RAY_TMAX, -1.0)
        hit = trace_closest(dev, state["origin"], state["direction"], t_max)
        hit_mask = hit["hit"] & alive

        # --- miss: sky on first hit (pt.cu:504-523)
        sky_le = eval_sky(params, state["direction"])
        miss_first = alive & ~hit["hit"] & state["firsthit"]
        radiance = state["radiance"] + jnp.where(
            _mask3(miss_first), throughput * sky_le, 0.0
        )
        alive = alive & hit["hit"]

        n_path_vertices = state["n_path_vertices"] + jnp.sum(
            alive.astype(jnp.float32)
        )

        # --- surface + shading params
        surf = fill_surface_info(
            dev, hit["prim"], hit["u"], hit["v"], state["direction"],
            inst=hit.get("inst"), slot=hit.get("slot"),
        )
        sp = fill_shading_params(dev, surf)
        tangent, normal, bitangent = apply_normal_mapping(dev, surf)

        # --- first-hit AOVs + emissive hit (pt.cu:745-760)
        firsthit = state["firsthit"]
        capture = firsthit & hit_mask
        position = jnp.where(_mask3(capture), surf["x"], state["position"])
        normal_aov = jnp.where(_mask3(capture), normal, state["normal"])
        depth_aov = jnp.where(capture, hit["t"], state["depth_aov"])
        texcoord_aov = jnp.where(
            capture[..., None], surf["texcoord"], state["texcoord_aov"]
        )
        albedo = jnp.where(_mask3(capture), sp["base_color"], state["albedo"])

        emissive = has_emission(dev, surf["mat_id"])
        emit_now = capture & emissive
        radiance = radiance + jnp.where(
            _mask3(emit_now),
            throughput * get_emission(dev, surf["mat_id"], surf["texcoord"]),
            0.0,
        )
        alive = alive & ~emit_now
        firsthit = firsthit & ~capture

        # --- BSDF context
        wo = world_to_local(-state["direction"], tangent, normal, bitangent)
        ctx = bsdf_mod.setup(
            wo, sp, surf["is_entering"],
            dev.get("lobes_on", bsdf_mod.ALL_LOBES),
        )
        shadow_origin = ray_origin_offset(surf["x"], surf["n_g"])

        # --- NEE (pt.cu:767-890): directional (optional), sky, area.
        # All shadow rays share one batched any-hit trace: kernel-launch
        # overhead dominates this backend, so k traces become one over k*N
        # rays. Sample draws stay in the reference's exact order.
        nee_dirs = []
        nee_tmax = []

        if params["has_directional_light"]:
            u2, smp = sample_2d(smp)
            p_sun = sample_position_on_directional_light(params, u2)
            sdir_dl = normalize(p_sun - shadow_origin)
            nee_dirs.append(sdir_dl)
            nee_tmax.append(jnp.where(alive, RAY_TMAX, -1.0))

        # sky: importance-sampled when an IBL distribution is present (our
        # improvement over the reference's TODO at pt.cu:797), else cosine
        u2, smp = sample_2d(smp)
        use_ibl_is = params["sky_mode"] == SKY_IBL and params.get(
            "use_ibl_is", False
        )
        if use_ibl_is:
            sdir_sky, pdf_sky = sample_ibl(params["ibl_dist"], u2)
            wi_sky = world_to_local(sdir_sky, tangent, normal, bitangent)
            cos_sky = jnp.abs(wi_sky[..., 1])
        else:
            wi_sky = sample_cosine_weighted_hemisphere(u2)
            sdir_sky = local_to_world(wi_sky, tangent, normal, bitangent)
            cos_sky = jnp.abs(wi_sky[..., 1])
            pdf_sky = cos_sky / jnp.pi
        nee_dirs.append(sdir_sky)
        nee_tmax.append(jnp.where(alive, RAY_TMAX, -1.0))

        if dev["n_lights"] > 0:
            u1, smp = sample_1d(smp)
            u2, smp = sample_2d(smp)
            p_l, n_l, le_l, pdf_area = sample_position_on_light(dev, u1, u2)
            to_l = p_l - shadow_origin
            r = length(to_l)
            sdir_area = to_l / jnp.maximum(r, 1e-12)[..., None]
            nee_dirs.append(sdir_area)
            nee_tmax.append(jnp.where(alive, r - SHADOW_RAY_EPS, -1.0))

        k = len(nee_dirs)
        n_rays = shadow_origin.shape[0]
        occ_all = trace_any(
            dev,
            jnp.concatenate([shadow_origin] * k),
            jnp.concatenate(nee_dirs),
            jnp.concatenate(nee_tmax),
        )
        occ_parts = [
            occ_all[i * n_rays : (i + 1) * n_rays] for i in range(k)
        ]
        part = iter(occ_parts)

        if params["has_directional_light"]:
            occluded = next(part)
            visible = alive & ~occluded
            wi = world_to_local(sdir_dl, tangent, normal, bitangent)
            f = bsdf_mod.eval(ctx, wo, wi)
            pdf = 1.0
            pdf_bsdf = bsdf_mod.eval_pdf(ctx, wo, wi)
            mis_w = compute_mis_weight(pdf, pdf_bsdf)
            w = regularize_weight(
                throughput
                * (mis_w * jnp.abs(wi[..., 1]) / pdf)[..., None]
                * f
            )
            le = jnp.asarray(params["directional_light"]["le"])
            radiance = radiance + jnp.where(_mask3(visible), w * le, 0.0)

        occluded = next(part)
        visible = alive & ~occluded
        f = bsdf_mod.eval(ctx, wo, wi_sky)
        pdf_bsdf = bsdf_mod.eval_pdf(ctx, wo, wi_sky)
        mis_w = compute_mis_weight(pdf_sky, pdf_bsdf)
        w = regularize_weight(
            throughput
            * jnp.where(
                pdf_sky > 0.0,
                mis_w * cos_sky / jnp.maximum(pdf_sky, 1e-12),
                0.0,
            )[..., None]
            * f
        )
        sky_le_nee = eval_sky(params, sdir_sky)
        radiance = radiance + jnp.where(_mask3(visible), w * sky_le_nee, 0.0)

        if dev["n_lights"] > 0:
            occluded = next(part)
            front = dot(-sdir_area, n_l) > 0.0
            visible = alive & ~occluded & front
            wi = world_to_local(sdir_area, tangent, normal, bitangent)
            f = bsdf_mod.eval(ctx, wo, wi)
            pdf = (
                r
                * r
                / jnp.maximum(jnp.abs(dot(-sdir_area, n_l)), 1e-12)
                * pdf_area
            )
            pdf_bsdf = bsdf_mod.eval_pdf(ctx, wo, wi)
            mis_w = compute_mis_weight(pdf, pdf_bsdf)
            w = regularize_weight(
                throughput
                * (mis_w * jnp.abs(wi[..., 1]) / jnp.maximum(pdf, 1e-12))[
                    ..., None
                ]
                * f
            )
            radiance = radiance + jnp.where(_mask3(visible), w * le_l, 0.0)

        # --- BSDF-sampled light ray with MIS (pt.cu:892-925)
        u1, smp = sample_1d(smp)
        u2, smp = sample_2d(smp)
        wi_l, f_l, pdf_l = bsdf_mod.sample(ctx, wo, u1, u2)
        ldir = local_to_world(wi_l, tangent, normal, bitangent)
        transmitted = dot(ldir, surf["n_g"]) < 0.0
        lorigin = ray_origin_offset(
            surf["x"], jnp.where(_mask3(transmitted), -surf["n_g"], surf["n_g"])
        )
        lhit = trace_closest(dev, lorigin, ldir, jnp.where(alive, RAY_TMAX, -1.0))
        lsurf_prim = jnp.clip(lhit["prim"], 0, dev["n_faces"] - 1)
        small = dev.get("use_dense", False)
        l_mat = gather_rows(dev["face_mat"], lsurf_prim, small)
        fv = gather_rows(dev["face_verts"], lsurf_prim, small)
        fn = gather_rows(dev["face_normals"], lsurf_prim, small)
        fuv = gather_rows(dev["face_uvs"], lsurf_prim, small)
        if "inst_table" in dev and "inst" in lhit:
            lrows = _gather_inst_rows(dev, lhit["inst"])
            fv = _apply_inst_points(lrows, fv)
            fn = _apply_inst_normals(lrows, fn)
        lw0 = (1.0 - lhit["u"] - lhit["v"])[..., None]
        lw1 = lhit["u"][..., None]
        lw2 = lhit["v"][..., None]
        l_p = lw0 * fv[:, 0] + lw1 * fv[:, 1] + lw2 * fv[:, 2]
        l_n = lw0 * fn[:, 0] + lw1 * fn[:, 1] + lw2 * fn[:, 2]
        l_uv = lw0 * fuv[:, 0] + lw1 * fuv[:, 1] + lw2 * fuv[:, 2]
        l_area = 0.5 * length(cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]))
        l_emissive = has_emission(dev, l_mat) & (dot(-ldir, l_n) > 0.0)
        hit_light = lhit["hit"] & l_emissive

        le_hit = get_emission(dev, l_mat, l_uv)
        le_miss = eval_sky(params, ldir)
        le = jnp.where(_mask3(lhit["hit"]), jnp.where(_mask3(hit_light), le_hit, 0.0), le_miss)

        r2 = dot(l_p - lorigin, l_p - lorigin)
        n_lights = max(dev["n_lights"], 1)
        pdf_area_hit = 1.0 / (n_lights * jnp.maximum(l_area, 1e-12))
        pdf_light_hit = (
            r2 / jnp.maximum(jnp.abs(dot(-ldir, l_n)), 1e-12) * pdf_area_hit
        )
        if use_ibl_is:
            pdf_light_miss = ibl_pdf(params["ibl_dist"], ldir)
        else:
            pdf_light_miss = jnp.abs(wi_l[..., 1]) / jnp.pi
        pdf_light = jnp.where(hit_light, pdf_light_hit, pdf_light_miss)

        mis_w = compute_mis_weight(pdf_l, pdf_light)
        w = regularize_weight(
            throughput
            * jnp.where(
                pdf_l > 0.0,
                mis_w * jnp.abs(wi_l[..., 1]) / jnp.maximum(pdf_l, 1e-12),
                0.0,
            )[..., None]
            * f_l
        )
        radiance = radiance + jnp.where(_mask3(alive), w * le, 0.0)

        # --- next bounce (pt.cu:927-943)
        u1, smp = sample_1d(smp)
        u2, smp = sample_2d(smp)
        wi_n, f_n, pdf_n = bsdf_mod.sample(ctx, wo, u1, u2)
        wi_world = local_to_world(wi_n, tangent, normal, bitangent)
        bounce_w = jnp.where(
            pdf_n > 0.0, jnp.abs(wi_n[..., 1]) / jnp.maximum(pdf_n, 1e-12), 0.0
        )
        new_throughput = throughput * f_n * bounce_w[..., None]
        transmitted = dot(wi_world, surf["n_g"]) < 0.0
        new_origin = ray_origin_offset(
            surf["x"], jnp.where(_mask3(transmitted), -surf["n_g"], surf["n_g"])
        )

        # throughput NaN/Inf kill (pt.cu:469)
        tp_ok = is_finite3(new_throughput)
        alive = alive & tp_ok & (pdf_n > 0.0)

        keep = _mask3(state["alive"])
        return {
            "origin": jnp.where(keep & _mask3(alive), new_origin, state["origin"]),
            "direction": jnp.where(
                keep & _mask3(alive), wi_world, state["direction"]
            ),
            "throughput": jnp.where(
                keep & _mask3(alive), new_throughput, state["throughput"]
            ),
            "radiance": jnp.where(keep, radiance, state["radiance"]),
            "alive": alive,
            "firsthit": firsthit,
            "position": position,
            "normal": normal_aov,
            "depth_aov": depth_aov,
            "texcoord_aov": texcoord_aov,
            "albedo": albedo,
            "smp": smp,
            "depth": state["depth"] + 1,
            "n_path_vertices": n_path_vertices,
        }

    state = jax.lax.while_loop(cond, body, state)

    # radiance NaN scrub (pt.cu:474-478)
    radiance = jnp.where(
        _mask3(is_finite3(state["radiance"])), state["radiance"], 0.0
    )
    out = {
        "radiance": radiance,
        "position": state["position"],
        "normal": state["normal"],
        "depth": state["depth_aov"],
        "texcoord": state["texcoord_aov"],
        "albedo": state["albedo"],
    }
    if swz:
        out = {k: unswizzle(v, width, tile_height) for k, v in out.items()}
    out["n_path_vertices"] = state["n_path_vertices"]
    # lane-bounce slots actually executed: occupancy is
    # n_path_vertices / n_lane_slots (dead lanes ride along in every
    # stage of a wavefront bounce — this quantifies the waste)
    out["n_lane_slots"] = state["depth"].astype(jnp.float32) * np.float32(n)
    return out


def render_progressive(dev, params, layers, sample_count, n_samples: int):
    """Accumulate n_samples progressive samples into the render layers with
    the streaming average keyed by per-pixel sample_count (pt.cu:480-501).

    layers: dict of AOV buffers {beauty [N,3], position [N,3], normal [N,3],
    depth [N], texcoord [N,2], albedo [N,3]}; sample_count: [N] uint32.
    Returns (new_layers, new_sample_count).

    The spp loop is a python (trace-time unrolled) loop, NOT lax.scan: a
    scan wrapping the traversal while_loop crashes the axon TPU backend
    (CLAUDE.md), and n_samples is static anyway. Callers that need many
    samples loop on the host over a cached 1-spp jit instead of passing a
    large n_samples here.
    """

    if params.get("use_fused", False):
        from ..fused.pt_fused import render_sample_fused as sample_fn
    else:
        sample_fn = render_sample

    for _ in range(n_samples):
        out = sample_fn(dev, params, sample_count)
        coef = 1.0 / (sample_count.astype(jnp.float32) + 1.0)
        nf = sample_count.astype(jnp.float32)

        def avg(old, new, vec):
            c = coef[..., None] if vec else coef
            nn = nf[..., None] if vec else nf
            return c * (nn * old + new)

        layers = {
            "beauty": avg(layers["beauty"], out["radiance"], True),
            "position": avg(layers["position"], out["position"], True),
            "normal": avg(layers["normal"], out["normal"], True),
            "depth": avg(layers["depth"], out["depth"], False),
            "texcoord": avg(layers["texcoord"], out["texcoord"], True),
            "albedo": avg(layers["albedo"], out["albedo"], True),
            "n_path_vertices": layers["n_path_vertices"]
            + out["n_path_vertices"],
            "n_lane_slots": layers["n_lane_slots"] + out["n_lane_slots"],
        }
        sample_count = sample_count + jnp.uint32(1)
    return layers, sample_count


def make_layers(n: int):
    z3 = jnp.zeros((n, 3), jnp.float32)
    return {
        "beauty": z3,
        "position": z3,
        "normal": z3,
        "depth": jnp.zeros((n,), jnp.float32),
        "texcoord": jnp.zeros((n, 2), jnp.float32),
        "albedo": z3,
        # lifetime count of shaded path vertices (for perf accounting)
        "n_path_vertices": jnp.zeros((), jnp.float32),
        # lifetime count of executed lane-bounce slots; lane occupancy
        # (the wavefront-compaction health metric) = n_path_vertices / this
        "n_lane_slots": jnp.zeros((), jnp.float32),
    }
