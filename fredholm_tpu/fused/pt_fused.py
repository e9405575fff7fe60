"""Fused wavefront integrator: the megakernel pipeline.

Restructures integrator/pt.py's per-bounce while_loop into an UNROLLED
pipeline with three launches per bounce on TPU:

  raygen -> [per bounce d: combined trace (NEE_{d-1} + light_{d-1} +
  radiance_d in ONE call) -> one attribute gather (one-hot matmul) ->
  megakernel (resolve d-1 + shade d + emit all next rays + RR)] ->
  final trace -> final resolve

Sampler draw ORDER matches pt.cu / integrator/pt.py exactly (RR, NEE,
light, bounce; see CLAUDE.md invariants); because depth is unrolled, every
Sobol dimension / CMJ slot is STATIC and the direction-matrix rows bake
into the kernels as constants.

This module holds the pipeline BODIES as shape-agnostic functions over
component planes (dicts of same-shaped arrays) plus a pure-jnp
orchestrator (`render_sample_fused`) that is the correctness oracle and
CPU fallback; fused/kernels.py wraps the same bodies in Pallas kernels for
the TPU fast path.

Supported static envelope (renderer._config gates this; integrator/pt.py
remains the general path): constant/Hosek/IBL sky (IBL incl. environment
importance sampling, jnp bodies only — mosaic has no texel gather),
<= MAX_KERNEL_LIGHTS area lights. Textures ride the in-pipeline bilinear
fetch (TEX_KINDS), including tangent-space normal maps and bump (height)
maps — fetched in the gather stage, applied elementwise in mega_body
(pt.cu:710-742). Alpha-cutout scenes route every trace through the
alpha-aware re-trace loop (pt.cu:545-678 anyhit analog, _trace_c_raw).

Reference: /root/reference/fredholm/modules/pt.cu:418-999 (the megakernel
this wavefront pipeline replaces).
"""

from __future__ import annotations

import os as _os
from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.gather import gather_rows
from ..integrator import pt as pt_mod
from . import cbsdf
from .cmappings import (
    draw_cmj_2d,
    draw_sobol_1d,
    sample_concentric_disk,
    sample_cosine_weighted_hemisphere,
    sample_triangle,
)
from .cvec import (
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

RAY_TMAX = 1e9
SHADOW_RAY_EPS = 1e-3  # pt.cu:11
# perf-decomposition hooks (comma set, tools/probe_terrain_decomp.py):
#   noocc     any-hit occlusion traces return all-unoccluded
#   nogather  attribute fetch returns zeros (same structure)
#   noclosest closest traces beyond the primary return all-miss
# Production value is "" — every hook distorts images, never wavefront
# SHAPES (dispatch structure stays identical for honest timing).
_ABLATE = frozenset(
    x for x in _os.environ.get("FREDHOLM_FUSED_ABLATE", "").split(",") if x
)
MAX_KERNEL_LIGHTS = 16  # in-kernel unrolled light-table select bound

SKY_CONSTANT = 0
SKY_IBL = 1
SKY_HOSEK = 2


# ---------------------------------------------------------------------------
# fused face-attribute table: ONE one-hot gather fetches geometry + material
# + emission for a hit (replaces ~20 separate gathers in integrator/pt.py)

# geometry table: gathered by PRIM via the (large) [2N, F] one-hot matmul
_GEOM_COL_NAMES: List[Tuple[str, int]] = [
    ("v0", 3), ("v1", 3), ("v2", 3),
    ("n0", 3), ("n1", 3), ("n2", 3),
    ("uv0", 2), ("uv1", 2), ("uv2", 2),
    ("area", 1), ("mat_id", 1),
]
# texture kinds servable inside the fused pipeline: the fill_shading_params
# overrides (pt.cu:181-280) plus shading-frame perturbation maps
# (normalmap/heightmap, pt.cu:710-742 — fetched in the gather stage like
# every other kind, applied elementwise in mega_body). Alpha remains the
# renderer-gated exception (it changes the TRACE, not the shade).
TEX_KINDS = (
    "base_color", "specular_color", "specular_roughness", "metalness",
    "metallic_roughness", "coat", "coat_roughness", "emission",
    "normalmap", "heightmap",
)

# material table: gathered by MAT_ID via a tiny [2N, M] one-hot matmul —
# splitting halves the big matmul's width (was ~35% of per-bounce cost).
# Each tx_* group is (texture_id, run_off, width, height, runs_per_row,
# srgb) for the in-pipeline bilinear fetch (scene/texture.py run layout)
_MAT_COL_NAMES: List[Tuple[str, int]] = [
    ("emission_color", 3), ("has_emission", 1),
    ("base_color", 3), ("diffuse", 1), ("diffuse_roughness", 1),
    ("specular", 1), ("specular_color", 3), ("specular_roughness", 1),
    ("metalness", 1), ("coat", 1), ("coat_roughness", 1), ("coat_color", 3),
    ("transmission", 1), ("transmission_color", 3),
    ("sheen", 1), ("sheen_color", 3), ("sheen_roughness", 1),
    ("subsurface", 1), ("subsurface_color", 3), ("thin_walled", 1),
] + [("tx_" + kind, 6) for kind in TEX_KINDS]
COL = {}
_off = 0
for _name, _w in _GEOM_COL_NAMES:
    COL[_name] = _off
    _off += _w
GEOM_COLS_USED = _off
GEOM_COLS = 32  # padded
assert GEOM_COLS_USED <= GEOM_COLS
_off = GEOM_COLS
for _name, _w in _MAT_COL_NAMES:
    COL[_name] = _off
    _off += _w
N_COLS = _off
MAT_COLS = N_COLS - GEOM_COLS


def build_fused_table(dev: Dict) -> np.ndarray:
    """[F, GEOM_COLS] float32 per-face geometry table (+ mat_id).

    Built host-side at scene upload (scene/device.py); the per-hit
    geometry fetch is then ONE one-hot matmul instead of many."""
    fv = np.asarray(dev["face_verts"])  # [F,3,3]
    fn = np.asarray(dev["face_normals"])
    fuv = np.asarray(dev["face_uvs"])
    mat_ids = np.asarray(dev["face_mat"])
    f = fv.shape[0]

    e1 = fv[:, 1] - fv[:, 0]
    e2 = fv[:, 2] - fv[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    out = np.zeros((f, GEOM_COLS), np.float32)

    def put(name, vals):
        vals = np.asarray(vals, np.float32).reshape(f, -1)
        out[:, COL[name]:COL[name] + vals.shape[1]] = vals

    put("v0", fv[:, 0]); put("v1", fv[:, 1]); put("v2", fv[:, 2])
    put("n0", fn[:, 0]); put("n1", fn[:, 1]); put("n2", fn[:, 2])
    put("uv0", fuv[:, 0]); put("uv1", fuv[:, 1]); put("uv2", fuv[:, 2])
    put("area", area)
    put("mat_id", mat_ids)
    return out


def build_fused_mat_table(dev: Dict) -> np.ndarray:
    """[M, MAT_COLS] float32 per-material shading params + emission."""
    m = {k: np.asarray(v) for k, v in dev["materials"].items()}
    n_m = m["base_color"].shape[0]
    ec = m["emission_color"]
    has_em = (
        (ec > 0.0).any(-1) | (m["emission_texture_id"] >= 0)
    ).astype(np.float32)

    out = np.zeros((n_m, MAT_COLS), np.float32)

    def put(name, vals):
        vals = np.asarray(vals, np.float32).reshape(n_m, -1)
        c = COL[name] - GEOM_COLS
        out[:, c:c + vals.shape[1]] = vals

    put("emission_color", ec)
    put("has_emission", has_em)
    for name in (
        "base_color", "diffuse", "diffuse_roughness", "specular",
        "specular_color", "specular_roughness", "metalness", "coat",
        "coat_roughness", "coat_color", "transmission", "transmission_color",
        "sheen", "sheen_color", "sheen_roughness", "subsurface",
        "subsurface_color", "thin_walled",
    ):
        put(name, m[name])
    # per-kind texture headers: (tid, off, w, h, rw, srgb); materials
    # without the texture point at the fallback white row so the fetch is
    # always addressable (callers mask on tid >= 0)
    hdr = dev.get("tex_header")
    if hdr is None:
        hdr = np.zeros((1, 5), np.float32)
    for kind in TEX_KINDS:
        tid = np.asarray(m[kind + "_texture_id"]).astype(np.int32)
        k = np.where(
            (tid >= 0) & (tid < hdr.shape[0]), tid, hdr.shape[0] - 1
        )
        put(
            "tx_" + kind,
            np.concatenate(
                [tid[:, None].astype(np.float32), hdr[k]], axis=1
            ),
        )
    return out


def build_light_table(dev: Dict) -> np.ndarray:
    """[max(L,1), 24] float32: per emissive face verts(9) normals(9) le(3)
    area(1) for the in-kernel area-light select (pt.cu:282-322 analog).

    Reads the world-space light SoA (scene/device.py `_light_soa`), so it
    is exact for instanced emissive geometry too."""
    fv = np.asarray(dev["light_verts"])  # [L', 3, 3] (L' = max(L, 1))
    fn = np.asarray(dev["light_normals"])
    mat_ids = np.asarray(dev["light_mat"])
    le = np.asarray(dev["materials"]["emission_color"])[
        np.clip(mat_ids, 0, len(np.asarray(dev["materials"]["emission_color"])) - 1)
    ]
    e1 = fv[:, 1] - fv[:, 0]
    e2 = fv[:, 2] - fv[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    out = np.zeros((fv.shape[0], 24), np.float32)
    out[:, 0:9] = fv.reshape(-1, 9)
    out[:, 9:18] = fn.reshape(-1, 9)
    out[:, 18:21] = le
    out[:, 21] = area
    return out


# ---------------------------------------------------------------------------
# scalar-vector packing (SMEM payload for the kernels)

SV_SIZE = 64
_SV = {
    "cam": 0,           # 12: camera-to-world [3,4] row-major
    "fov": 12, "F": 13, "focus": 14,
    "sky_intensity": 15,
    "bg": 16,           # 3
    "sun_dir": 19,      # 3
    "dl_le": 22, "dl_dir": 25, "dl_angle": 28,
    "hosek_cfg": 29,    # 27 = 3 channels x 9 coeffs
    "hosek_rad": 56,    # 3
}
USV_SIZE = 8
_USV = {"seed_hash": 0, "n_pixels": 1}


def pack_scalars(params: Dict, n_pixels: int):
    """(sv [SV_SIZE] f32, usv [USV_SIZE] u32) from the dynamic params."""
    from ..core.rng import xxhash32

    sv = jnp.zeros((SV_SIZE,), jnp.float32)
    cam = params["camera"]
    sv = sv.at[0:12].set(jnp.asarray(cam["transform"]).reshape(-1))
    sv = sv.at[12].set(cam["fov"])
    sv = sv.at[13].set(cam["F"])
    sv = sv.at[14].set(cam["focus"])
    sv = sv.at[15].set(jnp.float32(params.get("sky_intensity", 1.0)))
    sv = sv.at[16:19].set(
        jnp.asarray(params.get("bg_color", jnp.zeros(3, jnp.float32)))
    )
    sv = sv.at[19:22].set(
        jnp.asarray(
            params.get("sun_direction", jnp.zeros(3, jnp.float32))
        )
    )
    if "directional_light" in params:
        dl = params["directional_light"]
        sv = sv.at[22:25].set(jnp.asarray(dl["le"]))
        sv = sv.at[25:28].set(jnp.asarray(dl["dir"]))
        sv = sv.at[28].set(dl["angle"])
    if "hosek" in params:
        h = params["hosek"]
        sv = sv.at[29:56].set(jnp.asarray(h["configs"]).reshape(-1))
        sv = sv.at[56:59].set(jnp.asarray(h["radiances"]))

    usv = jnp.zeros((USV_SIZE,), jnp.uint32)
    usv = usv.at[0].set(
        xxhash32(jnp.asarray(params["seed"]).astype(jnp.uint32))
    )
    usv = usv.at[1].set(jnp.uint32(n_pixels % (1 << 32)))
    return sv, usv


def _sv3(sv, base) -> V3:
    return V3(sv[base], sv[base + 1], sv[base + 2])


# ---------------------------------------------------------------------------
# static pipeline config


class FusedConfig(NamedTuple):
    width: int
    height: int
    max_depth: int
    sky_mode: int           # SKY_CONSTANT, SKY_IBL or SKY_HOSEK
    has_dl: bool
    n_lights: int
    lobes_on: tuple
    # texture kinds any scene material actually uses (subset of TEX_KINDS);
    # empty tuple compiles the whole fetch machinery away
    tex_kinds: tuple = ()
    # luminance-weighted environment NEE (sky/ibl.py distribution); only
    # meaningful with sky_mode == SKY_IBL. IBL modes run the jnp pipeline
    # (mosaic has no gather for the texel fetch) — still ~10x the general
    # wavefront path
    use_ibl_is: bool = False

    @property
    def has_area(self) -> bool:
        return self.n_lights > 0

    @property
    def nee_blocks(self) -> tuple:
        b = ("sky",)
        if self.has_dl:
            b = b + ("dl",)
        if self.has_area:
            b = b + ("area",)
        return b

    @property
    def n1(self) -> int:  # Sobol 1D draws per bounce
        return 3 + (1 if self.has_area else 0)

    @property
    def n2(self) -> int:  # CMJ 2D draws per bounce
        return 3 + (1 if self.has_dl else 0) + (1 if self.has_area else 0)

    def sobol_dim(self, d: int, slot: int) -> int:
        """slot 0=rr, then area_u1 (if any), light_u1, bounce_u1 in order."""
        return 1 + d * self.n1 + slot

    def cmj_depth(self, d: int, slot: int) -> int:
        """slot among present [dl, sky, area, light, bounce] in order."""
        return 2 + d * self.n2 + slot


def fused_supported(dev: Dict, params: Dict) -> bool:
    """Static envelope check (see module docstring). Normal/height maps
    ride the in-pipeline fetch (TEX_KINDS) and alpha cutout the
    alpha-aware trace wrappers (_trace_c_raw), both since round 5."""
    return (
        params["sky_mode"] in (SKY_CONSTANT, SKY_IBL, SKY_HOSEK)
        and dev.get("n_lights", 0) <= MAX_KERNEL_LIGHTS
        and (params["width"] * params.get("tile_height", params["height"]))
        % 128 == 0
    )


# ---------------------------------------------------------------------------
# pipeline bodies (shape-agnostic: run on [N] arrays under jnp or on
# [S, 128] tiles inside Pallas kernels)


def _acos_poly(x):
    """acos via the Abramowitz-Stegun 4.4.45 7-term polynomial (|err| <
    2e-8 rad) — Mosaic has no acos primitive; used in BOTH the jnp oracle
    and the Pallas kernels so they stay bit-identical."""
    ax = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + jnp.float32(c)
    r = p * jnp.sqrt(jnp.maximum(1.0 - ax, 0.0))
    return jnp.where(x < 0.0, jnp.float32(np.pi) - r, r)


def eval_sky_c(cfg: FusedConfig, sv, v: V3, ibl_env=None) -> V3:
    """Component-form eval_sky (pt.py:168-181).

    Trig is restructured for the VPU: cos(arccos(y)) == y cancels every
    trig pair except the one gamma needed by exp(c4*gamma), which uses
    the polynomial acos; pow(m, 1.5) becomes m*sqrt(m). IBL mode calls
    the SAME fetch_ibl as the general path (bit-identical images); it is
    jnp-only (mosaic has no texel gather)."""
    if cfg.sky_mode == SKY_CONSTANT:
        bg = _sv3(sv, _SV["bg"])
        one = jnp.ones_like(v.y)
        return V3(bg.x * one, bg.y * one, bg.z * one)

    if cfg.sky_mode == SKY_IBL:
        from ..sky.ibl import fetch_ibl

        arr = fetch_ibl(
            ibl_env, jnp.stack([v.x, v.y, v.z], -1),
            sv[_SV["sky_intensity"]],
        )
        return V3(arr[..., 0], arr[..., 1], arr[..., 2])

    # Hosek (sky/hosek.py sky_radiance, arhosek.cu:103-127)
    intensity = sv[_SV["sky_intensity"]]
    sun = _sv3(sv, _SV["sun_dir"])
    cos_g = jnp.clip(sun.x * v.x + sun.y * v.y + sun.z * v.z, -1.0, 1.0)
    gamma = _acos_poly(cos_g)
    # theta = min(arccos(y), pi/2 - 1e-3)  =>  cos_t = max(y, cos(pi/2-1e-3))
    cos_t = jnp.maximum(
        jnp.clip(v.y, -1.0, 1.0), jnp.float32(np.cos(0.5 * np.pi - 1e-3))
    )
    zenith = jnp.sqrt(jnp.maximum(cos_t, 0.0))
    ray_m = cos_g * cos_g
    out = []
    for ch in range(3):
        base = _SV["hosek_cfg"] + 9 * ch
        c = [sv[base + k] for k in range(9)]
        exp_m = jnp.exp(c[4] * gamma)
        mie_b = jnp.maximum(1.0 + c[8] * c[8] - 2.0 * c[8] * cos_g, 1e-8)
        mie_m = (1.0 + cos_g * cos_g) / (mie_b * jnp.sqrt(mie_b))
        r = (1.0 + c[0] * jnp.exp(c[1] / (cos_t + 0.01))) * (
            c[2] + c[3] * exp_m + c[5] * ray_m + c[6] * mie_m + c[7] * zenith
        )
        out.append(jnp.maximum(r * sv[_SV["hosek_rad"] + ch], 0.0))
    return V3(out[0] * intensity, out[1] * intensity, out[2] * intensity)


def raygen_body(cfg: FusedConfig, sv, usv, px, py, image_idx, n_spp):
    """Camera ray + depth-0 RR draw (pt.cu:418-462 head).

    px/py: f32 pixel coords; image_idx/n_spp: u32 planes. Returns a state
    dict (o/d V3, tmax, thr V3, alive, sample_idx u32)."""
    seed_hash = usv[_USV["seed_hash"]]
    n_pixels = usv[_USV["n_pixels"]]
    sample_idx = image_idx + n_spp * n_pixels

    # camera draws: CMJ depths 0 (pixel jitter) and 1 (lens)
    jx, jy = draw_cmj_2d(n_spp, image_idx, 0, seed_hash)
    lx, ly = draw_cmj_2d(n_spp, image_idx, 1, seed_hash)

    # pixel_uv (camera.py:146-151)
    u = (2.0 * (px + jx) - cfg.width) / cfg.height
    v = (2.0 * (py + jy) - cfg.height) / cfg.height
    uvx, uvy = -u, v

    # thin-lens (camera.cu:24-53 / camera.py:169-194)
    f = 1.0 / jnp.tan(0.5 * sv[_SV["fov"]])
    b = sv[_SV["focus"]]
    a = 1.0 / (1.0 + f - 1.0 / b)
    lens_radius = 2.0 * f / sv[_SV["F"]]

    zeros = jnp.zeros_like(uvx)
    p_sensor = V3(uvx, uvy, zeros)
    p_lens_center = V3(zeros, zeros, zeros + f)
    dx, dy = sample_concentric_disk(lx, ly)
    p_lens = V3(
        p_lens_center.x + lens_radius * dx,
        p_lens_center.y + lens_radius * dy,
        p_lens_center.z,
    )
    stl = normalize(p_lens_center - p_sensor)
    t_obj = (a + b) / stl.z
    p_object = V3(
        p_sensor.x + t_obj * stl.x,
        p_sensor.y + t_obj * stl.y,
        p_sensor.z + t_obj * stl.z,
    )

    m = [sv[_SV["cam"] + k] for k in range(12)]
    origin = V3(
        m[0] * p_lens.x + m[1] * p_lens.y + m[2] * p_lens.z + m[3],
        m[4] * p_lens.x + m[5] * p_lens.y + m[6] * p_lens.z + m[7],
        m[8] * p_lens.x + m[9] * p_lens.y + m[10] * p_lens.z + m[11],
    )
    dloc = normalize(p_object - p_lens)
    dloc = V3(dloc.x, dloc.y, -dloc.z)  # z-flip (camera.cu:19)
    direction = V3(
        m[0] * dloc.x + m[1] * dloc.y + m[2] * dloc.z,
        m[4] * dloc.x + m[5] * dloc.y + m[6] * dloc.z,
        m[8] * dloc.x + m[9] * dloc.y + m[10] * dloc.z,
    )

    # depth-0 RR draw (prob 1; the draw is still consumed, pt.cu:455-462)
    u_rr = draw_sobol_1d(sample_idx, cfg.sobol_dim(0, 0), seed_hash)
    alive = u_rr < 1.0
    one = jnp.ones_like(u_rr)
    return {
        "o": origin,
        "d": direction,
        "tmax": jnp.where(alive, RAY_TMAX, -1.0),
        "thr": V3(one, one, one),
        "alive": alive,
        "sample_idx": sample_idx,
    }


def _interp3(attr, base, w0, w1, w2) -> V3:
    """Interpolate a per-vertex vec3 attribute laid out as 9 consecutive
    columns (v0.xyz, v1.xyz, v2.xyz) starting at `base`."""
    return V3(
        w0 * attr[base + 0] + w1 * attr[base + 3] + w2 * attr[base + 6],
        w0 * attr[base + 1] + w1 * attr[base + 4] + w2 * attr[base + 7],
        w0 * attr[base + 2] + w1 * attr[base + 5] + w2 * attr[base + 8],
    )


def _attr3(attr, name) -> V3:
    c = COL[name]
    return V3(attr[c], attr[c + 1], attr[c + 2])


def _shading_params_from_attr(attr) -> Dict:
    """fill_shading_params, no-texture path (pt.py:222-256)."""
    return {
        "base_color": _attr3(attr, "base_color"),
        "diffuse": attr[COL["diffuse"]],
        "diffuse_roughness": attr[COL["diffuse_roughness"]],
        "specular": attr[COL["specular"]],
        "specular_color": _attr3(attr, "specular_color"),
        "specular_roughness": jnp.clip(
            attr[COL["specular_roughness"]], 0.01, 1.0
        ),
        "metalness": attr[COL["metalness"]],
        "coat": jnp.clip(attr[COL["coat"]], 0.0, 1.0),
        "coat_roughness": jnp.clip(attr[COL["coat_roughness"]], 0.0, 1.0),
        "coat_color": _attr3(attr, "coat_color"),
        "transmission": attr[COL["transmission"]],
        "transmission_color": _attr3(attr, "transmission_color"),
        "sheen": attr[COL["sheen"]],
        "sheen_color": _attr3(attr, "sheen_color"),
        "sheen_roughness": attr[COL["sheen_roughness"]],
        "subsurface": attr[COL["subsurface"]],
        "subsurface_color": _attr3(attr, "subsurface_color"),
        "thin_walled": attr[COL["thin_walled"]],
    }


def fetch_texture_planes(dev, cfg: FusedConfig, attrs, w1, w2):
    """Pre-fetch texture overrides into extra attr planes during the gather
    stage (native gathers are illegal inside Pallas kernels; the shade
    bodies consume these planes elementwise).

    attrs: column dict from _gather_attrs (mutated in place); w1/w2: hit
    barycentrics. Adds, per kind in cfg.tex_kinds, planes
    tx_<kind>_{has,r,g,b}. One run-row gather per kind (scene/texture.py)."""
    if not cfg.tex_kinds:
        return
    from ..scene.texture import sample_texture_hdr

    w0 = 1.0 - w1 - w2
    u = (
        w0 * attrs[COL["uv0"]] + w1 * attrs[COL["uv1"]]
        + w2 * attrs[COL["uv2"]]
    )
    v = (
        w0 * attrs[COL["uv0"] + 1] + w1 * attrs[COL["uv1"] + 1]
        + w2 * attrs[COL["uv2"] + 1]
    )
    uv = jnp.stack([u, v], axis=-1)
    for kind in cfg.tex_kinds:
        base = COL["tx_" + kind]
        tid = attrs[base]
        hdr_cols = tuple(attrs[base + i] for i in range(1, 6))
        if kind == "heightmap":
            # bump mapping needs forward differences (pt.py
            # apply_normal_mapping / pt.cu:710-725): three taps at uv,
            # uv+du, uv+dv with du/dv = one texel — fetched here, the
            # derivative planes are consumed elementwise in mega_body
            du = 1.0 / hdr_cols[1]
            dv = 1.0 / hdr_cols[2]
            tx = dev["textures"]
            h0 = sample_texture_hdr(tx, tid, uv, hdr_cols)[..., 0]
            hdu = sample_texture_hdr(
                tx, tid, jnp.stack([u + du, v], -1), hdr_cols
            )[..., 0]
            hdv = sample_texture_hdr(
                tx, tid, jnp.stack([u, v + dv], -1), hdr_cols
            )[..., 0]
            attrs["tx_heightmap_has"] = jnp.where(tid >= 0.0, 1.0, 0.0)
            attrs["tx_heightmap_dfdu"] = hdu - h0
            attrs["tx_heightmap_dfdv"] = hdv - h0
            continue
        rgba = sample_texture_hdr(dev["textures"], tid, uv, hdr_cols)
        # f32 (not bool): these planes may enter Pallas kernels as inputs
        attrs["tx_" + kind + "_has"] = jnp.where(tid >= 0.0, 1.0, 0.0)
        attrs["tx_" + kind + "_r"] = rgba[..., 0]
        attrs["tx_" + kind + "_g"] = rgba[..., 1]
        attrs["tx_" + kind + "_b"] = rgba[..., 2]


def _apply_tex_overrides(cfg: FusedConfig, sp: Dict, attrs):
    """fill_shading_params texture overrides (pt.py:335-384, pt.cu:181-280)
    from pre-fetched planes — elementwise only, Pallas-legal."""
    kinds = cfg.tex_kinds
    if not kinds:
        return

    def has(k):
        return attrs["tx_" + k + "_has"] > 0.0

    def c3(k):
        return V3(
            attrs["tx_" + k + "_r"],
            attrs["tx_" + k + "_g"],
            attrs["tx_" + k + "_b"],
        )

    def c1(k, ch="r"):
        return attrs["tx_" + k + "_" + ch]

    if "base_color" in kinds:
        sp["base_color"] = where3(
            has("base_color"), c3("base_color"), sp["base_color"]
        )
    if "specular_color" in kinds:
        sp["specular_color"] = where3(
            has("specular_color"), c3("specular_color"), sp["specular_color"]
        )
    if "specular_roughness" in kinds:
        sp["specular_roughness"] = jnp.where(
            has("specular_roughness"),
            jnp.clip(c1("specular_roughness"), 0.01, 1.0),
            sp["specular_roughness"],
        )
    if "metalness" in kinds:
        sp["metalness"] = jnp.where(
            has("metalness"), c1("metalness"), sp["metalness"]
        )
    if "metallic_roughness" in kinds:
        # glTF metallic-roughness packing (pt.cu:230-236): g=roughness,
        # b=metalness
        h = has("metallic_roughness")
        sp["specular_roughness"] = jnp.where(
            h,
            jnp.clip(c1("metallic_roughness", "g"), 0.01, 1.0),
            sp["specular_roughness"],
        )
        sp["metalness"] = jnp.where(
            h,
            jnp.clip(c1("metallic_roughness", "b"), 0.0, 1.0),
            sp["metalness"],
        )
    if "coat" in kinds:
        sp["coat"] = jnp.where(
            has("coat"), jnp.clip(c1("coat"), 0.0, 1.0), sp["coat"]
        )
    if "coat_roughness" in kinds:
        # reference quirk: reads channel .y of the coat-roughness texture
        sp["coat_roughness"] = jnp.where(
            has("coat_roughness"),
            jnp.clip(c1("coat_roughness", "g"), 0.0, 1.0),
            sp["coat_roughness"],
        )


def emission_from_attrs(cfg: FusedConfig, attrs) -> V3:
    """Emission with optional emission-texture override (pt.cu:131-139)."""
    le = _attr3(attrs, "emission_color")
    if "emission" in cfg.tex_kinds:
        le = where3(
            attrs["tx_emission_has"] > 0.0,
            V3(
                attrs["tx_emission_r"],
                attrs["tx_emission_g"],
                attrs["tx_emission_b"],
            ),
            le,
        )
    return le


def _select_light(light_table, n_lights: int, u1):
    """Unrolled light-row select by sampled index (pt.cu:282-322 head).
    light_table must support static scalar indexing [l, col]."""
    idx = jnp.clip(
        (u1 * n_lights).astype(jnp.int32), 0, max(n_lights - 1, 0)
    )

    def sel(col):
        out = jnp.zeros_like(u1)
        for l in range(n_lights):
            out = jnp.where(idx == l, light_table[l, col], out)
        return out

    def sel3(col):
        return V3(sel(col), sel(col + 1), sel(col + 2))

    return (
        sel3(0), sel3(3), sel3(6),    # verts
        sel3(9), sel3(12), sel3(15),  # normals
        sel3(18),                      # le
        sel(21),                       # area
    )


def _clip3(v: V3, lo, hi) -> V3:
    return V3(
        jnp.clip(v.x, lo, hi), jnp.clip(v.y, lo, hi), jnp.clip(v.z, lo, hi)
    )


def _resolve_pending(cfg: FusedConfig, sv, rad: V3, resolve: Dict,
                     ibl_env=None) -> V3:
    """Apply bounce d-1's pending NEE visibility + BSDF-light-ray MIS
    (pt.cu:767-925 tails)."""
    zero = jnp.zeros_like(rad.x)
    z3 = V3(zero, zero, zero)
    for blk in cfg.nee_blocks:
        vis = ~resolve["occ_" + blk]
        c = resolve["c_" + blk]
        rad = rad + where3(vis, c, z3)

    ldir = resolve["l_d"]
    l_hit = resolve["l_hit"]
    le_miss = eval_sky_c(cfg, sv, ldir, ibl_env)
    if cfg.sky_mode == SKY_IBL and cfg.use_ibl_is:
        # MIS against the environment distribution (pt.py:843-844)
        from ..sky.ibl import ibl_pdf

        pdf_light_miss = ibl_pdf(
            ibl_env["dist"], jnp.stack([ldir.x, ldir.y, ldir.z], -1)
        )
    else:
        pdf_light_miss = jnp.abs(resolve["wi_l_y"]) / jnp.pi
    if not cfg.has_area:
        # no emissive face exists, so a light-ray HIT contributes nothing
        # and the MIS pdf is always the miss (sky) pdf — the light trace
        # only needs the occlusion boolean (it rode the any-hit kernel)
        le = where3(l_hit, z3, le_miss)
        pdf_light = pdf_light_miss
    else:
        la = resolve["lattr"]
        lw1 = resolve["l_u"]
        lw2 = resolve["l_v"]
        lw0 = 1.0 - lw1 - lw2
        l_p = _interp3(la, COL["v0"], lw0, lw1, lw2)
        l_n = _interp3(la, COL["n0"], lw0, lw1, lw2)
        l_emissive = (
            (la[COL["has_emission"]] > 0.0) & (dot(-ldir, l_n) > 0.0)
        )
        hit_light = l_hit & l_emissive

        le_hit = emission_from_attrs(cfg, la)
        le = where3(l_hit, where3(hit_light, le_hit, z3), le_miss)

        to_p = l_p - resolve["l_o"]
        r2 = dot(to_p, to_p)
        n_l = max(cfg.n_lights, 1)
        pdf_area_hit = 1.0 / (n_l * jnp.maximum(la[COL["area"]], 1e-12))
        pdf_light_hit = (
            r2 / jnp.maximum(jnp.abs(dot(-ldir, l_n)), 1e-12) * pdf_area_hit
        )
        pdf_light = jnp.where(hit_light, pdf_light_hit, pdf_light_miss)
    pdf_l = resolve["pdf_l"]
    # guard 0/0 (pt.py keeps mis_w inside a pdf_l>0 where-branch)
    mis_w = jnp.where(
        pdf_l > 0.0, pdf_l / jnp.maximum(pdf_l + pdf_light, 1e-20), 0.0
    )
    w = _clip3(resolve["tpf"] * vsplat(mis_w), 0.0, 1.0)
    return rad + w * le



def _nee_tmax(c: V3, tmax):
    """Kill a shadow/light ray whose pending contribution is exactly
    zero: the occlusion boolean multiplies c in the resolve, so the
    trace result is irrelevant — EXACT (bit-identical images), and
    zero-contribution lanes are spatially coherent (slopes facing away
    from the sun, back-facing lights), so whole tiles drop out of the
    any-hit dispatches (67% of the terrain render, PERF.md round 5)."""
    nz = (c.x > 0.0) | (c.y > 0.0) | (c.z > 0.0)
    return jnp.where(nz, tmax, -1.0)


def mega_body(
    cfg: FusedConfig,
    d: int,
    sv,
    usv,
    image_idx,
    n_spp,
    sample_idx,
    light_table,
    state: Dict,
    rhit: Dict,
    rattr: Dict,
    resolve: Dict,
    ibl_env=None,
):
    """Resolve bounce d-1 pending transport, shade bounce d, emit all of
    bounce d's rays + next RR (pt.cu:455-943 for one depth).

    Returns (new_state, rays {blk: (o V3, d V3, tmax)}, pending, aovs)."""
    seed_hash = usv[_USV["seed_hash"]]
    alive = state["alive"]
    thr = state["thr"]
    zero = jnp.zeros_like(rhit["t"])
    z3 = V3(zero, zero, zero)
    rad = state["rad"] if state.get("rad") is not None else z3
    nv = state["nv"] if state.get("nv") is not None else zero

    if d > 0:
        rad = _resolve_pending(cfg, sv, rad, resolve, ibl_env)

    # ---- shade bounce d
    hit = rhit["hit"]
    direction = state["d"]

    if d == 0:
        # sky on first-hit miss (pt.cu:504-523)
        sky_le = eval_sky_c(cfg, sv, direction, ibl_env)
        miss_first = alive & ~hit
        rad = rad + where3(miss_first, thr * sky_le, z3)
    alive = alive & hit
    nv = nv + jnp.where(alive, 1.0, 0.0)  # bool->f32 cast is unsupported in Mosaic

    # surface info (pt.py fill_surface_info)
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

    # bump + normal mapping (pt.py apply_normal_mapping / pt.cu:710-742),
    # from the planes pre-fetched in the gather stage — elementwise only,
    # so the same code runs under jnp and inside the Pallas megakernel.
    # Frames must match the general path bit-for-bit (equivalence tests).
    if "heightmap" in cfg.tex_kinds:
        use_h = rattr["tx_heightmap_has"] > 0.0
        t_b = normalize(tangent + vsplat(rattr["tx_heightmap_dfdu"]) * n_s)
        b_b = normalize(
            bitangent + vsplat(rattr["tx_heightmap_dfdv"]) * n_s
        )
        n_b = normalize(cross(t_b, b_b))
        p_tangent = where3(use_h, t_b, tangent)
        p_bitangent = where3(use_h, b_b, bitangent)
        p_n_s = where3(use_h, n_b, n_s)
    else:
        p_tangent, p_bitangent, p_n_s = tangent, bitangent, n_s
    if "normalmap" in cfg.tex_kinds:
        use_n = rattr["tx_normalmap_has"] > 0.0
        # tangent-space map with +Z normal; the local frame is +Y, so the
        # decoded (x, y, z) swizzles to (x, z, y) — built on the
        # UN-perturbed frame, exactly as the general path does
        n_m = normalize(local_to_world(
            V3(
                rattr["tx_normalmap_r"] * 2.0 - 1.0,
                rattr["tx_normalmap_b"] * 2.0 - 1.0,
                rattr["tx_normalmap_g"] * 2.0 - 1.0,
            ),
            tangent, n_s, bitangent,
        ))
        p_n_s = where3(use_n, n_m, p_n_s)
        t_m, b_m = orthonormal_basis(p_n_s)
        p_tangent = where3(use_n, t_m, p_tangent)
        p_bitangent = where3(use_n, b_m, p_bitangent)
    tangent, bitangent, n_s = p_tangent, p_bitangent, p_n_s

    sp = _shading_params_from_attr(rattr)
    _apply_tex_overrides(cfg, sp, rattr)

    aovs = None
    if d == 0:
        # first-hit AOVs + emissive-hit termination (pt.cu:745-760)
        capture = alive
        aovs = {
            "position": where3(capture, x, z3),
            "normal": where3(capture, n_s, z3),
            "depth": jnp.where(capture, rhit["t"], 0.0),
            "texcoord_u": jnp.where(capture, texcoord_u, 0.0),
            "texcoord_v": jnp.where(capture, texcoord_v, 0.0),
            "albedo": where3(capture, sp["base_color"], z3),
        }
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

    # ---- NEE (pt.cu:767-890); draw order [dl], sky, [area]
    cmj_slot = 0
    if cfg.has_dl:
        ux, uy = draw_cmj_2d(
            n_spp, image_idx, cfg.cmj_depth(d, cmj_slot), seed_hash
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

        wi = world_to_local(sdir_dl, tangent, n_s, bitangent)
        f = cbsdf.eval(ctx, wo, wi)
        pdf_bsdf = cbsdf.eval_pdf(ctx, wo, wi)
        mis_w = 1.0 / (1.0 + pdf_bsdf)
        wgt = _clip3(thr * vsplat(mis_w * jnp.abs(wi.y)) * f, 0.0, 1.0)
        le_dl = _sv3(sv, _SV["dl_le"])
        c_dl = V3(wgt.x * le_dl.x, wgt.y * le_dl.y, wgt.z * le_dl.z)
        pending["c_dl"] = where3(alive, c_dl, z3)
        rays["dl"] = (shadow_origin, sdir_dl,
                      _nee_tmax(pending["c_dl"], shadow_tmax))

    # sky NEE (pt.cu:796-857): cosine-hemisphere, or importance-sampled
    # from the environment distribution when one is wired (pt.py:709-721)
    ux, uy = draw_cmj_2d(
        n_spp, image_idx, cfg.cmj_depth(d, cmj_slot), seed_hash
    )
    cmj_slot += 1
    if cfg.sky_mode == SKY_IBL and cfg.use_ibl_is:
        from ..sky.ibl import sample_ibl

        sdir_arr, pdf_sky = sample_ibl(
            ibl_env["dist"], jnp.stack([ux, uy], -1)
        )
        sdir_sky = V3(sdir_arr[..., 0], sdir_arr[..., 1], sdir_arr[..., 2])
        wi_sky = world_to_local(sdir_sky, tangent, n_s, bitangent)
        cos_sky = jnp.abs(wi_sky.y)
    else:
        wi_sky = sample_cosine_weighted_hemisphere(ux, uy)
        sdir_sky = local_to_world(wi_sky, tangent, n_s, bitangent)
        cos_sky = jnp.abs(wi_sky.y)
        pdf_sky = cos_sky / jnp.pi
    f = cbsdf.eval(ctx, wo, wi_sky)
    pdf_bsdf = cbsdf.eval_pdf(ctx, wo, wi_sky)
    mis_w = pdf_sky / (pdf_sky + pdf_bsdf)
    scale = jnp.where(
        pdf_sky > 0.0, mis_w * cos_sky / jnp.maximum(pdf_sky, 1e-12), 0.0
    )
    wgt = _clip3(thr * vsplat(scale) * f, 0.0, 1.0)
    sky_le_nee = eval_sky_c(cfg, sv, sdir_sky, ibl_env)
    pending["c_sky"] = where3(alive, wgt * sky_le_nee, z3)
    rays["sky"] = (shadow_origin, sdir_sky,
                   _nee_tmax(pending["c_sky"], shadow_tmax))

    sobol_slot = 1
    if cfg.has_area:
        u1 = draw_sobol_1d(
            sample_idx, cfg.sobol_dim(d, sobol_slot), seed_hash
        )
        sobol_slot += 1
        ux, uy = draw_cmj_2d(
            n_spp, image_idx, cfg.cmj_depth(d, cmj_slot), seed_hash
        )
        cmj_slot += 1
        fv0l, fv1l, fv2l, fn0l, fn1l, fn2l, le_l, area_l = _select_light(
            light_table, cfg.n_lights, u1
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
        rays["area"] = (
            shadow_origin,
            sdir_area,
            _nee_tmax(pending["c_area"],
                      jnp.where(alive, r - SHADOW_RAY_EPS, -1.0)),
        )

    # ---- BSDF-sampled light ray (pt.cu:892-925 head)
    u1 = draw_sobol_1d(sample_idx, cfg.sobol_dim(d, sobol_slot), seed_hash)
    sobol_slot += 1
    ux, uy = draw_cmj_2d(
        n_spp, image_idx, cfg.cmj_depth(d, cmj_slot), seed_hash
    )
    cmj_slot += 1
    wi_l, f_l, pdf_l = cbsdf.sample(ctx, wo, u1, ux, uy)
    ldir = local_to_world(wi_l, tangent, n_s, bitangent)
    transmitted = dot(ldir, n_g) < 0.0
    lorigin = ray_origin_offset(x, where3(transmitted, -n_g, n_g))

    tpf_scale = jnp.where(
        pdf_l > 0.0, jnp.abs(wi_l.y) / jnp.maximum(pdf_l, 1e-12), 0.0
    )
    pending["tpf"] = where3(alive, thr * vsplat(tpf_scale) * f_l, z3)
    # tpf == 0 zeroes the whole MIS term (resolve multiplies by
    # clip(tpf * mis)), so the light trace is irrelevant — same exact
    # kill as _nee_tmax
    rays["light"] = (lorigin, ldir,
                     _nee_tmax(pending["tpf"],
                               jnp.where(alive, RAY_TMAX, -1.0)))
    pending["pdf_l"] = pdf_l
    pending["wi_l_y"] = wi_l.y

    # ---- next bounce (pt.cu:927-943)
    u1 = draw_sobol_1d(sample_idx, cfg.sobol_dim(d, sobol_slot), seed_hash)
    ux, uy = draw_cmj_2d(
        n_spp, image_idx, cfg.cmj_depth(d, cmj_slot), seed_hash
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

    # dead lanes keep stale ray state (pt.py `keep` masking)
    new_o = where3(alive_next, new_o, state["o"])
    new_d = where3(alive_next, wi_world, direction)
    new_thr = where3(alive_next, new_thr, thr)

    # ---- RR for bounce d+1 (drawn here == start of pt.cu body d+1)
    if d + 1 < cfg.max_depth:
        u_rr = draw_sobol_1d(
            sample_idx, cfg.sobol_dim(d + 1, 0), seed_hash
        )
        rr_prob = jnp.clip(rgb_to_luminance(new_thr), 0.0, 1.0)
        alive_next = alive_next & (u_rr < rr_prob)
        inv_rr = 1.0 / jnp.maximum(rr_prob, 1e-12)
        new_thr = V3(
            new_thr.x * inv_rr, new_thr.y * inv_rr, new_thr.z * inv_rr
        )

    rays["rad"] = (new_o, new_d, jnp.where(alive_next, RAY_TMAX, -1.0))

    new_state = {
        "o": new_o,
        "d": new_d,
        "thr": new_thr,
        "alive": alive_next,
        "rad": rad,
        "nv": nv,
    }
    return new_state, rays, pending, aovs


def final_resolve_body(cfg: FusedConfig, sv, state: Dict, resolve: Dict,
                       ibl_env=None):
    """Resolve the LAST bounce's pending transport + NaN scrub
    (pt.cu:474-478)."""
    rad = _resolve_pending(cfg, sv, state["rad"], resolve, ibl_env)
    zero = jnp.zeros_like(rad.x)
    return where3(is_finite3(rad), rad, V3(zero, zero, zero))


# ---------------------------------------------------------------------------
# pure-jnp orchestrator (oracle + CPU fallback)


def _trace_c(dev, o: V3, dd: V3, t, coherent=False):
    """Component-layout trace: feeds the Pallas dense kernel without an
    [N,3] interleave; falls back to the stacked dispatcher otherwise.

    With compaction enabled (fused/compact.py), alive lanes are packed to
    the front first so dead lanes collapse into fully-dead tail tiles the
    traversal kernels skip; results return in original order (bit-exact —
    per-lane hits don't depend on tile membership)."""
    if "noclosest" in _ABLATE and not coherent:
        zero = jnp.zeros_like(t)
        out = {"t": t, "prim": jnp.full(t.shape, -1, jnp.int32),
               "u": zero, "v": zero, "hit": zero > 1.0}
        if dev.get("use_clustered", False):
            out["inst"] = jnp.zeros(t.shape, jnp.int32)
            out["slot"] = jnp.full(t.shape, -1, jnp.int32)
        return out
    from ..experimental import compact as _cp

    if _cp.enabled(dev):
        dest = _cp.partition_dest(t > 0.0)
        o, dd, t = _cp.compact_rays(dest, o, dd, t)
        return _cp.uncompact_hits(dest, _trace_c_raw(dev, o, dd, t,
                                                     coherent))
    return _trace_c_raw(dev, o, dd, t, coherent)


def _trace_c_raw(dev, o: V3, dd: V3, t, coherent=False):
    if dev.get("has_alpha", False):
        # alpha cutout (in the fused envelope since round 5): the general
        # path's re-trace loop — the wavefront optixIgnoreIntersection,
        # pt.cu:545-678 — wraps whichever traversal kernel the scene uses
        # and exits immediately when every hit is opaque
        return pt_mod.trace_closest(
            dev, to_stacked(o), to_stacked(dd), t, coherent=coherent
        )
    if dev["use_dense"] and dev.get("use_pallas", True):
        from ..accel.pallas_dense import intersect_closest_pallas_c

        return intersect_closest_pallas_c(
            dev["tri_soa"], (o.x, o.y, o.z), (dd.x, dd.y, dd.z), t
        )
    return pt_mod._trace_closest_raw(dev, to_stacked(o), to_stacked(dd), t,
                                     coherent=coherent)


def _trace_any_c(dev, o: V3, dd: V3, t, coherent=False):
    """Component-layout occlusion trace (optixTrace RAY_TYPE_SHADOW
    analog, pt.cu:103-108 terminate-on-first-hit): returns occluded [N]
    bool. Opaque scenes dispatch straight to the first-hit kernels — the
    clustered one early-exits per tile once every alive lane is occluded;
    alpha scenes take the alpha-aware re-trace via pt_mod.trace_any."""
    if "noocc" in _ABLATE:
        # perf decomposition only (everything unoccluded; aliveness and
        # wavefront structure identical to a real render)
        return jnp.zeros_like(t, dtype=bool)
    from ..experimental import compact as _cp

    if _cp.enabled(dev):
        dest = _cp.partition_dest(t > 0.0)
        o, dd, t = _cp.compact_rays(dest, o, dd, t)
        return _cp.uncompact_occ(dest, _trace_any_c_raw(dev, o, dd, t,
                                                        coherent))
    return _trace_any_c_raw(dev, o, dd, t, coherent)


def _trace_any_c_raw(dev, o: V3, dd: V3, t, coherent=False):
    # alpha scenes skip the dense fast path: pt_mod.trace_any routes
    # occlusion through the alpha-aware re-trace (first OPAQUE hit)
    if (dev["use_dense"] and dev.get("use_pallas", True)
            and not dev.get("has_alpha", False)):
        from ..accel.pallas_dense import intersect_any_pallas_c

        return intersect_any_pallas_c(
            dev["tri_soa"], (o.x, o.y, o.z), (dd.x, dd.y, dd.z), t
        )
    return pt_mod.trace_any(dev, to_stacked(o), to_stacked(dd), t,
                            coherent=coherent)


def _concat_rays(ray_list):
    o = V3(
        jnp.concatenate([r[0].x for r in ray_list]),
        jnp.concatenate([r[0].y for r in ray_list]),
        jnp.concatenate([r[0].z for r in ray_list]),
    )
    d = V3(
        jnp.concatenate([r[1].x for r in ray_list]),
        jnp.concatenate([r[1].y for r in ray_list]),
        jnp.concatenate([r[1].z for r in ray_list]),
    )
    t = jnp.concatenate([r[2] for r in ray_list])
    return o, d, t


def _gather_attrs(dev, prim, inst=None, slot=None):
    """Two-stage fetch: geometry by prim, then material params by the
    fetched mat_id (a one-hot matmul over M << F materials).

    Geometry stage: small tables ride the one-hot MXU gather; large
    tables (> ONEHOT_MAX_ROWS) would fall back to the catastrophic
    per-lane HBM row gather — when the traversal reported hit SLOTS and
    the scene carries the slot-ordered attr blocks, the cluster-block
    fetch kernel (slot_fetch.py) replaces it: one 16 KB DMA + lane
    shuffles per (ray tile x distinct hit cluster).

    Instanced scenes (dev["inst_table"] present): the geometry table is
    OBJECT space — transform verts/normals by the hit instance's rows and
    recompute the (world) area, all in column form on the VPU."""
    if "nogather" in _ABLATE:
        zero = jnp.zeros(prim.shape, jnp.float32)
        attrs = {c: zero for c in range(GEOM_COLS_USED)}
        mid_f = zero
    elif slot is not None and "slot_attrs" in dev:
        from .slot_fetch import fetch_geom_by_slot

        attrs = fetch_geom_by_slot(dev, slot)
        mid_f = attrs[COL["mat_id"]]
    else:
        table = dev["fused_table"]  # [F, GEOM_COLS]
        p = jnp.clip(prim, 0, table.shape[0] - 1)
        geom = gather_rows(table, p, dev.get("use_dense", False))
        attrs = {c: geom[:, c] for c in range(GEOM_COLS_USED)}
        mid_f = geom[:, COL["mat_id"]]
    if inst is not None and "inst_table" in dev:
        _xform_attrs_cols(dev, inst, attrs)
    mat_table = dev["fused_mat_table"]  # [M, MAT_COLS]
    mid = jnp.round(mid_f).astype(jnp.int32)
    mid = jnp.clip(mid, 0, mat_table.shape[0] - 1)
    mat = gather_rows(mat_table, mid, True)
    for c in range(MAT_COLS):
        attrs[GEOM_COLS + c] = mat[:, c]
    return attrs


def _xform_attrs_cols(dev, inst, attrs):
    """Apply per-hit instance transforms to column-form geometry attrs
    in place (scene/device.py `_instance_table` row layout)."""
    it = dev["inst_table"]
    rows = gather_rows(it, jnp.clip(inst, 0, it.shape[0] - 1), True)
    r = lambda k: rows[:, k]
    for base in (COL["v0"], COL["v1"], COL["v2"]):
        x, y, z = attrs[base], attrs[base + 1], attrs[base + 2]
        attrs[base] = r(0) * x + r(1) * y + r(2) * z + r(3)
        attrs[base + 1] = r(4) * x + r(5) * y + r(6) * z + r(7)
        attrs[base + 2] = r(8) * x + r(9) * y + r(10) * z + r(11)
    for base in (COL["n0"], COL["n1"], COL["n2"]):
        x, y, z = attrs[base], attrs[base + 1], attrs[base + 2]
        nx = r(12) * x + r(13) * y + r(14) * z
        ny = r(15) * x + r(16) * y + r(17) * z
        nz = r(18) * x + r(19) * y + r(20) * z
        s = 1.0 / jnp.sqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24)
        )
        attrs[base] = nx * s
        attrs[base + 1] = ny * s
        attrs[base + 2] = nz * s
    # world area from the transformed verts (exact under any affine)
    e1x = attrs[COL["v1"]] - attrs[COL["v0"]]
    e1y = attrs[COL["v1"] + 1] - attrs[COL["v0"] + 1]
    e1z = attrs[COL["v1"] + 2] - attrs[COL["v0"] + 2]
    e2x = attrs[COL["v2"]] - attrs[COL["v0"]]
    e2y = attrs[COL["v2"] + 1] - attrs[COL["v0"] + 1]
    e2z = attrs[COL["v2"] + 2] - attrs[COL["v0"] + 2]
    cx = e1y * e2z - e1z * e2y
    cy = e1z * e2x - e1x * e2z
    cz = e1x * e2y - e1y * e2x
    attrs[COL["area"]] = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)


def _split_occ(dev) -> bool:
    """Whether occlusion-only ray blocks ride a separate any-hit dispatch.

    For the clustered traversal (large scenes) the any-hit kernel's
    early exits are a real win (+24% measured on the 1M-tri terrain);
    for the dense kernel the sweep cost is linear in lanes either way,
    so splitting one trace call into two only adds launch overhead on
    the tunneled backend. FREDHOLM_FUSED_SPLITOCC=0/1 overrides for A/B
    (default: split iff the scene uses the clustered path)."""
    mode = _os.environ.get("FREDHOLM_FUSED_SPLITOCC", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return not dev["use_dense"]


def _occ_blocks(cfg, split: bool):
    """Ray blocks that only need an occlusion boolean and ride the any-hit
    kernel when the split is on: all NEE shadow blocks, plus the BSDF-MIS
    light block when the scene has no emissive faces (then only `l_hit`
    feeds the MIS tail — see _resolve_pending)."""
    if not split:
        return []
    return list(cfg.nee_blocks) + ([] if cfg.has_area else ["light"])


def _make_resolve(cfg, dev, hit_all, cblocks, occ_all, oblocks, n,
                  prev_rays, prev_pending):
    """hit_all: closest-trace results over cblocks; occ_all: [len(oblocks)
    * n] occlusion booleans from the any-hit trace over oblocks. Each
    occlusion consumer sources its boolean from whichever trace carried
    its block (any-hit when split, closest otherwise)."""
    def blk(arr, i):
        return arr[i * n:(i + 1) * n]

    def occ_of(b):
        if b in oblocks:
            return blk(occ_all, oblocks.index(b))
        return blk(hit_all["hit"], cblocks.index(b))

    resolve = {
        "l_d": prev_rays["light"][1],
        "tpf": prev_pending["tpf"],
        "pdf_l": prev_pending["pdf_l"],
        "wi_l_y": prev_pending["wi_l_y"],
    }
    if cfg.has_area:
        li = cblocks.index("light")
        resolve["l_hit"] = blk(hit_all["hit"], li)
        resolve["l_u"] = blk(hit_all["u"], li)
        resolve["l_v"] = blk(hit_all["v"], li)
        resolve["l_o"] = prev_rays["light"][0]
    else:
        resolve["l_hit"] = occ_of("light")
    for b in cfg.nee_blocks:
        resolve["occ_" + b] = occ_of(b)
        resolve["c_" + b] = prev_pending["c_" + b]
    return resolve


def _mega_tiled(cfg, d, sv, usv, light_table, image_idx, n_spp, sample_idx,
                state, rhit, rattr, resolve, use_pallas: bool,
                ibl_env=None):
    """mega_body, either pure-jnp (CPU oracle) or as ONE Pallas launch with
    rays tiled in VMEM (fused/kernels.py) — the megakernel proper."""
    if not use_pallas:
        return mega_body(
            cfg, d, sv, usv, image_idx, n_spp, sample_idx, light_table,
            state, rhit, rattr, resolve, ibl_env,
        )
    assert cfg.sky_mode != SKY_IBL, "IBL fused mode is jnp-only"
    from .kernels import tiled_map

    inputs = {
        "ii": image_idx, "ns": n_spp, "si": sample_idx,
        "st": state, "rh": rhit, "ra": rattr, "rs": resolve,
    }

    def body(t, sv_r, usv_r, lt_r):
        return mega_body(
            cfg, d, sv_r, usv_r, t["ii"], t["ns"], t["si"], lt_r,
            t["st"], t["rh"], t["ra"], t["rs"],
        )

    return tiled_map(body, inputs, [sv, usv, light_table])


def _raygen_tiled(cfg, sv, usv, px, py, image_idx, n_spp, use_pallas: bool):
    if not use_pallas:
        return raygen_body(cfg, sv, usv, px, py, image_idx, n_spp)
    from .kernels import tiled_map

    inputs = {"px": px, "py": py, "ii": image_idx, "ns": n_spp}

    def body(t, sv_r, usv_r):
        return raygen_body(
            cfg, sv_r, usv_r, t["px"], t["py"], t["ii"], t["ns"]
        )

    return tiled_map(body, inputs, [sv, usv])


def _final_tiled(cfg, sv, state, resolve, use_pallas: bool, ibl_env=None):
    if not use_pallas:
        return final_resolve_body(cfg, sv, state, resolve, ibl_env)
    assert cfg.sky_mode != SKY_IBL, "IBL fused mode is jnp-only"
    from .kernels import tiled_map

    inputs = {"st": state, "rs": resolve}

    def body(t, sv_r):
        return final_resolve_body(cfg, sv_r, t["st"], t["rs"])

    return tiled_map(body, inputs, [sv])


def render_sample_fused(dev: Dict, params: Dict, n_spp):
    """Drop-in replacement for pt.render_sample on the supported envelope;
    returns the same stacked [N, ...] AOV dict."""
    width = params["width"]
    height = params["height"]
    tile_height = params.get("tile_height", height)
    y0 = params.get("y0", 0)
    n = width * tile_height
    cfg = FusedConfig(
        width=width,
        height=height,
        max_depth=params["max_depth"],
        sky_mode=params["sky_mode"],
        has_dl=params["has_directional_light"],
        n_lights=dev["n_lights"],
        lobes_on=dev.get("lobes_on", cbsdf.ALL_LOBES),
        tex_kinds=dev.get("tex_kinds", ()),
        use_ibl_is=bool(params.get("use_ibl_is", False)),
    )
    ibl_env = None
    if cfg.sky_mode == SKY_IBL:
        ibl_env = dict(params["ibl"])
        if cfg.use_ibl_is:
            ibl_env["dist"] = params["ibl_dist"]

    from ..core.swizzle import swizzle_active, swizzled_pixel_coords, unswizzle

    swz = swizzle_active(
        width, tile_height, clustered=dev.get("use_clustered", False)
    )
    if swz:
        # blocked pixel order: each [64,128] ray tile is a compact 64x128
        # PIXEL region, so the traversal kernels' tile gates stay selective
        px_u, py_u = swizzled_pixel_coords(width, tile_height, y0)
    else:
        px_u = jnp.tile(jnp.arange(width, dtype=jnp.uint32), tile_height)
        py_u = jnp.repeat(
            jnp.arange(tile_height, dtype=jnp.uint32), width
        ) + jnp.asarray(y0, jnp.uint32)
    image_idx = px_u + np.uint32(width) * py_u
    px = px_u.astype(jnp.float32)
    py = py_u.astype(jnp.float32)
    n_spp = jnp.asarray(n_spp).astype(jnp.uint32)
    if swz and n_spp.ndim > 0:
        # per-pixel sample counts arrive pixel-linear; match lane order
        from ..core.swizzle import swizzle_array

        n_spp = swizzle_array(n_spp, width, tile_height)

    sv, usv = pack_scalars(params, width * height)
    light_table = dev["light_table"]
    # Shading-stage backend: measured on the dev TPU, the XLA-fused jnp
    # bodies slightly BEAT the hand-tiled Pallas launches (XLA's fusion of
    # ~130 elementwise ops is already one pass over HBM; the Pallas version
    # only adds VMEM tiling overhead), so jnp is the default and
    # FREDHOLM_MEGA=pallas keeps the single-launch path as an A/B knob.
    import os as _os

    use_pk = bool(dev.get("use_pallas", True)) and (
        _os.environ.get("FREDHOLM_MEGA", "jnp") == "pallas"
    ) and cfg.sky_mode != SKY_IBL  # no mosaic gather for IBL texels

    state = _raygen_tiled(cfg, sv, usv, px, py, image_idx, n_spp, use_pk)
    sample_idx = state.pop("sample_idx")
    state["rad"] = None
    state["nv"] = None

    aovs = None
    prev_rays = None
    prev_pending = None

    # occlusion-only blocks ride the any-hit kernel (first opaque hit
    # terminates; the clustered kernel also early-exits all-occluded
    # tiles) instead of paying a full closest-hit traversal — only the
    # next-bounce ray (and, with emissive faces, the BSDF-MIS light ray,
    # whose hit identity feeds the MIS pdf) needs closest-hit. Dense
    # scenes keep everything in ONE closest dispatch (_split_occ).
    split = _split_occ(dev)
    oblocks = _occ_blocks(cfg, split)
    cblocks = (
        ([] if split else list(cfg.nee_blocks))
        + (["light"] if cfg.has_area or not split else [])
        + ["rad"]
    )

    for d in range(cfg.max_depth):
        if d == 0:
            ray_list = [(state["o"], state["d"], state.pop("tmax"))]
            hit_all = _trace_c(dev, *_concat_rays(ray_list), coherent=True)
            occ_all = None
            dblocks = ["rad"]
        else:
            occ_all = (
                _trace_any_c(
                    dev, *_concat_rays([prev_rays[b] for b in oblocks])
                )
                if oblocks else None
            )
            hit_all = _trace_c(
                dev, *_concat_rays([prev_rays[b] for b in cblocks])
            )
            dblocks = cblocks

        ri = dblocks.index("rad")

        def blk(arr, i):
            return arr[i * n:(i + 1) * n]

        rhit = {
            "hit": blk(hit_all["hit"], ri),
            "t": blk(hit_all["t"], ri),
            "u": blk(hit_all["u"], ri),
            "v": blk(hit_all["v"], ri),
        }

        if d > 0:
            if cfg.has_area:
                li = dblocks.index("light")
                prim2 = jnp.concatenate(
                    [blk(hit_all["prim"], li), blk(hit_all["prim"], ri)]
                )
                inst2 = None
                if "inst" in hit_all:
                    inst2 = jnp.concatenate(
                        [blk(hit_all["inst"], li), blk(hit_all["inst"], ri)]
                    )
                slot2 = None
                if "slot" in hit_all:
                    slot2 = jnp.concatenate(
                        [blk(hit_all["slot"], li), blk(hit_all["slot"], ri)]
                    )
                attrs2 = _gather_attrs(dev, prim2, inst=inst2, slot=slot2)
                fetch_texture_planes(
                    dev, cfg, attrs2,
                    jnp.concatenate([blk(hit_all["u"], li), rhit["u"]]),
                    jnp.concatenate([blk(hit_all["v"], li), rhit["v"]]),
                )
                lattr = {c: v[:n] for c, v in attrs2.items()}
                rattr = {c: v[n:] for c, v in attrs2.items()}
            else:
                lattr = None
                rattr = _gather_attrs(
                    dev, blk(hit_all["prim"], ri),
                    inst=blk(hit_all["inst"], ri)
                    if "inst" in hit_all else None,
                    slot=blk(hit_all["slot"], ri)
                    if "slot" in hit_all else None,
                )
                fetch_texture_planes(dev, cfg, rattr, rhit["u"], rhit["v"])
            resolve = _make_resolve(
                cfg, dev, hit_all, cblocks, occ_all, oblocks, n,
                prev_rays, prev_pending,
            )
            if lattr is not None:
                resolve["lattr"] = lattr
        else:
            rattr = _gather_attrs(
                dev, hit_all["prim"], inst=hit_all.get("inst"),
                slot=hit_all.get("slot"),
            )
            fetch_texture_planes(dev, cfg, rattr, rhit["u"], rhit["v"])
            resolve = {}

        state, rays, pending, aovs_d = _mega_tiled(
            cfg, d, sv, usv, light_table, image_idx, n_spp, sample_idx,
            state, rhit, rattr, resolve, use_pk, ibl_env,
        )
        if d == 0:
            aovs = aovs_d
        prev_rays = rays
        prev_pending = pending

    # final: trace the last bounce's pending NEE + light blocks (under the
    # split, NEE blocks — and the light block without emissive faces —
    # ride any-hit; otherwise everything shares one closest dispatch)
    occ_all = (
        _trace_any_c(dev, *_concat_rays([prev_rays[b] for b in oblocks]))
        if oblocks else None
    )
    fblocks = (
        ([] if split else list(cfg.nee_blocks))
        + (["light"] if cfg.has_area or not split else [])
    )

    def blk(arr, i):
        return arr[i * n:(i + 1) * n]

    hit_all = None
    if fblocks:
        hit_all = _trace_c(
            dev, *_concat_rays([prev_rays[b] for b in fblocks])
        )
    resolve = _make_resolve(
        cfg, dev, hit_all, fblocks, occ_all, oblocks, n,
        prev_rays, prev_pending,
    )
    if cfg.has_area:
        li = fblocks.index("light")
        resolve["lattr"] = _gather_attrs(
            dev, blk(hit_all["prim"], li),
            inst=blk(hit_all["inst"], li) if "inst" in hit_all else None,
            slot=blk(hit_all["slot"], li) if "slot" in hit_all else None,
        )
        fetch_texture_planes(
            dev, cfg, resolve["lattr"],
            blk(hit_all["u"], li), blk(hit_all["v"], li),
        )

    rad = _final_tiled(cfg, sv, state, resolve, use_pk, ibl_env)

    out = {
        "radiance": to_stacked(rad),
        "position": to_stacked(aovs["position"]),
        "normal": to_stacked(aovs["normal"]),
        "depth": aovs["depth"],
        "texcoord": jnp.stack(
            [aovs["texcoord_u"], aovs["texcoord_v"]], axis=-1
        ),
        "albedo": to_stacked(aovs["albedo"]),
    }
    if swz:
        # back to pixel-linear order (one cheap transpose per AOV)
        out = {k: unswizzle(v, width, tile_height) for k, v in out.items()}
    out["n_path_vertices"] = jnp.sum(state["nv"])
    out["n_lane_slots"] = jnp.float32(n * cfg.max_depth)
    return out
