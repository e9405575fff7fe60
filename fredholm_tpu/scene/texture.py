"""Texture storage and sampling.

TPU has no hardware texture units, so we implement what the reference gets
from cudaTextureObject_t (/root/reference/cwl/include/cwl/texture.h:13-75):
bilinear filtering, wrap addressing, and sRGB decode.

Storage is tuned to this hardware's gather economics: an irregular per-lane
gather costs ~2.5 ms per 262k lanes REGARDLESS of row width (measured, see
PERF.md round 3), so the layout packs each texture into overlapping
8-wide x 2-tall texel RUNS (x-stride 4, wrap baked in). Any bilinear
footprint (x0..x0+1, y0..y0+1) then lives inside ONE run row, so a full
bilinear fetch is a single gather + in-register selects — 9x fewer gathers
than the naive 4-tap + header fetch, for 4x texture memory (texels are
uint32-packed RGBA8).

Per-texture headers (run offset, width, height, runs-per-row, srgb) are
fetched with the one-hot-matmul small-table gather (core/gather.py), not a
per-lane take.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..core.gather import gather_rows
from .types import TextureImage

RUN_W = 8   # texels per run in x
RUN_H = 2   # texel rows per run
X_STRIDE = 4  # run x-stride => any (x0, x0+1) pair is inside one run


def _pack_rgba_u32(data: np.ndarray) -> np.ndarray:
    """[H, W, 4] uint8 -> [H, W] uint32 (r | g<<8 | b<<16 | a<<24)."""
    d = data.astype(np.uint32)
    return d[..., 0] | (d[..., 1] << 8) | (d[..., 2] << 16) | (d[..., 3] << 24)


def _texture_runs(data: np.ndarray) -> np.ndarray:
    """[H, W] uint32 texels -> [H * ceil(W/4), 16] uint32 run rows with
    wrap addressing baked in (column dx + 8*dy covers texel
    ((4*bx + dx) % W, (y + dy) % H))."""
    h, w = data.shape
    rw = (w + X_STRIDE - 1) // X_STRIDE
    out = np.zeros((h * rw, RUN_W * RUN_H), np.uint32)
    ys = np.arange(h)[:, None]
    bx = np.arange(rw)[None, :]
    for dy in range(RUN_H):
        for dx in range(RUN_W):
            col = dx + RUN_W * dy
            out[:, col] = data[
                (ys + dy) % h, (X_STRIDE * bx + dx) % w
            ].reshape(-1)
    return out


def texture_headers_np(textures: List[TextureImage]) -> np.ndarray:
    """[K+1, 5] float32 (run_offset, width, height, runs_per_row, srgb) —
    the host-side header table (fallback white texture last), used to bake
    per-material texture headers into the fused material table."""
    offsets, rows = [], []
    off = 0
    ws, hs, rws, srgbs = [], [], [], []
    for tex in textures:
        h, w = tex.data.shape[:2]
        rw = (w + X_STRIDE - 1) // X_STRIDE
        offsets.append(off)
        ws.append(w)
        hs.append(h)
        rws.append(rw)
        srgbs.append(float(bool(tex.is_srgb)))
        off += rw * h
    offsets.append(off)
    ws.append(1)
    hs.append(1)
    rws.append(1)
    srgbs.append(0.0)
    return np.stack(
        [
            np.asarray(offsets, np.float32),
            np.asarray(ws, np.float32),
            np.asarray(hs, np.float32),
            np.asarray(rws, np.float32),
            np.asarray(srgbs, np.float32),
        ],
        axis=-1,
    )


def pack_textures(textures: List[TextureImage]) -> Dict[str, jnp.ndarray]:
    """Pack host textures into the flat run-based device layout.

    Returns dict with runs [R, 16] uint32, header [K+1, 5] float32 columns
    (run_offset, width, height, runs_per_row, srgb), plus the legacy
    offset/width/height/srgb [K+1] arrays some callers index directly. An
    all-white 1x1 texture is always present at id `n_textures` as the safe
    fallback for clamped gathers."""
    run_blocks = []
    datas = list(textures) + [
        TextureImage(data=np.full((1, 1, 4), 255, np.uint8), is_srgb=False)
    ]
    for tex in datas:
        data = tex.data
        if data.shape[-1] == 3:
            data = np.concatenate(
                [data, np.full(data.shape[:2] + (1,), 255, np.uint8)],
                axis=-1,
            )
        run_blocks.append(_texture_runs(_pack_rgba_u32(data.astype(np.uint8))))

    header = texture_headers_np(textures)
    # one-hot header gathers run in f32: run offsets must stay exact
    assert header[-1, 0] < (1 << 24), "texture atlas exceeds 2^24 run rows"
    return {
        "runs": jnp.asarray(np.concatenate(run_blocks, axis=0)),
        "header": jnp.asarray(header),
        "offset": jnp.asarray(header[:, 0].astype(np.int32)),
        "width": jnp.asarray(header[:, 1].astype(np.int32)),
        "height": jnp.asarray(header[:, 2].astype(np.int32)),
        "srgb": jnp.asarray(header[:, 4] > 0.0),
        "n_textures": len(textures),
    }


def _srgb_to_linear(c):
    # inverse of the display transform (cwl texture sRGB decode)
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4)
    )


def sample_texture_hdr(tex: Dict, tex_id, uv, header_cols):
    """Core bilinear fetch given pre-gathered header columns
    (off, w, h, rw, srgb as float32 planes). Returns [N, 4] float32."""
    runs = tex["runs"]
    off, w, h, rw, srgb = header_cols

    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    xw = jnp.mod(x0.astype(jnp.int32), wi)
    yw = jnp.mod(y0.astype(jnp.int32), hi)
    ri = off.astype(jnp.int32) + yw * rw.astype(jnp.int32) + (
        xw // X_STRIDE
    )
    row = jnp.take(runs, jnp.clip(ri, 0, runs.shape[0] - 1), axis=0)

    # select the 2x2 footprint from the run (lx in 0..3, branchless)
    lx = xw % X_STRIDE

    def sel(col0):
        t = jnp.zeros(lx.shape, jnp.uint32)
        for s in range(X_STRIDE):
            t = jnp.where(lx == s, row[..., col0 + s], t)
        return t

    def unpack(t):
        t = t[..., None]
        rgba = jnp.concatenate(
            [
                (t >> 0) & np.uint32(0xFF),
                (t >> 8) & np.uint32(0xFF),
                (t >> 16) & np.uint32(0xFF),
                (t >> 24) & np.uint32(0xFF),
            ],
            axis=-1,
        ).astype(jnp.float32) / 255.0
        rgb = jnp.where(
            srgb[..., None] > 0.0,
            _srgb_to_linear(rgba[..., :3]),
            rgba[..., :3],
        )
        return jnp.concatenate([rgb, rgba[..., 3:]], axis=-1)

    t00 = unpack(sel(0))
    t10 = unpack(sel(1))
    t01 = unpack(sel(RUN_W))
    t11 = unpack(sel(RUN_W + 1))
    return (
        (1 - fx) * (1 - fy) * t00
        + fx * (1 - fy) * t10
        + (1 - fx) * fy * t01
        + fx * fy * t11
    )


def sample_texture(tex: Dict, tex_id, uv):
    """Bilinear, wrap-addressed fetch; tex_id [N] int32 (may be -1: callers
    mask), uv [N, 2]. Returns [N, 4] float32 (rgb linearized when srgb)."""
    k = jnp.clip(tex_id, 0, tex["header"].shape[0] - 1)
    hdr = gather_rows(tex["header"], k, True)  # one-hot small-table gather
    cols = tuple(hdr[..., i] for i in range(5))
    return sample_texture_hdr(tex, tex_id, uv, cols)


def fetch_or_constant(tex: Dict, tex_id, uv, constant):
    """tex2D-if-id>=0-else-material-constant pattern (pt.cu:192-236).
    constant: [N, C]; returns [N, C] with C = constant channels."""
    sampled = sample_texture(tex, tex_id, uv)
    c = constant.shape[-1]
    return jnp.where((tex_id >= 0)[..., None], sampled[..., :c], constant)
