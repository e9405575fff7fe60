"""Texture storage and sampling.

TPU has no hardware texture units, so we implement what the reference gets
from cudaTextureObject_t (/root/reference/cwl/include/cwl/texture.h:13-75):
bilinear filtering, wrap addressing, and sRGB decode. All textures are
packed into ONE flat texel buffer with per-texture (offset, width, height,
srgb) headers — a whole wavefront samples any mix of textures with four
gathers from a single HBM array.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .types import TextureImage


def pack_textures(textures: List[TextureImage]) -> Dict[str, jnp.ndarray]:
    """Pack host textures into the flat device layout.

    Returns dict with texels [T, 4] uint8, offset/width/height [K] int32,
    srgb [K] bool. An all-white 1x1 texture is always present at id
    `n_textures` as the safe fallback for clamped gathers.
    """
    datas = []
    offsets, widths, heights, srgbs = [], [], [], []
    off = 0
    for tex in textures:
        h, w = tex.data.shape[:2]
        data = tex.data.reshape(-1, tex.data.shape[-1])
        if data.shape[-1] == 3:
            data = np.concatenate(
                [data, np.full((len(data), 1), 255, np.uint8)], axis=-1
            )
        datas.append(data.astype(np.uint8))
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        srgbs.append(tex.is_srgb)
        off += w * h
    # fallback white texel
    datas.append(np.full((1, 4), 255, np.uint8))
    offsets.append(off)
    widths.append(1)
    heights.append(1)
    srgbs.append(False)

    return {
        "texels": jnp.asarray(np.concatenate(datas, axis=0)),
        "offset": jnp.asarray(np.asarray(offsets, np.int32)),
        "width": jnp.asarray(np.asarray(widths, np.int32)),
        "height": jnp.asarray(np.asarray(heights, np.int32)),
        "srgb": jnp.asarray(np.asarray(srgbs, bool)),
        "n_textures": len(textures),
    }


def _srgb_to_linear(c):
    # inverse of the display transform (cwl texture sRGB decode)
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4)
    )


def sample_texture(tex: Dict, tex_id, uv):
    """Bilinear, wrap-addressed fetch; tex_id [N] int32 (may be -1: callers
    mask), uv [N, 2]. Returns [N, 4] float32 (rgb linearized when srgb)."""
    k = jnp.clip(tex_id, 0, tex["offset"].shape[0] - 1)
    w = tex["width"][k].astype(jnp.float32)
    h = tex["height"][k].astype(jnp.float32)
    off = tex["offset"][k]
    wi = tex["width"][k]
    hi = tex["height"][k]

    # wrap addressing; v flipped like GL texture coordinates on image rows
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def texel(xi, yi):
        xw = jnp.mod(xi.astype(jnp.int32), wi)
        yw = jnp.mod(yi.astype(jnp.int32), hi)
        t = tex["texels"][off + yw * wi + xw].astype(jnp.float32) / 255.0
        rgb = jnp.where(
            tex["srgb"][k][..., None], _srgb_to_linear(t[..., :3]), t[..., :3]
        )
        return jnp.concatenate([rgb, t[..., 3:]], axis=-1)

    t00 = texel(x0, y0)
    t10 = texel(x0 + 1, y0)
    t01 = texel(x0, y0 + 1)
    t11 = texel(x0 + 1, y0 + 1)
    return (
        (1 - fx) * (1 - fy) * t00
        + fx * (1 - fy) * t10
        + (1 - fx) * fy * t01
        + fx * fy * t11
    )


def fetch_or_constant(tex: Dict, tex_id, uv, constant):
    """tex2D-if-id>=0-else-material-constant pattern (pt.cu:192-236).
    constant: [N, C]; returns [N, C] with C = constant channels."""
    sampled = sample_texture(tex, tex_id, uv)
    c = constant.shape[-1]
    return jnp.where((tex_id >= 0)[..., None], sampled[..., :c], constant)
