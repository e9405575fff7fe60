"""Image-based lighting environment map.

TPU-native analog of the reference's float IBL texture + equirectangular
fetch (/root/reference/fredholm/modules/pt.cu:344-350,
scene.cpp FloatTexture loader). The map is a float32 [H, W, 3] array;
fetches are bilinear with longitude wrap.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.vecmath import cartesian_to_spherical


def load_ibl(path: str) -> Dict:
    """Load an .hdr/.exr/.png environment map into a device dict."""
    data: Optional[np.ndarray] = None
    if path.lower().endswith(".hdr"):
        data = _read_radiance_hdr(path)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB")).astype(np.float32)
        data = (img / 255.0) ** 2.2
    return {"image": jnp.asarray(data.astype(np.float32))}


def make_ibl(image: np.ndarray) -> Dict:
    return {"image": jnp.asarray(np.asarray(image, np.float32))}


def fetch_ibl(ibl: Dict, v, intensity=1.0):
    """Equirectangular lookup for directions v [N, 3] (pt.cu:344-350)."""
    theta, phi = cartesian_to_spherical(v)
    u = phi / (2.0 * jnp.pi)
    w = theta / jnp.pi
    img = ibl["image"]
    h, wdt = img.shape[0], img.shape[1]
    x = u * wdt - 0.5
    y = w * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def texel(xi, yi):
        xw = jnp.mod(xi.astype(jnp.int32), wdt)
        yw = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[yw, xw]

    t00 = texel(x0, y0)
    t10 = texel(x0 + 1, y0)
    t01 = texel(x0, y0 + 1)
    t11 = texel(x0 + 1, y0 + 1)
    c = (
        (1 - fx) * (1 - fy) * t00
        + fx * (1 - fy) * t10
        + (1 - fx) * fy * t01
        + fx * fy * t11
    )
    return intensity * c


def _read_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader (stb_image equivalent for the
    formats the reference loads, scene.cpp:49-66)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        if not line.startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        # header
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        if dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"unsupported HDR orientation: {dims}")
        h, w = int(dims[1]), int(dims[3])
        data = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            head = f.read(4)
            if len(head) < 4:
                raise ValueError("truncated HDR")
            if head[0] == 2 and head[1] == 2 and (head[2] << 8 | head[3]) == w:
                # new RLE scanline
                for c in range(4):
                    x = 0
                    while x < w:
                        count = f.read(1)[0]
                        if count > 128:
                            val = f.read(1)[0]
                            data[y, x : x + count - 128, c] = val
                            x += count - 128
                        else:
                            vals = np.frombuffer(f.read(count), np.uint8)
                            data[y, x : x + count, c] = vals
                            x += count
            else:
                # flat scanline
                row = head + f.read(4 * w - 4)
                data[y] = np.frombuffer(row, np.uint8).reshape(w, 4)
    rgbe = data.astype(np.float32)
    exp = np.ldexp(1.0, data[..., 3].astype(np.int32) - 136)
    rgb = rgbe[..., :3] * exp[..., None]
    rgb[data[..., 3] == 0] = 0.0
    return rgb.astype(np.float32)


# ---------------------------------------------------------------------------
# IBL importance sampling — an improvement over the reference, which leaves
# it as a TODO (pt.cu:797) and cosine-samples the environment instead.


def build_ibl_distribution(ibl: Dict) -> Dict:
    """Luminance-weighted equirect distribution for NEE.

    Returns row CDF [H], per-row column CDFs [H, W] and the solid-angle pdf
    map [H, W] (already includes the sin-theta metric).
    """
    import numpy as np

    img = np.asarray(ibl["image"], np.float32)
    h, w = img.shape[:2]
    lum = img @ np.asarray([0.2126729, 0.7151522, 0.0721750], np.float32)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = lum * np.sin(theta)[:, None] + 1e-12

    row_w = weights.sum(axis=1)
    row_cdf = np.cumsum(row_w)
    total = row_cdf[-1]
    row_cdf = row_cdf / total

    col_cdf = np.cumsum(weights, axis=1)
    col_cdf = col_cdf / col_cdf[:, -1:]

    # p(pixel) -> solid-angle pdf: each texel covers
    # (2pi/w) * (pi/h) * sin(theta) steradians
    p_pixel = weights / total
    texel_sr = (2.0 * np.pi / w) * (np.pi / h) * np.sin(theta)[:, None]
    pdf_map = p_pixel / np.maximum(texel_sr, 1e-12)

    return {
        "row_cdf": jnp.asarray(row_cdf),
        "col_cdf": jnp.asarray(col_cdf),
        "pdf_map": jnp.asarray(pdf_map.astype(np.float32)),
    }


def sample_ibl(dist: Dict, u2):
    """Inverse-CDF sample of the environment; u2 [N,2] ->
    (direction [N,3], pdf [N] in solid angle)."""
    row_cdf = dist["row_cdf"]
    col_cdf = dist["col_cdf"]
    h = row_cdf.shape[0]
    w = col_cdf.shape[1]

    row = jnp.searchsorted(row_cdf, u2[..., 0])
    row = jnp.clip(row, 0, h - 1)
    # vectorized per-lane searchsorted over each lane's row CDF
    cdf_rows = col_cdf[row]  # [N, W]
    col = jnp.sum((cdf_rows < u2[..., 1:2]).astype(jnp.int32), axis=-1)
    col = jnp.clip(col, 0, w - 1)

    theta = (row.astype(jnp.float32) + 0.5) / h * jnp.pi
    phi = (col.astype(jnp.float32) + 0.5) / w * 2.0 * jnp.pi
    from ..core.vecmath import spherical_to_cartesian

    direction = spherical_to_cartesian(theta, phi)
    pdf = dist["pdf_map"][row, col]
    return direction, pdf


def ibl_pdf(dist: Dict, v):
    """Solid-angle pdf of direction(s) v under the same distribution (for
    the MIS weight of BSDF-sampled rays that hit the environment)."""
    theta, phi = cartesian_to_spherical(v)
    h, w = dist["pdf_map"].shape
    row = jnp.clip((theta / jnp.pi * h).astype(jnp.int32), 0, h - 1)
    col = jnp.clip((phi / (2.0 * jnp.pi) * w).astype(jnp.int32), 0, w - 1)
    return dist["pdf_map"][row, col]
