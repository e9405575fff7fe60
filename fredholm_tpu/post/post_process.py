"""Post-process chain: bloom, chromatic aberration, exposure, tone mapping.

TPU-native re-implementation of /root/reference/fredholm/kernels/
(post-process.h/.cu): luminance-threshold bloom with a 33x33 gaussian
gather, per-channel UV-shift chromatic aberration, EV100 exposure from ISO,
Uchimura (default) or ACES tone curves, and linear->sRGB. The reference's
O(K^2)-per-pixel gaussian gather becomes two separable 1D convolutions
(mathematically identical for a gaussian kernel, ~33x less work); everything
else is straight batched jnp on [H, W, 3] images.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.vecmath import rgb_to_luminance


@dataclasses.dataclass(frozen=True)
class PostProcessParams:
    """post-process.h:4-10 defaults from the GUI (controller.h:107-111)."""

    use_bloom: bool = False
    bloom_threshold: float = 1.0
    bloom_sigma: float = 1.0
    iso: float = 400.0
    chromatic_aberration: float = 1.0


def linear_to_srgb(rgb):
    """post-process.h:19-29."""
    return jnp.where(
        rgb < 0.0031308,
        12.92 * rgb,
        1.055 * jnp.power(jnp.maximum(rgb, 1e-8), 1.0 / 2.4) - 0.055,
    )


def aces_tone_mapping(color):
    """Narkowicz ACES fit (post-process.h:32-41)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip(
        (color * (a * color + b)) / (color * (c * color + d) + e), 0.0, 1.0
    )


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def uchimura(x, P=1.0, a=1.0, m=0.22, l=0.4, c=1.33, b=0.0):
    """Uchimura 2017 HDR tone curve (post-process.h:76-110)."""
    l0 = ((P - m) * l) / a
    S0 = m + l0
    S1 = m + a * l0
    C2 = (a * P) / (P - S1)
    CP = -C2 / P

    w0 = 1.0 - _smoothstep(0.0, m, x)
    w2 = jnp.where(x < m + l0, 0.0, 1.0)
    w1 = 1.0 - w0 - w2

    T = m * jnp.power(jnp.maximum(x / m, 1e-8), c) + b
    S = P - (P - S1) * jnp.exp(CP * (x - S0))
    L = m + a * (x - m)
    return T * w0 + L * w1 + S * w2


def compute_ev100(aperture, shutter_time, iso):
    """post-process.h:114-118 (Frostbite)."""
    return np.log2(aperture * aperture / shutter_time * 100.0 / iso)


def convert_ev100_to_exposure(ev100):
    """post-process.h:120-124."""
    max_luminance = 1.2 * (2.0**ev100)
    return 1.0 / max_luminance


def bloom(beauty, threshold: float, sigma: float, kernel_radius: int = 16):
    """Bloom: threshold extraction + gaussian blur + add
    (post-process.cu:60-109). beauty: [H, W, 3].

    The reference gathers a full 33x33 window with weights
    exp(-d^2 / (2*sigma)); we evaluate the identical kernel separably.
    """
    lum = rgb_to_luminance(beauty)
    high = jnp.where((lum > threshold)[..., None], beauty, 0.0)

    k = jnp.arange(-kernel_radius, kernel_radius + 1, dtype=jnp.float32)
    # NOTE: the reference's weight is exp(-d^2 / (2 sigma)) — sigma, not
    # sigma^2 (post-process.cu:104); reproduced as-is
    w1d = jnp.exp(-(k * k) / (2.0 * sigma))

    def blur_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (kernel_radius, kernel_radius)
        padded = jnp.pad(img, pad, mode="edge")
        out = jnp.zeros_like(img)
        for i in range(2 * kernel_radius + 1):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + w1d[i] * padded[tuple(sl)]
        return out

    norm = jnp.sum(w1d) ** 2
    blurred = blur_axis(blur_axis(high, 0), 1) / norm
    return beauty + blurred


def chromatic_aberration(img, strength: float):
    """Per-channel radial UV shift (post-process.cu:125-147).

    The reference divides the offset by width*height, making it vanishingly
    small at real resolutions; we reproduce the same formula.
    """
    h, w, _ = img.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.0) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.0) / w
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # [H, W, 2]
    d = (uv - 0.5) / (w * h) * strength

    def fetch(channel, scale):
        uv_c = jnp.clip(uv - scale * d, 0.0, 1.0)
        xi = jnp.clip((uv_c[..., 0] * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv_c[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return img[yi, xi, channel]

    return jnp.stack(
        [fetch(0, 0.0), fetch(1, 1.0), fetch(2, 2.0)], axis=-1
    )


def tone_mapping(img, iso: float = 400.0, ca_strength: float = 1.0,
                 curve: str = "uchimura"):
    """Chromatic aberration -> EV100 exposure -> tone curve -> sRGB
    (post-process.cu:111-154). img: [H, W, 3] linear HDR."""
    img = chromatic_aberration(img, ca_strength)
    exposure = convert_ev100_to_exposure(compute_ev100(1.0, 1.0, iso))
    img = img * exposure
    if curve == "aces":
        img = aces_tone_mapping(img)
    else:
        img = uchimura(img)
    return linear_to_srgb(img)


def post_process(beauty, params: PostProcessParams):
    """Full chain (post_process_kernel_launch, post-process.cu:5-35).
    beauty: [H, W, 3] linear HDR -> [H, W, 3] sRGB in [0, 1]."""
    img = beauty
    if params.use_bloom:
        img = bloom(img, params.bloom_threshold, params.bloom_sigma)
    return jnp.clip(
        tone_mapping(img, params.iso, params.chromatic_aberration), 0.0, 1.0
    )
