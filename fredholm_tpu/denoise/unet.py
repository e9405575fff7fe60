"""Learned denoiser: a small guided U-Net in pure JAX.

Phase-2 quality upgrade over the edge-avoiding A-Trous filter
(denoise/atrous.py), closing the gap to the reference's OptiX AI denoiser
(/root/reference/fredholm/include/fredholm/denoiser.h:14-146) the TPU way:
convolutions are MXU work, the model is trained on pairs rendered by THIS
renderer (tools/train_denoiser.py), and weights ship as a small npz asset.

Design (standard HDR-denoiser practice, sized for a ~400 KB weight file):
- albedo demodulation: the network denoises log1p(beauty / max(albedo, eps))
  (irradiance), then re-modulates — texture detail survives at any spp.
- guides: normal (3) and albedo (3) channels alongside the 3 irradiance
  channels -> 9 input planes.
- 3-scale U-Net, [24, 40, 64] features, 3x3 convs, bilinear up, skip
  concats, residual output head (predicts a correction to the input
  irradiance). ~200k parameters.

All shapes are NHWC; everything jits and runs on the MXU in bf16-friendly
sizes. Weight I/O is a flat dict npz, no framework dependency.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(
    os.path.dirname(__file__), "..", "assets", "denoiser_unet.npz"
)

FEATURES = (24, 40, 64)
IN_CH = 9  # log-irradiance(3) + albedo(3) + normal(3)


# ---------------------------------------------------------------------------
# parameters


def _conv_init(key, k, cin, cout):
    # He initialization
    std = np.sqrt(2.0 / (k * k * cin))
    return {
        "w": jax.random.normal(key, (k, k, cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_params(key) -> Dict:
    """Fresh parameter pytree (tools/train_denoiser.py)."""
    f0, f1, f2 = FEATURES
    keys = jax.random.split(key, 12)
    return {
        "enc0a": _conv_init(keys[0], 3, IN_CH, f0),
        "enc0b": _conv_init(keys[1], 3, f0, f0),
        "enc1a": _conv_init(keys[2], 3, f0, f1),
        "enc1b": _conv_init(keys[3], 3, f1, f1),
        "bot_a": _conv_init(keys[4], 3, f1, f2),
        "bot_b": _conv_init(keys[5], 3, f2, f2),
        "dec1a": _conv_init(keys[6], 3, f2 + f1, f1),
        "dec1b": _conv_init(keys[7], 3, f1, f1),
        "dec0a": _conv_init(keys[8], 3, f1 + f0, f0),
        "dec0b": _conv_init(keys[9], 3, f0, f0),
        "head": _conv_init(keys[10], 1, f0, 3),
    }


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def _relu(x):
    return jnp.maximum(x, 0.0)


def _down(x):
    """2x average pool."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _up(x):
    """2x nearest upsample (cheap, followed by convs)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def apply_unet(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, H, W, 9] (H, W multiples of 4) -> [N, H, W, 3] residual."""
    e0 = _relu(_conv(params["enc0a"], x))
    e0 = _relu(_conv(params["enc0b"], e0))
    e1 = _relu(_conv(params["enc1a"], _down(e0)))
    e1 = _relu(_conv(params["enc1b"], e1))
    b = _relu(_conv(params["bot_a"], _down(e1)))
    b = _relu(_conv(params["bot_b"], b))
    d1 = jnp.concatenate([_up(b), e1], axis=-1)
    d1 = _relu(_conv(params["dec1a"], d1))
    d1 = _relu(_conv(params["dec1b"], d1))
    d0 = jnp.concatenate([_up(d1), e0], axis=-1)
    d0 = _relu(_conv(params["dec0a"], d0))
    d0 = _relu(_conv(params["dec0b"], d0))
    return _conv(params["head"], d0)


# ---------------------------------------------------------------------------
# HDR pre/post (shared by inference and training)

_EPS = 1e-3


def encode_inputs(beauty, albedo, normal):
    """[H, W, 3] x3 -> [H, W, 9] network planes (log-irradiance, albedo,
    normal)."""
    alb = jnp.maximum(albedo, _EPS)
    irr = jnp.log1p(beauty / alb)
    return jnp.concatenate([irr, albedo, normal], axis=-1)


def decode_output(residual, inputs, albedo):
    """Residual head -> denoised beauty (re-modulate)."""
    irr = inputs[..., 0:3] + residual
    return jnp.expm1(jnp.maximum(irr, 0.0)) * jnp.maximum(albedo, _EPS)


def denoise_image(params, beauty, albedo, normal):
    """[H, W, 3] x3 -> [H, W, 3]; pads H, W to multiples of 4."""
    h, w = beauty.shape[:2]
    ph = (-h) % 4
    pw = (-w) % 4
    pad = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    x = encode_inputs(pad(beauty), pad(albedo), pad(normal))
    res = apply_unet(params, x[None])[0]
    out = decode_output(res, x, pad(albedo))
    return out[:h, :w]


# ---------------------------------------------------------------------------
# weight I/O


def save_params(params: Dict, path: str = _ASSET) -> None:
    flat = {}
    for name, p in params.items():
        flat[name + ".w"] = np.asarray(p["w"])
        flat[name + ".b"] = np.asarray(p["b"])
    np.savez_compressed(path, **flat)


def load_params(path: str = _ASSET) -> Optional[Dict]:
    """None when the asset is absent (callers fall back to A-Trous)."""
    if not os.path.exists(path):
        return None
    z = np.load(path)
    params: Dict = {}
    for k in z.files:
        name, leaf = k.rsplit(".", 1)
        params.setdefault(name, {})[leaf] = jnp.asarray(z[k])
    return params
