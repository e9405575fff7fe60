"""Hosek-Wilkie analytic sky-dome radiance model.

TPU-native re-implementation of the reference's vendored sample code
(/root/reference/fredholm/include/fredholm/arhosek.h:144-322 host "cook",
/root/reference/fredholm/modules/arhosek.cu:103-127 device eval). The
coefficient dataset ships as assets/hosek_rgb.npz (the authors' published
BSD-3 data, see tools/extract_hosek_data.py).

Host side cooks a 9-coefficient configuration + radiance scale per RGB
channel from (turbidity, albedo, solar elevation) by quintic bezier
interpolation over elevation and bilinear blending over albedo/turbidity;
device side evaluates the Perez-style radiance formula for a wavefront of
directions.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "hosek_rgb.npz")


def _load():
    data = np.load(_ASSET)
    return data["config"].reshape(3, 2, 10, 6, 9), data["radiance"].reshape(
        3, 2, 10, 6
    )


_CONFIG = None
_RAD = None


def _tables():
    global _CONFIG, _RAD
    if _CONFIG is None:
        _CONFIG, _RAD = _load()
    return _CONFIG, _RAD


def _bezier_weights(solar_elevation: float) -> np.ndarray:
    """Quintic bezier weights over the 6 elevation control points
    (arhosek.h:151-165); elevation is warped by the cube root."""
    t = (solar_elevation / (np.pi / 2.0)) ** (1.0 / 3.0)
    s = 1.0 - t
    return np.asarray(
        [
            s**5,
            5.0 * s**4 * t,
            10.0 * s**3 * t**2,
            10.0 * s**2 * t**3,
            5.0 * s * t**4,
            t**5,
        ],
        dtype=np.float64,
    )


def cook_state(turbidity: float, albedo: float, solar_elevation: float) -> Dict:
    """ArHosekSkyModelState analog (arhosek.h:131-140, :305-322).

    Returns {"configs": [3, 9] float32, "radiances": [3] float32}.
    """
    cfg_table, rad_table = _tables()
    turbidity = float(np.clip(turbidity, 1.0, 10.0))
    albedo = float(np.clip(albedo, 0.0, 1.0))
    elevation = float(np.clip(solar_elevation, 0.0, np.pi / 2.0))

    int_t = int(turbidity)
    rem = turbidity - int_t
    w = _bezier_weights(elevation)

    ti0 = int_t - 1
    configs = np.zeros((3, 9), np.float64)
    radiances = np.zeros((3,), np.float64)
    for a, wa in ((0, 1.0 - albedo), (1, albedo)):
        # low-turbidity control row
        configs += wa * (1.0 - rem) * np.einsum(
            "e,ceo->co", w, cfg_table[:, a, ti0]
        )
        radiances += wa * (1.0 - rem) * (rad_table[:, a, ti0] @ w)
        if int_t < 10:
            configs += wa * rem * np.einsum(
                "e,ceo->co", w, cfg_table[:, a, ti0 + 1]
            )
            radiances += wa * rem * (rad_table[:, a, ti0 + 1] @ w)

    return {
        "configs": jnp.asarray(configs.astype(np.float32)),
        "radiances": jnp.asarray(radiances.astype(np.float32)),
    }


def sky_radiance(state: Dict, theta, gamma):
    """Batched device eval (arhosek.cu:103-127).

    theta: [N] view zenith angle; gamma: [N] angle to the sun.
    Returns [N, 3] RGB radiance.
    """
    c = state["configs"]  # [3, 9]
    # The model is defined for theta in [0, pi/2]; below the horizon the
    # Perez-style terms explode (exp(c1/cos) with cos->0-). The reference
    # evaluates the raw formula and relies on its whole-sample NaN scrub to
    # discard such paths (pt.cu:474-478); we clamp to the horizon instead,
    # which is well-defined and keeps the sample.
    theta = jnp.minimum(theta, 0.5 * jnp.pi - 1e-3)
    cos_g = jnp.cos(gamma)[..., None]
    cos_t = jnp.cos(theta)[..., None]
    exp_m = jnp.exp(c[:, 4] * gamma[..., None])
    ray_m = cos_g * cos_g
    mie_m = (1.0 + cos_g * cos_g) / jnp.power(
        jnp.maximum(1.0 + c[:, 8] ** 2 - 2.0 * c[:, 8] * cos_g, 1e-8), 1.5
    )
    zenith = jnp.sqrt(jnp.maximum(cos_t, 0.0))
    radiance = (
        1.0 + c[:, 0] * jnp.exp(c[:, 1] / (cos_t + 0.01))
    ) * (c[:, 2] + c[:, 3] * exp_m + c[:, 5] * ray_m + c[:, 6] * mie_m + c[:, 7] * zenith)
    return jnp.maximum(radiance * state["radiances"], 0.0)


def sun_elevation_from_direction(sun_dir: np.ndarray) -> float:
    """renderer.h:596-607: elevation = pi/2 - zenith angle of the sun dir."""
    y = float(np.clip(sun_dir[1], -1.0, 1.0))
    return 0.5 * np.pi - np.arccos(y)
