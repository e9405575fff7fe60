"""Camera: host-side interactive state + device-side batched ray generation.

TPU-native re-implementation of the reference's host camera
(/root/reference/fredholm/include/fredholm/camera.h:22-136) and device
camera models (/root/reference/fredholm/modules/camera.cu): pinhole and
thin-lens with F-number / focus distance and concentric-disk aperture
sampling. Ray generation is vectorized over the whole pixel wavefront.
"""

from __future__ import annotations

import dataclasses
import enum
import math
import jax.numpy as jnp
import numpy as np

from .core.vecmath import (
    normalize,
    transform_direction,
    transform_position,
    vec3,
)
from .sampling.mappings import sample_concentric_disk


class CameraMovement(enum.Enum):
    FORWARD = 0
    BACKWARD = 1
    RIGHT = 2
    LEFT = 3
    UP = 4
    DOWN = 5


def _look_at(origin: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Inverse of glm::lookAt — a camera-to-world 4x4 (camera.h:66-67)."""
    f = target - origin
    f = f / max(np.linalg.norm(f), 1e-12)
    r = np.cross(f, up)
    r = r / max(np.linalg.norm(r), 1e-12)
    u = np.cross(r, f)
    m = np.eye(4, dtype=np.float32)
    # camera-to-world columns: right, up, backward (OpenGL convention)
    m[:3, 0] = r
    m[:3, 1] = u
    m[:3, 2] = -f
    m[:3, 3] = origin
    return m


@dataclasses.dataclass
class Camera:
    """FPS-style camera (camera.h:22-136): WASD movement + spherical
    look-around, producing a camera-to-world transform."""

    origin: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    fov: float = 0.5 * math.pi
    # NOTE: the reference Camera ctor defaults F=8 (camera.h:40) but every
    # app overrides it (GUI default 100, controller.h:95; rtcamp8 uses 100,
    # rtcamp8.cpp:131) — F=8 at the default focus distance defocuses
    # everything; use the apps' default
    f_number: float = 100.0
    focus: float = 10000.0
    movement_speed: float = 1.0
    look_around_speed: float = 0.1
    phi: float = 270.0
    theta: float = 90.0

    def __post_init__(self):
        self.origin = np.asarray(self.origin, np.float32)
        self.forward = np.asarray([0.0, 0.0, -1.0], np.float32)
        self.right = np.cross(self.forward, [0.0, 1.0, 0.0]).astype(np.float32)
        self.right /= max(np.linalg.norm(self.right), 1e-12)
        self.up = np.cross(self.right, self.forward).astype(np.float32)
        self.up /= max(np.linalg.norm(self.up), 1e-12)
        self._update_transform()

    def _update_transform(self):
        self.transform = _look_at(
            self.origin, self.origin + 0.01 * self.forward, self.up
        )

    def set_transform(self, m: np.ndarray):
        """Directly set a camera-to-world 4x4 (e.g. from a glTF node)."""
        self.transform = np.asarray(m, np.float32)
        self.origin = self.transform[:3, 3].copy()

    def move(self, direction: CameraMovement, dt: float):
        v = self.movement_speed * dt
        step = {
            CameraMovement.FORWARD: self.forward,
            CameraMovement.BACKWARD: -self.forward,
            CameraMovement.RIGHT: self.right,
            CameraMovement.LEFT: -self.right,
            CameraMovement.UP: self.up,
            CameraMovement.DOWN: -self.up,
        }[direction]
        self.origin = self.origin + v * step
        self._update_transform()

    def look_around(self, d_phi: float, d_theta: float):
        # camera.h:112-136
        self.phi += self.look_around_speed * d_phi
        if self.phi < 0.0:
            self.phi = 360.0
        if self.phi > 360.0:
            self.phi = 0.0
        self.theta += self.look_around_speed * d_theta
        if self.theta < 0.0:
            self.theta = 180.0
        if self.theta > 180.0:
            self.theta = 0.0
        pr = math.radians(self.phi)
        tr = math.radians(self.theta)
        self.forward = np.asarray(
            [
                math.cos(pr) * math.sin(tr),
                math.cos(tr),
                math.sin(pr) * math.sin(tr),
            ],
            np.float32,
        )
        self.right = np.cross(self.forward, [0.0, 1.0, 0.0]).astype(np.float32)
        self.right /= max(np.linalg.norm(self.right), 1e-12)
        self.up = np.cross(self.right, self.forward).astype(np.float32)
        self.up /= max(np.linalg.norm(self.up), 1e-12)
        self._update_transform()

    def device_params(self) -> dict:
        """CameraParams for the ray-gen kernels (shared.h:59-64)."""
        return {
            "transform": jnp.asarray(self.transform[:3, :]),  # [3, 4] rows
            "fov": jnp.float32(self.fov),
            "F": jnp.float32(self.f_number),
            "focus": jnp.float32(self.focus),
        }


# ---------------------------------------------------------------------------
# device ray generation


def pixel_uv(px, py, jitter, width: int, height: int):
    """Film-plane uv from pixel indices + subpixel jitter (pt.cu:438-442):
    uv in [-aspect, aspect] x [-1, 1], x flipped."""
    u = (2.0 * (px.astype(jnp.float32) + jitter[..., 0]) - width) / height
    v = (2.0 * (py.astype(jnp.float32) + jitter[..., 1]) - height) / height
    return jnp.stack([-u, v], axis=-1)


def sample_ray_pinhole(params, uv):
    """camera.cu:8-22. uv: [N, 2]. Returns (origin, direction, pdf)."""
    f = 1.0 / jnp.tan(0.5 * params["fov"])
    zeros = jnp.zeros_like(uv[..., 0])
    p_sensor = vec3(uv[..., 0], uv[..., 1], zeros)
    p_pinhole = vec3(zeros, zeros, jnp.full_like(zeros, f))

    origin = transform_position(params["transform"], p_pinhole)
    d = normalize(p_pinhole - p_sensor)
    d = d * jnp.asarray([1.0, 1.0, -1.0], d.dtype)  # z-flip (camera.cu:19)
    direction = transform_direction(params["transform"], d)
    pdf = 1.0 / jnp.abs(d[..., 2])
    return origin, direction, pdf


def sample_ray_thinlens(params, uv, u_lens):
    """camera.cu:24-53. uv: [N, 2] film point; u_lens: [N, 2] aperture
    sample. Returns (origin, direction, pdf)."""
    f = 1.0 / jnp.tan(0.5 * params["fov"])
    b = params["focus"]
    a = 1.0 / (1.0 + f - 1.0 / b)
    lens_radius = 2.0 * f / params["F"]

    zeros = jnp.zeros_like(uv[..., 0])
    p_sensor = vec3(uv[..., 0], uv[..., 1], zeros)
    p_lens_center = vec3(zeros, zeros, jnp.full_like(zeros, f))

    p_disk = lens_radius * sample_concentric_disk(u_lens)
    p_lens = p_lens_center + vec3(p_disk[..., 0], p_disk[..., 1], zeros)

    sensor_to_lens_center = normalize(p_lens_center - p_sensor)
    p_object = p_sensor + (
        (a + b) / sensor_to_lens_center[..., 2]
    )[..., None] * sensor_to_lens_center

    origin = transform_position(params["transform"], p_lens)
    d = normalize(p_object - p_lens)
    d = d * jnp.asarray([1.0, 1.0, -1.0], d.dtype)
    direction = transform_direction(params["transform"], d)
    pdf = 1.0 / (d[..., 2] * d[..., 2])
    return origin, direction, pdf
