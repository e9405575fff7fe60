"""Temporal accumulation: reprojection inverts raygen; blending cuts
noise on tracked surfaces and never ghosts disocclusions."""

import numpy as np
import pytest

from fredholm_tpu.camera import Camera, pixel_uv, sample_ray_pinhole
from fredholm_tpu.denoise.temporal import TemporalAccumulator, _project


def _camera(origin, phi=0.0):
    c = Camera(origin=np.asarray(origin, np.float32))
    if phi:
        c.look_around(phi, 0.0)
    c._update_transform()
    return c


class TestReprojection:
    def test_project_inverts_raygen(self):
        """Points along pinhole rays reproject onto their source pixels
        (exact inverse of camera.cu:8-22 + pt.cu:438-442)."""
        import jax.numpy as jnp

        w, h = 16, 12
        cam = _camera([0.3, 1.0, 4.0], phi=10.0)
        params = cam.device_params()
        ys, xs = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xs.ravel())
        py = jnp.asarray(ys.ravel())
        jitter = jnp.full((px.shape[0], 2), 0.5)
        uv = pixel_uv(px, py, jitter, w, h)
        o, d, _ = sample_ray_pinhole(params, uv)
        pts = np.asarray(o + 2.7 * d).reshape(h, w, 3)

        rx, ry, front = _project(pts, params, w, h)
        assert front.all()
        np.testing.assert_allclose(rx, xs, atol=1e-3)
        np.testing.assert_allclose(ry, ys, atol=1e-3)


class TestTemporalAccumulator:
    def _setup(self, seed):
        rng = np.random.default_rng(seed)
        h, w = 12, 16
        cam = _camera([0.0, 1.0, 4.0])
        params = cam.device_params()
        # a fixed surface: points at depth 3 along each pixel ray
        import jax.numpy as jnp

        ys, xs = np.mgrid[0:h, 0:w]
        jitter = jnp.full((h * w, 2), 0.5)
        uv = pixel_uv(jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
                      jitter, w, h)
        o, d, _ = sample_ray_pinhole(params, uv)
        pos = np.asarray(o + 3.0 * d).reshape(h, w, 3)
        clean = np.linalg.norm(pos, axis=-1, keepdims=True) * [0.2, 0.3, 0.1]
        return params, pos, clean, rng

    def test_static_camera_reduces_noise(self):
        params, pos, clean, rng = self._setup(0)
        acc = TemporalAccumulator(alpha=0.8)
        out = None
        for _ in range(8):
            noisy = clean + rng.normal(0, 0.1, clean.shape)
            out = acc(noisy, pos, params)
        resid = np.abs(out - clean).mean()
        single = 0.1 * np.sqrt(2 / np.pi)  # E|N(0, 0.1)|
        assert resid < 0.5 * single, (resid, single)

    def test_disocclusion_uses_current_frame(self):
        params, pos, clean, rng = self._setup(1)
        acc = TemporalAccumulator(alpha=0.9)
        acc(clean + 10.0, pos, params)  # corrupted history
        # surface moved far: every pixel is a disocclusion
        out = acc(clean, pos + 5.0, params)
        np.testing.assert_allclose(out, clean, atol=1e-6)

    def test_history_follows_camera_motion(self):
        """A small camera truck: history reprojects through the PREVIOUS
        camera, so tracked pixels still blend (not all rejected)."""
        params0, pos, clean, rng = self._setup(2)
        acc = TemporalAccumulator(alpha=0.8)
        acc(clean, pos, params0)
        cam1 = _camera([0.05, 1.0, 4.0])
        params1 = cam1.device_params()
        # the SURFACE is unchanged; only the camera moved. Positions seen
        # by the new camera are the same world points (approximately, for
        # a small truck the same pixel grid sees nearby points)
        out = acc(clean + 1.0, pos, params1)
        # blended output must sit strictly between current and history on
        # most pixels (i.e. reprojection validated, no blanket rejection)
        frac_blended = (out < clean + 0.99).mean()
        assert frac_blended > 0.5, frac_blended
