"""End-to-end integrator tests (small resolutions; CPU backend).

Mirrors the reference's scene-based validation strategy (SURVEY.md section
4): Cornell-box global illumination, white-furnace energy conservation, and
progressive-accumulation semantics.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import cornell_box, furnace_sphere
from fredholm_tpu.scene.types import Material


def make_cornell_renderer(res=32):
    r = Renderer(width=res, height=res)
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 3.4], np.float32)
    r.camera._update_transform()
    return r


class TestCornell:
    def test_renders_finite_nonblack(self):
        r = make_cornell_renderer()
        layers = r.render(n_samples=4, max_depth=3)
        b = np.asarray(layers["beauty"])
        assert np.isfinite(b).all()
        assert b.mean() > 0.001
        assert int(np.asarray(r.sample_count).min()) == 4

    def test_color_bleeding_sides(self):
        r = make_cornell_renderer(48)
        # camera close enough that the walls fill the frame (the eye sits
        # f~1 behind the origin, camera.cu:14-16 pinhole-at-z=f quirk)
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
        r.camera._update_transform()
        r.render(n_samples=16, max_depth=4)
        img = r.get_layer("beauty")
        h, w, _ = img.shape
        mid = img[h // 3 : 2 * h // 3]
        left = mid[:, 2 : w // 5].reshape(-1, 3).mean(0)
        right = mid[:, -w // 5 : -2].reshape(-1, 3).mean(0)
        # red wall on the left, green wall on the right
        assert left[0] > left[1], left
        assert right[1] > right[0], right

    def test_progressive_accumulation_deterministic(self):
        # 2 renders of 2 spp == 1 render of 4 spp (same sampler stream)
        r1 = make_cornell_renderer()
        r1.render(n_samples=2, max_depth=3)
        r1.render(n_samples=2, max_depth=3)
        r2 = make_cornell_renderer()
        r2.render(n_samples=4, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(r1.layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_clear_resets(self):
        r = make_cornell_renderer()
        r.render(n_samples=2, max_depth=3)
        r.init_render_states()
        assert int(np.asarray(r.sample_count).max()) == 0
        assert float(np.asarray(r.layers["beauty"]).max()) == 0.0

    def test_aovs_populated(self):
        r = make_cornell_renderer()
        # eye (origin + f backward) inside the opening cone so every pixel
        # hits geometry
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
        r.camera._update_transform()
        # 1 spp: with more, edge pixels average normals of different
        # surfaces and shorten them (streaming average, pt.cu:484)
        layers = r.render(n_samples=1, max_depth=3)
        assert float(np.asarray(layers["depth"]).max()) > 0.5
        n = np.asarray(layers["normal"])
        lengths = np.linalg.norm(n, axis=-1)
        assert (lengths > 0.9).mean() > 0.9  # normals captured at first hit
        a = np.asarray(layers["albedo"])
        assert a.max() > 0.5


class TestWhiteFurnace:
    def test_diffuse_white_furnace(self):
        # lossless diffuse sphere in a constant 0.5 environment must vanish
        mat = Material(base_color=(1.0, 1.0, 1.0), specular=0.0)
        r = Renderer(width=24, height=24)
        r.set_scene(furnace_sphere(mat))
        r.set_bg_color((0.5, 0.5, 0.5))
        r.camera.origin = np.asarray([0.0, 0.0, 3.0], np.float32)
        r.camera._update_transform()
        r.render(n_samples=32, max_depth=16)
        img = np.asarray(r.layers["beauty"])
        np.testing.assert_allclose(img.mean(), 0.5, rtol=0.03)
        # per-pixel deviation bounded (noise + residual path truncation)
        assert np.abs(img.mean(-1) - 0.5).max() < 0.15


class TestSkyModes:
    def test_constant_bg_visible_on_miss(self):
        r = make_cornell_renderer()
        r.set_bg_color((0.2, 0.4, 0.6))
        # camera looking away from the box
        r.camera.origin = np.asarray([0.0, 1.0, 10.0], np.float32)
        r.camera.look_around(0.0, 0.0)
        r.render(n_samples=1, max_depth=2)
        img = r.get_layer("beauty")
        corner = img[0, 0]
        np.testing.assert_allclose(corner, [0.2, 0.4, 0.6], atol=0.05)

    def test_hosek_sky_renders(self):
        r = make_cornell_renderer()
        r.set_directional_light((1, 1, 1), (0.3, 1.0, 0.2), angle=0.5)
        r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
        layers = r.render(n_samples=2, max_depth=3)
        b = np.asarray(layers["beauty"])
        assert np.isfinite(b).all()
        assert b.mean() > 0.01

    def test_ibl_renders(self):
        r = make_cornell_renderer()
        env = np.zeros((8, 16, 3), np.float32)
        env[:4] = [0.8, 0.7, 0.6]  # bright upper hemisphere
        r.set_ibl(env)
        layers = r.render(n_samples=2, max_depth=3)
        b = np.asarray(layers["beauty"])
        assert np.isfinite(b).all()
        assert b.mean() > 0.01


class TestDirectionalLight:
    def test_sun_lights_open_scene(self):
        from fredholm_tpu.scene.procedural import sphere_array_test

        sc = sphere_array_test("specular_roughness", [0.2], with_floor=True)
        r = Renderer(width=24, height=24)
        r.set_scene(sc)
        r.camera.origin = np.asarray([0.0, 1.0, 4.0], np.float32)
        r.camera._update_transform()
        dark = r.render(n_samples=2, max_depth=2)
        dark_mean = float(np.asarray(dark["beauty"]).mean())
        r2 = Renderer(width=24, height=24)
        r2.set_scene(sc)
        r2.camera.origin = np.asarray([0.0, 1.0, 4.0], np.float32)
        r2.camera._update_transform()
        r2.set_directional_light((20, 20, 20), (0.3, 1.0, 0.3), angle=0.53)
        lit = r2.render(n_samples=2, max_depth=2)
        lit_mean = float(np.asarray(lit["beauty"]).mean())
        assert lit_mean > dark_mean + 0.01


class TestIBLImportanceSampling:
    def test_converges_to_same_image_with_less_variance(self):
        """IS and cosine sampling estimate the same integral; with a
        concentrated env map, IS must have lower variance."""
        # moderately bright compact region: big enough that the firefly
        # clamp (regularize_weight, pt.cu:372-376) never bites the cosine
        # estimator, so both estimators stay unbiased
        env = np.full((16, 32, 3), 0.02, np.float32)
        env[1:5, 18:24] = 3.0

        def run(importance):
            from fredholm_tpu.scene.procedural import sphere_array_test

            r = Renderer(width=16, height=16)
            r.ibl_importance_sampling = importance
            r.set_scene(sphere_array_test("diffuse_roughness", [0.0]))
            r.camera.origin = np.asarray([0.0, 0.6, 2.5], np.float32)
            r.camera._update_transform()
            r.set_ibl(env)
            means = []
            for seed in range(4):
                r.seed = 100 + seed
                r.init_render_states()
                r.render(n_samples=8, max_depth=2)
                means.append(float(np.asarray(r.layers["beauty"]).mean()))
            return np.asarray(means)

        m_is = run(True)
        m_cos = run(False)
        # same expected value...
        np.testing.assert_allclose(m_is.mean(), m_cos.mean(), rtol=0.25)
        # ...with (much) tighter spread under importance sampling
        assert m_is.std() < m_cos.std()
