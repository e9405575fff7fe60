"""Thin-film interference wiring (bxdf.cu:434-454 made reachable).

The reference implements fresnel_airy but never passes thin_film_thickness
to the specular lobe (bxdf.cu:434 ctor defaults + bsdf.cu never forwarding
it); here Material.thin_film_thickness / thin_film_ior are real inputs.
"""

import jax.numpy as jnp
import numpy as np

from fredholm_tpu.bsdf import bsdf as bsdf_mod
from fredholm_tpu.bsdf import lobes
from fredholm_tpu.bsdf.fresnel import fresnel_airy, fresnel_dielectric

from test_bsdf import default_sp, uniform2, unit_hemisphere

TF_LOBES = ("specular", "diffuse_r", "thin_film")
PLAIN_LOBES = ("specular", "diffuse_r")


def tf_sp(n, thickness, ior=1.5, **over):
    sp = default_sp(n, specular=1.0, **over)
    sp["thin_film_thickness"] = jnp.full((n,), thickness)
    sp["thin_film_ior"] = jnp.full((n,), ior)
    return sp


class TestAiryFresnel:
    def test_bounds(self):
        cos = jnp.linspace(0.02, 1.0, 64)
        f = fresnel_airy(
            cos,
            jnp.ones_like(cos),
            jnp.full_like(cos, 1.7),
            jnp.full_like(cos, 400.0),
            jnp.broadcast_to(jnp.asarray([1.5, 1.5, 1.5]), (64, 3)),
            jnp.zeros((64, 3)),
        )
        assert bool(jnp.all(f >= 0.0)) and bool(jnp.all(f <= 1.0))

    def test_film_produces_color(self):
        # interference must split the channels (iridescence): a film over a
        # dielectric reflects a non-gray spectrum at some angle
        cos = jnp.linspace(0.1, 0.95, 32)
        f = fresnel_airy(
            cos,
            jnp.ones_like(cos),
            jnp.full_like(cos, 1.4),
            jnp.full_like(cos, 550.0),
            jnp.broadcast_to(jnp.asarray([1.5, 1.5, 1.5]), (32, 3)),
            jnp.zeros((32, 3)),
        )
        spread = jnp.max(f, axis=-1) - jnp.min(f, axis=-1)
        assert float(jnp.max(spread)) > 0.02


class TestThinFilmLobe:
    def test_zero_thickness_matches_dielectric(self):
        n = 128
        wo = unit_hemisphere(n, 1)
        wi = unit_hemisphere(n, 2)
        alpha = lobes.roughness_to_alpha(
            jnp.full((n,), 0.3), jnp.zeros((n,))
        )
        f_tf = lobes.microfacet_reflection_thinfilm_eval(
            jnp.full((n,), 1.5), jnp.full((n,), 1.5), jnp.zeros((n,)),
            alpha, wo, wi,
        )
        f_pl = lobes.microfacet_reflection_dielectric_eval(
            jnp.full((n,), 1.5), alpha, wo, wi
        )
        np.testing.assert_allclose(
            np.asarray(f_tf), np.asarray(f_pl), rtol=1e-5, atol=1e-6
        )

    def test_bsdf_zero_thickness_matches_plain(self):
        # the thin_film static gate with an all-zero-thickness wavefront
        # must be a no-op vs the plain specular lobe
        n = 256
        wo = unit_hemisphere(n, 3)
        wi = unit_hemisphere(n, 4)
        sp = tf_sp(n, 0.0)
        c_tf = bsdf_mod.setup(wo, sp, jnp.full((n,), True), TF_LOBES)
        c_pl = bsdf_mod.setup(wo, sp, jnp.full((n,), True), PLAIN_LOBES)
        np.testing.assert_allclose(
            np.asarray(bsdf_mod.eval(c_tf, wo, wi)),
            np.asarray(bsdf_mod.eval(c_pl, wo, wi)),
            rtol=1e-5, atol=1e-6,
        )

    def test_film_changes_reflection(self):
        n = 256
        wo = unit_hemisphere(n, 5)
        wi = unit_hemisphere(n, 6)
        sp0 = tf_sp(n, 0.0)
        sp1 = tf_sp(n, 480.0, ior=1.8)
        c0 = bsdf_mod.setup(wo, sp0, jnp.full((n,), True), TF_LOBES)
        c1 = bsdf_mod.setup(wo, sp1, jnp.full((n,), True), TF_LOBES)
        f0 = np.asarray(bsdf_mod.eval(c0, wo, wi))
        f1 = np.asarray(bsdf_mod.eval(c1, wo, wi))
        assert np.all(np.isfinite(f1))
        assert np.max(np.abs(f1 - f0)) > 1e-4

    def test_energy_no_gain(self):
        # hemisphere integral of the thin-film specular lobe <= 1 (Airy
        # reflectance <= 1 everywhere, so the film can't add energy)
        n = 4096
        rng = np.random.default_rng(9)
        wo = jnp.broadcast_to(
            jnp.asarray([0.4, np.sqrt(1 - 0.32), 0.4], jnp.float32), (n, 3)
        )
        sp = tf_sp(n, 300.0, ior=1.6, diffuse=0.0)
        ctx = bsdf_mod.setup(wo, sp, jnp.full((n,), True), TF_LOBES)
        u = jnp.asarray(rng.uniform(size=(n,)).astype(np.float32))
        v = uniform2(n, 10)
        wi, f, pdf = bsdf_mod.sample(ctx, wo, u, v)
        w = np.asarray(
            jnp.where(
                (pdf > 1e-8)[..., None],
                f * jnp.abs(wi[..., 1:2]) / jnp.maximum(pdf, 1e-8)[..., None],
                0.0,
            )
        )
        assert np.all(np.isfinite(w))
        assert float(w.mean(axis=0).max()) <= 1.05

    def test_sample_eval_agree(self):
        n = 512
        wo = unit_hemisphere(n, 7)
        sp = tf_sp(n, 520.0, ior=1.4, diffuse=0.0)
        ctx = bsdf_mod.setup(wo, sp, jnp.full((n,), True), TF_LOBES)
        u = jnp.zeros((n,))
        v = uniform2(n, 8)
        wi, f_s, pdf = bsdf_mod.sample(ctx, wo, u, v)
        f_e = bsdf_mod.eval(ctx, wo, wi)
        ok = np.asarray(pdf) > 1e-6
        np.testing.assert_allclose(
            np.asarray(f_s)[ok], np.asarray(f_e)[ok], rtol=1e-3, atol=1e-5
        )


class TestThinFilmRender:
    def test_render_smoke(self):
        # end-to-end: a thin-film material routes to the general path and
        # renders finite, non-black, and different from the film-free scene
        from fredholm_tpu.renderer import Renderer
        from fredholm_tpu.scene.procedural import cornell_box

        def render(thickness):
            sc = cornell_box()
            for m in sc.materials:
                m.specular = 1.0
                m.specular_roughness = 0.15
                m.thin_film_thickness = thickness
                m.thin_film_ior = 1.8
            r = Renderer(width=24, height=24)
            r.use_pallas = False
            r.set_scene(sc)
            cfg = r._config(1, 3)
            if thickness > 0:
                assert not cfg.use_fused
                assert "thin_film" in cfg.lobes_on
            r.render(n_samples=2, max_depth=3)
            return np.asarray(r.layers["beauty"])

        img_tf = render(620.0)
        assert np.all(np.isfinite(img_tf))
        assert img_tf.max() > 0.0
        img_plain = render(0.0)
        assert np.max(np.abs(img_tf - img_plain)) > 1e-3
