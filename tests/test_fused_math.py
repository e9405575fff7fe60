"""Component-form (fused-kernel) math must match the stacked jnp oracle.

The fused megakernel path re-expresses vecmath/mappings/BSDF over V3
component triples (fredholm_tpu/fused/); these tests pin numerical
equivalence against the [..., 3]-stacked implementations that the golden
images lock."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.bsdf import bsdf as bsdf_s
from fredholm_tpu.core import vecmath as vm
from fredholm_tpu.fused import cbsdf, cmappings, cvec
from fredholm_tpu.fused.cvec import V3, from_stacked, to_stacked
from fredholm_tpu.sampling import mappings as map_s
from fredholm_tpu.sampling.sampler import (
    init_sampler_state,
    sample_1d,
    sample_2d,
)

N = 257  # deliberately not lane-aligned: component form is shape-agnostic


def _rng():
    return np.random.default_rng(7)


def _unit(rng, n, hemi=False):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if hemi:
        v[:, 1] = np.abs(v[:, 1]) + 1e-3
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


def _rand_sp(rng, n):
    def s(lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32))

    def c():
        return jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    return {
        "base_color": c(),
        "diffuse": s(),
        "diffuse_roughness": s(),
        "specular": s(),
        "specular_color": c(),
        "specular_roughness": s(0.05, 1.0),
        "metalness": s(),
        "coat": s(),
        "coat_roughness": s(0.05, 1.0),
        "coat_color": c(),
        "transmission": s(),
        "transmission_color": c(),
        "sheen": s(),
        "sheen_color": c(),
        "sheen_roughness": s(0.05, 1.0),
        "subsurface": s(),
        "subsurface_color": c(),
        "thin_walled": jnp.asarray(
            (rng.uniform(0, 1, n) > 0.5).astype(np.float32)
        ),
    }


def _sp_to_c(sp):
    out = {}
    for k, v in sp.items():
        out[k] = from_stacked(v) if v.ndim == 2 else v
    return out


class TestCVec:
    def test_basic_ops(self):
        rng = _rng()
        a_s = _unit(rng, N)
        b_s = _unit(rng, N)
        a, b = from_stacked(a_s), from_stacked(b_s)
        np.testing.assert_allclose(cvec.dot(a, b), vm.dot(a_s, b_s), rtol=1e-6)
        np.testing.assert_allclose(
            to_stacked(cvec.cross(a, b)), vm.cross(a_s, b_s), rtol=1e-5,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            to_stacked(cvec.normalize(a + b, eps=1e-20)),
            vm.normalize(a_s + b_s, eps=1e-20),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            to_stacked(cvec.reflect(a, b)), vm.reflect(a_s, b_s),
            rtol=1e-5, atol=1e-6,
        )

    def test_refract_and_onb(self):
        rng = _rng()
        w_s = _unit(rng, N, hemi=True)
        n_s = _unit(rng, N, hemi=True)
        ior_i = jnp.full((N,), 1.0)
        ior_t = jnp.full((N,), 1.5)
        wt_s, ok_s = vm.refract(w_s, n_s, ior_i, ior_t)
        wt_c, ok_c = cvec.refract(
            from_stacked(w_s), from_stacked(n_s), ior_i, ior_t
        )
        np.testing.assert_array_equal(ok_c, ok_s)
        np.testing.assert_allclose(to_stacked(wt_c), wt_s, rtol=1e-5, atol=1e-6)

        t_s, b_s = vm.orthonormal_basis(n_s)
        t_c, b_c = cvec.orthonormal_basis(from_stacked(n_s))
        np.testing.assert_allclose(to_stacked(t_c), t_s, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(to_stacked(b_c), b_s, rtol=1e-5, atol=1e-6)

    def test_frames_and_offset(self):
        rng = _rng()
        v_s = _unit(rng, N)
        n_s = _unit(rng, N, hemi=True)
        t_s, b_s = vm.orthonormal_basis(n_s)
        loc_s = vm.world_to_local(v_s, t_s, n_s, b_s)
        loc_c = cvec.world_to_local(
            from_stacked(v_s), from_stacked(t_s), from_stacked(n_s),
            from_stacked(b_s),
        )
        np.testing.assert_allclose(to_stacked(loc_c), loc_s, rtol=1e-5,
                                   atol=1e-6)
        back_s = vm.local_to_world(loc_s, t_s, n_s, b_s)
        back_c = cvec.local_to_world(
            loc_c, from_stacked(t_s), from_stacked(n_s), from_stacked(b_s)
        )
        np.testing.assert_allclose(to_stacked(back_c), back_s, rtol=1e-5,
                                   atol=1e-6)

        p_s = jnp.asarray(
            _rng().uniform(-100, 100, (N, 3)).astype(np.float32)
        )
        off_s = vm.ray_origin_offset(p_s, n_s)
        off_c = cvec.ray_origin_offset(from_stacked(p_s), from_stacked(n_s))
        np.testing.assert_array_equal(to_stacked(off_c), off_s)


class TestCMappings:
    def test_disk_hemisphere_triangle(self):
        rng = _rng()
        u = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
        d_s = map_s.sample_concentric_disk(u)
        dx, dy = cmappings.sample_concentric_disk(u[..., 0], u[..., 1])
        np.testing.assert_allclose(
            jnp.stack([dx, dy], -1), d_s, rtol=1e-5, atol=1e-7
        )
        h_s = map_s.sample_cosine_weighted_hemisphere(u)
        h_c = cmappings.sample_cosine_weighted_hemisphere(u[..., 0], u[..., 1])
        np.testing.assert_allclose(to_stacked(h_c), h_s, rtol=1e-5, atol=1e-7)
        t_s = map_s.sample_triangle(u)
        t0, t1 = cmappings.sample_triangle(u[..., 0], u[..., 1])
        np.testing.assert_allclose(jnp.stack([t0, t1], -1), t_s, rtol=1e-6)

    def test_vndf(self):
        rng = _rng()
        wo_s = _unit(rng, N, hemi=True)
        u = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
        rough = jnp.asarray(rng.uniform(0.05, 1.0, N).astype(np.float32))
        from fredholm_tpu.bsdf.lobes import roughness_to_alpha

        alpha = roughness_to_alpha(rough, jnp.zeros_like(rough))
        wh_s = map_s.sample_vndf(wo_s, alpha, u)
        ax, ay = cbsdf.roughness_to_alpha(rough, jnp.zeros_like(rough))
        wh_c = cmappings.sample_vndf(
            from_stacked(wo_s), ax, ay, u[..., 0], u[..., 1]
        )
        np.testing.assert_allclose(to_stacked(wh_c), wh_s, rtol=1e-4,
                                   atol=1e-5)

    def test_sampler_draws_match_wavefront_sampler(self):
        """Static-dim component draws == dict-state sampler draws."""
        idx = jnp.arange(N, dtype=jnp.uint32)
        n_spp = jnp.full((N,), 3, jnp.uint32)
        st = init_sampler_state(idx, n_spp, N, jnp.uint32(42))

        u1_ref, st2 = sample_1d(st)
        u1_c = cmappings.draw_sobol_1d(
            st["sobol_index"], 1, st["sobol_seed"]
        )
        np.testing.assert_array_equal(u1_c, u1_ref)

        u2_ref, _ = sample_2d(st2)
        ux, uy = cmappings.draw_cmj_2d(
            st["cmj_n_spp"], st["cmj_image_idx"], 0, st["cmj_scramble"]
        )
        np.testing.assert_array_equal(jnp.stack([ux, uy], -1), u2_ref)


class TestCBsdf:
    @pytest.mark.parametrize(
        "lobes_on",
        [
            ("diffuse_r",),
            ("specular", "diffuse_r"),
            ("coat", "metal", "specular", "transmission", "sheen",
             "diffuse_t", "diffuse_r"),
        ],
    )
    def test_eval_pdf_sample_match(self, lobes_on):
        rng = _rng()
        sp = _rand_sp(rng, N)
        wo_s = _unit(rng, N, hemi=True)
        wi_s = _unit(rng, N)
        entering = jnp.asarray(rng.uniform(0, 1, N) > 0.3)

        ctx_s = bsdf_s.setup(wo_s, sp, entering, lobes_on)
        ctx_c = cbsdf.setup(
            from_stacked(wo_s), _sp_to_c(sp), entering, lobes_on
        )

        f_s = bsdf_s.eval(ctx_s, wo_s, wi_s)
        f_c = cbsdf.eval(ctx_c, from_stacked(wo_s), from_stacked(wi_s))
        np.testing.assert_allclose(
            to_stacked(f_c), f_s, rtol=2e-4, atol=1e-5
        )

        p_s = bsdf_s.eval_pdf(ctx_s, wo_s, wi_s)
        p_c = cbsdf.eval_pdf(ctx_c, from_stacked(wo_s), from_stacked(wi_s))
        np.testing.assert_allclose(p_c, p_s, rtol=2e-4, atol=1e-5)

        u = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        v = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
        wi_out_s, fs_s, pdf_s = bsdf_s.sample(ctx_s, wo_s, u, v)
        wi_out_c, fs_c, pdf_c = cbsdf.sample(
            ctx_c, from_stacked(wo_s), u, v[..., 0], v[..., 1]
        )
        np.testing.assert_allclose(
            to_stacked(wi_out_c), wi_out_s, rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            to_stacked(fs_c), fs_s, rtol=2e-4, atol=1e-4
        )
        np.testing.assert_allclose(pdf_c, pdf_s, rtol=2e-4, atol=1e-5)

    def test_lut_fetches_match(self):
        rng = _rng()
        wo_s = _unit(rng, N, hemi=True)
        rough = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        f0 = jnp.full((N,), 0.04, jnp.float32)
        from fredholm_tpu.bsdf.lut import (
            compute_directional_albedo_reflection as refl_s,
            compute_directional_albedo_sheen as sheen_s,
        )

        a_s = refl_s(wo_s, rough, f0)
        a_c = cbsdf.compute_directional_albedo_reflection(
            from_stacked(wo_s), rough, f0
        )
        np.testing.assert_allclose(a_c, a_s, rtol=1e-4, atol=1e-6)

        b_s = sheen_s(wo_s, rough)
        b_c = cbsdf.compute_directional_albedo_sheen(from_stacked(wo_s), rough)
        np.testing.assert_allclose(b_c, b_s, rtol=1e-4, atol=1e-6)
