"""The fused megakernel pipeline must produce the SAME image as the
reference wavefront integrator (integrator/pt.py) — same sampler draws,
same math, float-reassociation tolerance only."""

import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.renderer import Renderer, _render_jit
from fredholm_tpu.scene.procedural import cornell_box


def _setup(width=32, height=32, sky=None):
    r = Renderer(width=width, height=height)
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    if sky == "hosek":
        r.set_directional_light(
            [1.0, 0.9, 0.8], [0.4, 0.8, 0.2], angle=0.5
        )
        r.load_arhosek_sky(turbidity=3.0, albedo=0.2)
    elif sky == "constant":
        r.set_bg_color([0.4, 0.5, 0.7])
    return r


def _render_pair(r, n_samples, max_depth):
    """(fused layers, reference layers) from identical initial state."""
    import dataclasses

    assert r._config(1, max_depth).use_fused, "scene must be in envelope"

    out = {}
    for fused in (True, False):
        r.init_render_states()
        config = dataclasses.replace(
            r._config(1, max_depth), use_fused=fused
        )
        layers, count = r.layers, r.sample_count
        arrays = r._arrays()
        dynamic = r._dynamic_params()
        for _ in range(n_samples):
            layers, count = _render_jit(arrays, dynamic, layers, count, config)
        out[fused] = layers
    return out[True], out[False]


class TestFusedEquivalence:
    def test_cornell_matches_reference(self):
        r = _setup()
        fused, ref = _render_pair(r, n_samples=2, max_depth=4)
        for key in ("beauty", "position", "normal", "depth", "texcoord",
                    "albedo"):
            np.testing.assert_allclose(
                np.asarray(fused[key]), np.asarray(ref[key]),
                rtol=2e-4, atol=2e-4, err_msg=key,
            )
        np.testing.assert_allclose(
            float(fused["n_path_vertices"]), float(ref["n_path_vertices"]),
            rtol=1e-6,
        )

    def test_constant_sky_open_scene(self):
        r = _setup(sky="constant")
        # pull the camera back so some primaries miss (tests the sky path)
        r.camera.origin = np.asarray([0.0, 1.0, 4.5], np.float32)
        r.camera._update_transform()
        fused, ref = _render_pair(r, n_samples=2, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(fused["beauty"]), np.asarray(ref["beauty"]),
            rtol=2e-4, atol=2e-4,
        )

    def test_hosek_with_directional_light(self):
        r = _setup(sky="hosek")
        r.camera.origin = np.asarray([0.0, 1.0, 4.5], np.float32)
        r.camera._update_transform()
        fused, ref = _render_pair(r, n_samples=2, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(fused["beauty"]), np.asarray(ref["beauty"]),
            rtol=5e-4, atol=5e-4,
        )

    def test_progressive_accumulation_consistent(self):
        """render(2) then render(2) == render(4) through the fused path."""
        r = _setup()
        r.render(n_samples=2, max_depth=3)
        r.render(n_samples=2, max_depth=3)
        split = np.asarray(r.layers["beauty"])
        r.init_render_states()
        r.render(n_samples=4, max_depth=3)
        joint = np.asarray(r.layers["beauty"])
        np.testing.assert_allclose(split, joint, rtol=1e-5, atol=1e-6)

    def test_fused_config_gating(self):
        """Textured scenes must NOT take the fused path."""
        r = _setup()
        assert r._config(1, 3).use_fused
        r.use_fused = False
        assert not r._config(1, 3).use_fused

    def test_ibl_matches_reference(self):
        """IBL sky (importance-sampled NEE) through the fused pipeline
        equals the general integrator — closes the last sky-mode gap in
        the fused envelope (pt.cu:344-350 env fetch + our IS extension)."""
        from fredholm_tpu.scene.procedural import gradient_ibl

        r = _setup()
        r.camera.origin = np.asarray([0.0, 1.0, 4.5], np.float32)
        r.camera._update_transform()
        r.set_ibl(gradient_ibl(width=64, height=32))
        assert r.ibl_importance_sampling and r._ibl_dist is not None
        assert r._config(1, 3).use_fused
        fused, ref = _render_pair(r, n_samples=2, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(fused["beauty"]), np.asarray(ref["beauty"]),
            rtol=5e-4, atol=5e-4,
        )

    def test_ibl_no_is_matches_reference(self):
        """IBL with importance sampling disabled (cosine sky NEE — the
        reference's actual behavior, pt.cu:797 TODO) also matches."""
        from fredholm_tpu.scene.procedural import gradient_ibl

        r = _setup()
        r.camera.origin = np.asarray([0.0, 1.0, 4.5], np.float32)
        r.camera._update_transform()
        r.ibl_importance_sampling = False
        r.set_ibl(gradient_ibl(width=64, height=32))
        assert r._config(1, 3).use_fused
        fused, ref = _render_pair(r, n_samples=2, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(fused["beauty"]), np.asarray(ref["beauty"]),
            rtol=5e-4, atol=5e-4,
        )
