"""Sample-slot regeneration (experimental/pt_regen.py).

The regeneration wavefront must produce the SAME sample stream as the
unrolled fused pipeline — only the lane/stage packing differs — so its
layers must match to float-merge tolerance, and per-pixel progressive
accounting must keep the render(n);render(m) == render(n+m) invariant.
"""

import numpy as np

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import cornell_box, sphere_array_test


def _cornell(regen, width=64, height=64):
    r = Renderer(width=width, height=height)
    r.use_pallas = False
    r.use_regen = regen
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    return r


class TestRegenEquivalence:
    def test_matches_unrolled_pipeline(self):
        ref = _cornell(False)
        ref.render(n_samples=4, max_depth=3)
        reg = _cornell(True)
        reg.render(n_samples=4, max_depth=3)
        # identical sample set => identical shaded-vertex count
        assert float(np.asarray(ref.layers["n_path_vertices"])) == float(
            np.asarray(reg.layers["n_path_vertices"])
        )
        for k in ("beauty", "position", "normal", "depth", "texcoord",
                  "albedo"):
            np.testing.assert_allclose(
                np.asarray(ref.layers[k]),
                np.asarray(reg.layers[k]),
                rtol=2e-4,
                atol=2e-5,
                err_msg=k,
            )

    def test_progressive_split_equals_joint(self):
        a = _cornell(True)
        a.render(n_samples=2, max_depth=3)
        a.render(n_samples=2, max_depth=3)
        b = _cornell(True)
        b.render(n_samples=4, max_depth=3)
        np.testing.assert_allclose(
            np.asarray(a.layers["beauty"]),
            np.asarray(b.layers["beauty"]),
            rtol=1e-4,
            atol=1e-5,
        )
        assert int(np.asarray(a.sample_count).min()) == 4
        assert int(np.asarray(a.sample_count).max()) == 4

    def test_open_scene_with_lights(self):
        """Open scene + directional light + area-light-free Hosek: the
        regeneration win case (most paths die at depth 1)."""
        out = {}
        for regen in (False, True):
            r = Renderer(width=64, height=48)
            r.use_pallas = False
            r.use_regen = regen
            r.set_scene(sphere_array_test("metalness", [0.0, 0.5, 1.0]))
            r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3],
                                    angle=0.5)
            r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
            r.render(n_samples=3, max_depth=4)
            assert r._config(1, 4).use_fused, "scene must take the fused path"
            out[regen] = np.asarray(r.layers["beauty"])
            assert np.isfinite(out[regen]).all()
        np.testing.assert_allclose(out[True], out[False], rtol=2e-4,
                                   atol=2e-5)


class TestDynamicSobol:
    def test_matches_static_dims(self):
        """sobol_owen_float_dyn must be bit-identical to sobol_owen_float
        at every selected dimension."""
        import jax.numpy as jnp

        from fredholm_tpu.sampling.sobol import (
            sobol_owen_float,
            sobol_owen_float_dyn,
        )

        idx = jnp.arange(512, dtype=jnp.uint32) * 7 + 3
        seed = jnp.uint32(0xDEADBEEF)
        base, step, n_opt = 2, 4, 5
        for j in range(n_opt):
            sel = jnp.full((512,), j, jnp.uint32)
            dyn = sobol_owen_float_dyn(idx, base, step, sel, n_opt, seed)
            ref = sobol_owen_float(idx, base + step * j, seed)
            np.testing.assert_array_equal(np.asarray(dyn), np.asarray(ref))

    def test_mixed_lanes(self):
        import jax.numpy as jnp

        from fredholm_tpu.sampling.sobol import (
            sobol_owen_float,
            sobol_owen_float_dyn,
        )

        n = 640
        idx = jnp.arange(n, dtype=jnp.uint32)
        sel = (idx % 5).astype(jnp.uint32)
        seed = jnp.uint32(12345)
        dyn = np.asarray(sobol_owen_float_dyn(idx, 1, 3, sel, 5, seed))
        for j in range(5):
            lanes = np.asarray(sel) == j
            ref = np.asarray(sobol_owen_float(idx, 1 + 3 * j, seed))
            np.testing.assert_array_equal(dyn[lanes], ref[lanes])
