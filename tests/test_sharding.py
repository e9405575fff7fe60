"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fredholm_tpu.parallel.sharding import (
    make_mesh,
    render_progressive_sharded,
)
from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import cornell_box


def _setup(width=16, height=16):
    r = Renderer(width=width, height=height)
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    return r


def _sharded_render(r, mesh, n_samples, max_depth=2):
    dev, static_params, dynamic = r.sharding_inputs(
        max_depth=max_depth, use_pallas=False
    )

    def shard_leaf(leaf):
        spec = P("tiles") if getattr(leaf, "ndim", 0) > 0 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    layers = jax.tree.map(shard_leaf, r.layers)
    count = jax.device_put(r.sample_count, NamedSharding(mesh, P("tiles")))
    return render_progressive_sharded(
        mesh, dev, static_params, dynamic, layers, count, n_samples,
    )


class TestSharding:
    def test_eight_device_mesh(self):
        assert len(jax.devices()) >= 8

    def test_sharded_matches_single_device(self):
        r = _setup()
        mesh = make_mesh(8)
        layers, count = _sharded_render(r, mesh, n_samples=2)

        r2 = _setup()
        r2.use_pallas = False
        r2.render(n_samples=2, max_depth=2)

        np.testing.assert_allclose(
            np.asarray(layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4,
            atol=1e-6,
        )
        assert int(np.asarray(count).min()) == 2

    def test_vertex_counter_psum(self):
        r = _setup()
        mesh = make_mesh(8)
        layers, _ = _sharded_render(r, mesh, n_samples=1)
        r2 = _setup()
        r2.use_pallas = False
        r2.render(n_samples=1, max_depth=2)
        np.testing.assert_allclose(
            float(np.asarray(layers["n_path_vertices"])),
            float(np.asarray(r2.layers["n_path_vertices"])),
            rtol=1e-5,
        )

    def test_four_device_submesh(self):
        r = _setup()
        mesh = make_mesh(4)
        layers, count = _sharded_render(r, mesh, n_samples=1)
        assert np.isfinite(np.asarray(layers["beauty"])).all()


class TestSppSharding:
    def test_spp_sharded_equals_sequential(self):
        from fredholm_tpu.parallel.sharding import render_spp_sharded

        r = _setup()
        mesh = make_mesh(4)
        dev, static_params, dynamic = r.sharding_inputs(
            max_depth=2, use_pallas=False
        )
        layers, count = render_spp_sharded(
            mesh, dev, static_params, dynamic, n_per_device=2
        )
        # sequential single-device reference: 8 samples
        r2 = _setup()
        r2.use_pallas = False
        r2.render(n_samples=8, max_depth=2)
        np.testing.assert_allclose(
            np.asarray(layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4,
            atol=1e-6,
        )
        assert int(np.asarray(count)[0]) == 8


class TestSppChunking:
    def test_multi_step_counters_and_image(self):
        """5 samples = one 4-spp chunked dispatch + a 1-spp tail; counters
        must equal the single-device run (the psum joins only per-step
        DELTAS — psumming the running global would multiply it by n_dev
        every step)."""
        r = _setup()
        mesh = make_mesh(8)
        layers, count = _sharded_render(r, mesh, n_samples=5)

        r2 = _setup()
        r2.use_pallas = False
        r2.render(n_samples=5, max_depth=2)

        np.testing.assert_allclose(
            np.asarray(layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(np.asarray(layers["n_path_vertices"])),
            float(np.asarray(r2.layers["n_path_vertices"])),
            rtol=1e-6,
        )
        assert int(np.asarray(count).min()) == 5


class TestShardedClusteredTraversal:
    """The sharded path must compose with the PRODUCTION clustered
    traversal (supercluster Pallas sweep, interpret-mode on CPU) and with
    TLAS/BLAS instancing — not just the dense demo intersector."""

    def _terrain_renderer(self):
        from fredholm_tpu.scene.procedural import terrain

        r = Renderer(width=16, height=16)
        # clustered path off-TPU: the kernels run in the pallas
        # interpreter (same routing test_bvh uses)
        r.use_pallas = True
        r.set_scene(terrain(n=24, size=4.0))
        r.camera.origin = np.asarray([0.0, 3.0, 6.0], np.float32)
        r.camera.look_around(0.0, -0.3)
        r.camera._update_transform()
        r.set_bg_color((0.2, 0.3, 0.4))
        return r

    def _instanced_renderer(self):
        from test_instanced import _instanced_scene

        r = Renderer(width=16, height=16)
        r.set_scene(_instanced_scene())
        r.camera.origin = np.asarray([0.0, 2.0, 6.5], np.float32)
        r.camera.look_around(0.0, -0.1)
        r.camera._update_transform()
        r.set_bg_color((0.2, 0.3, 0.4))
        return r

    def _sharded(self, r, n_samples=1, max_depth=2):
        mesh = make_mesh(8)
        dev, sp, dyn = r.sharding_inputs(max_depth=max_depth)

        def shard_leaf(leaf):
            spec = P("tiles") if getattr(leaf, "ndim", 0) > 0 else P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        layers = jax.tree.map(shard_leaf, r.layers)
        count = jax.device_put(
            r.sample_count, NamedSharding(mesh, P("tiles"))
        )
        return render_progressive_sharded(
            mesh, dev, sp, dyn, layers, count, n_samples
        )

    def test_clustered_sharded_matches_single(self):
        r = self._terrain_renderer()
        cfg = r._config(1, 2)
        assert cfg.use_clustered and not cfg.use_dense
        layers, count = self._sharded(r)

        r2 = self._terrain_renderer()
        r2.render(n_samples=1, max_depth=2)
        np.testing.assert_allclose(
            np.asarray(layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4, atol=1e-6,
        )
        assert int(np.asarray(count).min()) == 1

    def test_instanced_sharded_matches_single(self):
        r = self._instanced_renderer()
        cfg = r._config(1, 2)
        assert cfg.use_clustered and not cfg.inst_identity
        layers, _ = self._sharded(r)

        r2 = self._instanced_renderer()
        r2.render(n_samples=1, max_depth=2)
        np.testing.assert_allclose(
            np.asarray(layers["beauty"]),
            np.asarray(r2.layers["beauty"]),
            rtol=1e-4, atol=1e-6,
        )
