"""Ray-resident geometry-streamed traversal (experimental/pallas_resident.py)
vs the ordered clustered kernel and brute force.

The resident kernel must return IDENTICAL hits to the ordered kernel on
identity scenes — same MT math, same per-lane predication, different
visit order (ties broken by sweep order are excluded by construction:
both kernels take the strictly-closer triangle, and the test meshes have
no exactly-coplanar duplicate hits along the sampled rays)."""
import numpy as np
import pytest

import jax.numpy as jnp

from fredholm_tpu.accel import pallas_clustered as pc
from fredholm_tpu.experimental import pallas_resident as pr
from fredholm_tpu.accel import traverse
from fredholm_tpu.accel.cluster import build_tlas

from test_bvh import _sphere_blas


@pytest.fixture(scope="module")
def sphere_dev():
    h, v0, e1, e2 = _sphere_blas()
    tlas = build_tlas([h], [(0, np.eye(4))])
    dev_c = pc.prepare_clustered(tlas)
    # default build omits the resident table (the experiment is env-gated
    # so production scene builds/refits pay nothing for it)
    assert "res_meta" not in dev_c
    dev_c = {**dev_c, **pr.prepare_resident(tlas)}
    return dev_c, v0, e1, e2


def _rays(n, seed=11, radius=1.5):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = radius * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestResidentKernel:
    def test_matches_brute_force(self, sphere_dev):
        dev_c, v0, e1, e2 = sphere_dev
        o, d = _rays(256)
        got = pr.intersect_closest_resident(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        ref = traverse.brute_force_closest(
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(o), jnp.asarray(d), 1e9,
        )
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), np.asarray(ref["hit"])
        )
        np.testing.assert_allclose(
            np.asarray(got["t"]), np.asarray(ref["t"]), rtol=1e-4
        )

    def test_matches_ordered_kernel_exactly(self, sphere_dev):
        """Same hits, t, u, v, prim as the ordered kernel, including dead
        lanes (tmax < 0) and any-hit occlusion."""
        dev_c, *_ = sphere_dev
        o, d = _rays(1024, seed=3)
        rng = np.random.default_rng(7)
        tm = np.where(rng.random(1024) < 0.8, 1e9, -1.0).astype(np.float32)
        a = pc.intersect_closest_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        b = pr.intersect_closest_resident(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        for k in ("hit", "prim", "t", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )
        occ_a = pc.intersect_any_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        occ_b = pr.intersect_any_resident(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))

    def test_multi_rayblock(self, sphere_dev, monkeypatch):
        """Dispatches larger than one resident super-block split over the
        grid's rayblock dimension; results must be block-independent."""
        dev_c, *_ = sphere_dev
        monkeypatch.setattr(pr, "R_SUB", 16)
        n = 16 * 128 + 640  # one full block + a padded tail block
        o, d = _rays(n, seed=5)
        a = pc.intersect_closest_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        b = pr.intersect_closest_resident(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        for k in ("hit", "prim", "t"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


class TestPartialPage:
    def test_cluster_count_not_page_multiple(self):
        """k_total % P_CL != 0: the last page's triangle-block DMA must
        stay in bounds (prepare_resident pads a blocks copy). Regression
        for a real OOB HBM read — interpret mode clamps the slice start,
        silently shifting the last page's geometry."""
        found = None
        for n_phi in (10, 12, 14, 18, 22, 26, 30, 34):
            h, v0, e1, e2 = _sphere_blas(n_theta=16, n_phi=n_phi)
            k = h.n_clusters
            if k % pr.P_CL:
                found = (h, v0, e1, e2, k)
                break
        assert found is not None, "no mesh size gave k % P_CL != 0"
        h, v0, e1, e2, k = found
        tlas = build_tlas([h], [(0, np.eye(4))])
        dev_c = {**pc.prepare_clustered(tlas), **pr.prepare_resident(tlas)}
        assert "res_blocks" in dev_c
        o, d = _rays(512, seed=21)
        got = pr.intersect_closest_resident(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        ref = traverse.brute_force_closest(
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(o), jnp.asarray(d), 1e9,
        )
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), np.asarray(ref["hit"])
        )
        np.testing.assert_allclose(
            np.asarray(got["t"]), np.asarray(ref["t"]), rtol=1e-4
        )


class TestResidentRouting:
    def test_incoherent_dispatch_routes_to_resident(self, sphere_dev,
                                                    monkeypatch):
        """With FREDHOLM_TRAV_RESIDENT=1, d>0 dispatches (coherent=False)
        on identity clustered scenes take the resident kernel and return
        the same hits as the ordered kernel."""
        from fredholm_tpu.integrator import pt

        dev_c, *_ = sphere_dev
        dev = {
            "use_dense": False,
            "use_clustered": True,
            "clusters": dev_c,
            "inst_identity": True,
        }
        monkeypatch.setattr(pt, "_RESIDENT", "1")
        assert pt._use_resident(dev, coherent=False)
        assert not pt._use_resident(dev, coherent=True)
        o, d = _rays(512, seed=9)
        a = pt._trace_closest_raw(
            dev, jnp.asarray(o), jnp.asarray(d), 1e9, coherent=True
        )
        b = pt._trace_closest_raw(
            dev, jnp.asarray(o), jnp.asarray(d), 1e9, coherent=False
        )
        for k in ("hit", "prim", "t"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )
        monkeypatch.setattr(pt, "_RESIDENT", "0")
        assert not pt._use_resident(dev, coherent=False)


class TestRootClamp:
    def test_moved_instance_beyond_original_root_box(self, sphere_dev):
        """update_tlas_instances must refresh root_aabb: hits on geometry
        moved far outside the original union box would otherwise be
        clamped away (best_t <= stale root exit)."""
        from fredholm_tpu.accel.cluster import (
            build_tlas, update_tlas_instances,
        )
        from test_bvh import _sphere_blas

        h, *_ = _sphere_blas()
        tlas = build_tlas([h], [(0, np.eye(4))])
        dev_c = pc.prepare_clustered(tlas)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [50.0, 0.0, 0.0]  # far outside the original box
        dev_m = update_tlas_instances(dev_c, [h], [(0, m)])
        o = np.tile(np.array([[44.0, 0.0, 0.0]], np.float32), (256, 1))
        d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (256, 1))
        got = pc.intersect_closest_clustered(
            dev_m, jnp.asarray(o), jnp.asarray(d), 1e9, identity=False
        )
        assert bool(np.asarray(got["hit"]).all())
        np.testing.assert_allclose(
            np.asarray(got["t"]), 5.0, atol=1e-3
        )
