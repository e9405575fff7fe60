import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.accel import bvh as bvh_mod
from fredholm_tpu.accel import traverse
from fredholm_tpu.scene.procedural import cornell_box, uv_sphere


def tri_soa(vertices, indices):
    v0 = vertices[indices[:, 0]]
    v1 = vertices[indices[:, 1]]
    v2 = vertices[indices[:, 2]]
    return v0, v1 - v0, v2 - v0


def make_dev(vertices, indices):
    v0, e1, e2 = tri_soa(vertices, indices)
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    b = bvh_mod.build_bvh(lo, hi)
    dev = traverse.build_device_bvh(b, v0, e1, e2)
    return b, dev, (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))


def random_rays(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestBVHBuild:
    def test_root_bounds_cover_scene(self):
        sc = cornell_box()
        b, _, _ = make_dev(sc.vertices, sc.indices)
        np.testing.assert_allclose(b.bounds_min[0], sc.vertices.min(0), atol=1e-5)
        np.testing.assert_allclose(b.bounds_max[0], sc.vertices.max(0), atol=1e-5)

    def test_leaves_partition_prims(self):
        sc = cornell_box()
        b, _, _ = make_dev(sc.vertices, sc.indices)
        covered = []
        for i in range(b.n_nodes):
            if b.left[i] < 0:
                s, c = b.leaf_start[i], b.leaf_count[i]
                covered.extend(b.prim_order[s : s + c].tolist())
        assert sorted(covered) == list(range(sc.n_faces()))

    def test_links_cover_all_orderings(self):
        sc = cornell_box()
        b, _, _ = make_dev(sc.vertices, sc.indices)
        n = b.n_nodes
        for o in range(6):
            # walking hit links from the root must visit every node once
            visited = set()
            stack = [0]
            cur = 0
            # simulate a "hit everything" traversal
            count = 0
            while cur != n and count <= n:
                visited.add(cur)
                cur = int(b.links[o, cur, 0]) if b.left[cur] >= 0 else int(
                    b.links[o, cur, 1]
                )
                count += 1
            assert len(visited) == n


class TestTraversalVsBruteForce:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_cornell_closest(self, seed):
        sc = cornell_box()
        _, dev, (v0, e1, e2) = make_dev(sc.vertices, sc.indices)
        o, d = random_rays(512, -0.9, 0.9, seed)
        got = traverse.intersect_closest(dev, o, d, 1e9)
        ref = traverse.brute_force_closest(v0, e1, e2, o, d, 1e9)
        np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
        hit = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=1e-4
        )
        # primitive ids may differ only when two tris share the hit point
        # (quad diagonals/edges), where tie-breaking order differs; the t
        # agreement above already guarantees the same surface
        agree = (np.asarray(got["prim"]) == np.asarray(ref["prim"]))[hit]
        assert agree.mean() > 0.97

    def test_sphere_closest(self):
        v, n, t, f = uv_sphere([0, 0, 0], 1.0, n_theta=24, n_phi=48)
        _, dev, (v0, e1, e2) = make_dev(v, f)
        # rays from outside toward the sphere
        rng = np.random.default_rng(3)
        o = rng.normal(size=(256, 3)).astype(np.float32)
        o = 3.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
        got = traverse.intersect_closest(dev, jnp.asarray(o), jnp.asarray(d), 1e9)
        ref = traverse.brute_force_closest(
            v0, e1, e2, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        assert np.asarray(got["hit"]).all()
        np.testing.assert_allclose(
            np.asarray(got["t"]), np.asarray(ref["t"]), rtol=1e-4
        )
        # hit distance should be about 2 (radius 1, origin at 3)
        assert abs(np.asarray(got["t"]).mean() - 2.0) < 0.05

    def test_any_hit_matches_closest(self):
        sc = cornell_box()
        _, dev, _ = make_dev(sc.vertices, sc.indices)
        o, d = random_rays(512, -0.9, 0.9, 5)
        closest = traverse.intersect_closest(dev, o, d, 1e9)
        occluded = traverse.intersect_any(dev, o, d, 1e9)
        np.testing.assert_array_equal(
            np.asarray(occluded), np.asarray(closest["hit"])
        )

    def test_any_hit_respects_tmax(self):
        sc = cornell_box()
        _, dev, _ = make_dev(sc.vertices, sc.indices)
        # ray pointing at the back wall from above the boxes: distance 1
        o = jnp.asarray([[0.0, 1.7, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        assert bool(traverse.intersect_any(dev, o, d, 2.0)[0])
        assert not bool(traverse.intersect_any(dev, o, d, 0.5)[0])

    def test_miss_outside(self):
        sc = cornell_box()
        _, dev, _ = make_dev(sc.vertices, sc.indices)
        o = jnp.asarray([[5.0, 5.0, 5.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        got = traverse.intersect_closest(dev, o, d, 1e9)
        assert not bool(got["hit"][0])
        assert int(got["prim"][0]) == -1

    def test_jit_compatible(self):
        import jax

        sc = cornell_box()
        _, dev, _ = make_dev(sc.vertices, sc.indices)
        o, d = random_rays(128, -0.9, 0.9, 7)

        @jax.jit
        def go(o, d):
            return traverse.intersect_closest(dev, o, d, 1e9)["t"]

        t1 = go(o, d)
        t2 = traverse.intersect_closest(dev, o, d, 1e9)["t"]
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


class TestRefit:
    def test_refit_after_translation(self):
        sc = cornell_box()
        v0, e1, e2 = tri_soa(sc.vertices, sc.indices)
        lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
        hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
        b = bvh_mod.build_bvh(lo, hi)
        shift = np.asarray([10.0, 0.0, 0.0], np.float32)
        v0s = v0 + shift
        los = np.minimum(np.minimum(v0s, v0s + e1), v0s + e2)
        his = np.maximum(np.maximum(v0s, v0s + e1), v0s + e2)
        bvh_mod.refit_bvh(b, los, his)
        np.testing.assert_allclose(
            b.bounds_min[0], sc.vertices.min(0) + shift, atol=1e-5
        )
        dev = traverse.build_device_bvh(b, v0s, e1, e2)
        o = jnp.asarray([[10.0, 1.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        assert bool(traverse.intersect_closest(dev, o, d, 1e9)["hit"][0])


def _sphere_blas(n_theta=32, n_phi=64):
    v, n, t, f = uv_sphere([0, 0, 0], 1.0, n_theta=n_theta, n_phi=n_phi)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    b = bvh_mod.build_bvh(lo, hi)
    from fredholm_tpu.accel.cluster import extract_hierarchy

    return extract_hierarchy(b, v0, e1, e2), v0, e1, e2


class TestClusteredTraversal:
    def test_clustered_matches_brute_force(self):
        """Three-level Pallas sweep (interpreter on CPU) vs brute force."""
        from fredholm_tpu.accel import pallas_clustered as pc
        from fredholm_tpu.accel.cluster import build_tlas

        h, v0, e1, e2 = _sphere_blas()
        assert h.n_clusters > 2  # actually multi-cluster
        dev_c = pc.prepare_clustered(build_tlas([h], [(0, np.eye(4))]))

        rng = np.random.default_rng(11)
        o = rng.normal(size=(256, 3)).astype(np.float32)
        o = 3.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
        got = pc.intersect_closest_clustered(
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
        occ = pc.intersect_any_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref["hit"]))

    def test_instanced_traversal_matches_flattened(self):
        """Two transformed instances of one BLAS (shared geometry) must hit
        exactly like the flattened world-space triangle soup — the IAS
        contract (renderer.h:498-552)."""
        from fredholm_tpu.accel import pallas_clustered as pc
        from fredholm_tpu.accel.cluster import build_tlas

        h, v0, e1, e2 = _sphere_blas(n_theta=16, n_phi=32)
        m_a = np.eye(4, dtype=np.float32)
        m_a[:3, 3] = [-1.6, 0.0, 0.0]
        m_b = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
        m_b[:3, 3] = [1.6, 0.3, 0.0]
        tlas = build_tlas([h], [(0, m_a), (0, m_b)])
        assert not tlas.inst_identity
        dev_c = pc.prepare_clustered(tlas)

        # flattened world-space reference soup
        def xf(m, v):
            return v @ m[:3, :3].T + m[:3, 3]

        w_v0 = np.concatenate([xf(m_a, v0), xf(m_b, v0)])
        w_e1 = np.concatenate([e1 @ m_a[:3, :3].T, e1 @ m_b[:3, :3].T])
        w_e2 = np.concatenate([e2 @ m_a[:3, :3].T, e2 @ m_b[:3, :3].T])

        rng = np.random.default_rng(3)
        o = rng.normal(size=(192, 3)).astype(np.float32)
        o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
        got = pc.intersect_closest_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9, identity=False
        )
        ref = traverse.brute_force_closest(
            jnp.asarray(w_v0), jnp.asarray(w_e1), jnp.asarray(w_e2),
            jnp.asarray(o), jnp.asarray(d), 1e9,
        )
        np.testing.assert_array_equal(
            np.asarray(got["hit"]), np.asarray(ref["hit"])
        )
        np.testing.assert_allclose(
            np.asarray(got["t"]), np.asarray(ref["t"]), rtol=2e-4, atol=1e-5
        )
        # the hit instance follows from which flattened range the ref hit
        f_per = v0.shape[0]
        want_inst = (np.asarray(ref["prim"]) >= f_per).astype(np.int32)
        hitm = np.asarray(ref["hit"])
        np.testing.assert_array_equal(
            np.asarray(got["inst"])[hitm], want_inst[hitm]
        )
        # prim ids are BLAS-local (shared across instances)
        np.testing.assert_array_equal(
            np.asarray(got["prim"])[hitm],
            (np.asarray(ref["prim"]) % f_per)[hitm],
        )
        occ = pc.intersect_any_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9, identity=False
        )
        np.testing.assert_array_equal(np.asarray(occ), hitm)


class TestHierarchyRefit:
    def test_refit_matches_full_rebuild(self):
        """refit_hierarchy (fixed cut topology, animation path) must equal
        a from-scratch extract_hierarchy on the moved geometry."""
        import numpy as np

        from fredholm_tpu.accel.bvh import build_bvh, refit_bvh
        from fredholm_tpu.accel.cluster import (
            extract_hierarchy,
            refit_hierarchy,
        )
        from fredholm_tpu.scene.procedural import terrain

        sc = terrain(n=24, size=4.0)
        v = sc.vertices[sc.indices]
        v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
        bvh = build_bvh(v.min(1), v.max(1), thread=False)
        h0 = extract_hierarchy(bvh, v0, e1, e2)

        # move the geometry (same topology), refit
        v2 = v * 1.01 + np.asarray([0.1, -0.05, 0.2], np.float32)
        w0, f1, f2 = v2[:, 0], v2[:, 1] - v2[:, 0], v2[:, 2] - v2[:, 0]
        refit_bvh(bvh, v2.min(1), v2.max(1))
        got = refit_hierarchy(h0, bvh, w0, f1, f2)
        want = extract_hierarchy(bvh, w0, f1, f2)

        np.testing.assert_array_equal(got.sc_aabb, want.sc_aabb)
        np.testing.assert_array_equal(got.sc_mcount, want.sc_mcount)
        np.testing.assert_array_equal(got.sc_order, want.sc_order)
        np.testing.assert_array_equal(got.sc_key, want.sc_key)
        np.testing.assert_array_equal(got.cl_meta, want.cl_meta)
        np.testing.assert_array_equal(got.blocks, want.blocks)
        np.testing.assert_array_equal(got.root_lo, want.root_lo)
        np.testing.assert_array_equal(got.root_hi, want.root_hi)


class TestSubWindowGating:
    """Sub-window sweep gating (FREDHOLM_TRAV_SUBROWS, round-5 lever) is
    a pure scheduling change: per-lane merges only read their own rows,
    so results must be BIT-identical to full-tile sweeps."""

    def test_bit_identical_to_full_tile(self, monkeypatch):
        import jax.numpy as jnp

        from fredholm_tpu.accel import pallas_clustered as pc
        from fredholm_tpu.accel.cluster import build_tlas

        h, v0, e1, e2 = _sphere_blas()
        dev_c = pc.prepare_clustered(build_tlas([h], [(0, np.eye(4))]))
        rng = np.random.default_rng(13)
        n = 4096  # two [16,128] tiles
        o = rng.normal(size=(n, 3)).astype(np.float32)
        o = 1.6 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tm = np.where(rng.random(n) < 0.85, 1e9, -1.0).astype(np.float32)

        assert pc._SUBROWS == 8  # default on
        a = pc.intersect_closest_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        occ_a = pc.intersect_any_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        )
        try:
            monkeypatch.setattr(pc, "_SUBROWS", 0)
            pc._call.clear_cache()  # same static key, different closure
            b = pc.intersect_closest_clustered(
                dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
            )
            occ_b = pc.intersect_any_clustered(
                dev_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
            )
            for k in ("hit", "prim", "t", "u", "v"):
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k
                )
            np.testing.assert_array_equal(
                np.asarray(occ_a), np.asarray(occ_b)
            )
        finally:
            monkeypatch.undo()
            pc._call.clear_cache()
