import jax.numpy as jnp
import numpy as np
import pytest

from fredholm_tpu.core import vecmath as vm


def rand_vec(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))


class TestBasics:
    def test_dot_cross_length(self):
        a = rand_vec(64, 1)
        b = rand_vec(64, 2)
        np.testing.assert_allclose(
            np.asarray(vm.dot(a, b)), np.sum(np.asarray(a) * np.asarray(b), -1),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(vm.cross(a, b)), np.cross(np.asarray(a), np.asarray(b)),
            rtol=1e-5, atol=1e-6,
        )

    def test_normalize(self):
        a = rand_vec(64, 3)
        n = vm.normalize(a)
        np.testing.assert_allclose(np.asarray(vm.length(n)), 1.0, rtol=1e-5)


class TestFrames:
    def test_orthonormal_basis(self):
        n = vm.normalize(rand_vec(256, 4))
        t, b = vm.orthonormal_basis(n)
        np.testing.assert_allclose(np.asarray(vm.dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.dot(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.length(t)), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(vm.length(b)), 1.0, rtol=1e-5)

    def test_world_local_roundtrip(self):
        n = vm.normalize(rand_vec(128, 5))
        t, b = vm.orthonormal_basis(n)
        v = vm.normalize(rand_vec(128, 6))
        local = vm.world_to_local(v, t, n, b)
        back = vm.local_to_world(local, t, n, b)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_local_y_is_normal(self):
        n = vm.normalize(rand_vec(128, 7))
        t, b = vm.orthonormal_basis(n)
        local_n = vm.world_to_local(n, t, n, b)
        np.testing.assert_allclose(
            np.asarray(local_n), np.tile([0.0, 1.0, 0.0], (128, 1)), atol=1e-5
        )


class TestReflectRefract:
    def test_reflect(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        w = vm.normalize(jnp.asarray([[1.0, 1.0, 0.0]]))
        r = vm.reflect(w, n)
        np.testing.assert_allclose(
            np.asarray(r)[0], np.asarray(vm.normalize(jnp.asarray([[-1.0, 1.0, 0.0]])))[0],
            atol=1e-6,
        )

    def test_refract_snell(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        w = vm.normalize(jnp.asarray([[0.5, 1.0, 0.0]]))
        wt, ok = vm.refract(w, n, jnp.asarray([1.0]), jnp.asarray([1.5]))
        assert bool(ok[0])
        # Snell: sin_t = sin_i * ni/nt
        sin_i = float(vm.length(w * jnp.asarray([[1.0, 0.0, 1.0]]))[0])
        sin_t = float(vm.length(wt * jnp.asarray([[1.0, 0.0, 1.0]]))[0])
        np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-5)

    def test_total_internal_reflection(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        w = vm.normalize(jnp.asarray([[10.0, 1.0, 0.0]]))  # grazing
        _, ok = vm.refract(w, n, jnp.asarray([1.5]), jnp.asarray([1.0]))
        assert not bool(ok[0])


class TestTransforms:
    def test_transform_position_identity(self):
        m = jnp.eye(3, 4)[None]
        p = rand_vec(8, 8)
        np.testing.assert_allclose(
            np.asarray(vm.transform_position(m, p)), np.asarray(p), atol=1e-6
        )

    def test_transform_translation(self):
        m = np.eye(3, 4, dtype=np.float32)
        m[:, 3] = [1.0, 2.0, 3.0]
        p = rand_vec(8, 9)
        out = vm.transform_position(jnp.asarray(m)[None], p)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(p) + np.asarray([1.0, 2.0, 3.0]), atol=1e-6
        )
        # directions ignore translation
        out_d = vm.transform_direction(jnp.asarray(m)[None], p)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(p), atol=1e-6)

    def test_transform_normal_inverse_transpose(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(3, 3)).astype(np.float32)
        a = a + 3.0 * np.eye(3, dtype=np.float32)
        m = np.concatenate([a, np.zeros((3, 1), np.float32)], axis=1)
        m_inv = np.concatenate(
            [np.linalg.inv(a), np.zeros((3, 1), np.float32)], axis=1
        )
        n = np.asarray(vm.normalize(rand_vec(16, 10)))
        # tangent stays tangent after transform
        t, _ = vm.orthonormal_basis(jnp.asarray(n))
        n_w = vm.transform_normal(jnp.asarray(m_inv)[None], jnp.asarray(n))
        t_w = vm.transform_direction(jnp.asarray(m)[None], t)
        dots = np.asarray(vm.dot(n_w, t_w))
        np.testing.assert_allclose(dots, 0.0, atol=1e-4)


class TestRayOffset:
    def test_offset_moves_along_normal(self):
        p = jnp.asarray([[1.0, 2.0, -3.0], [1e-5, 0.0, 1e5]])
        n = vm.normalize(jnp.asarray([[0.0, 1.0, 0.0], [1.0, 1.0, 0.0]]))
        q = vm.ray_origin_offset(p, n)
        d = np.asarray(q) - np.asarray(p)
        # offset is tiny but non-negative along the normal
        assert np.all(np.sum(d * np.asarray(n), -1) >= 0.0)
        assert np.all(np.abs(d) < 1e-2)
