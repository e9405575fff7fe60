"""End-to-end instanced scenes: two-level TLAS/BLAS with shared geometry.

The IAS contract (renderer.h:434-552): an InstancedScene must render the
same image as the equivalent flattened Scene, with device geometry
O(unique geometry) and instance motion an O(I) update.
"""

import numpy as np
import pytest

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import _merge_mesh, _quad, uv_sphere
from fredholm_tpu.scene.types import (
    InstancedScene,
    Material,
    MeshInstance,
    Scene,
)


def _translate(x, y, z, s=1.0):
    m = np.diag([s, s, s, 1.0]).astype(np.float32)
    m[:3, 3] = [x, y, z]
    return m


def _base_scene():
    """Submesh 0: floor + overhead emissive quad. Submesh 1: unit sphere
    at the origin."""
    mats = [
        Material(base_color=(0.7, 0.7, 0.7)),
        Material(base_color=(0.8, 0.8, 0.8), emission=1.0,
                 emission_color=(8.0, 8.0, 8.0)),
        Material(base_color=(0.8, 0.2, 0.2), specular=0.3,
                 specular_roughness=0.4),
    ]
    s = 6.0
    floor = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    lq = 1.2
    light = _quad([-lq, 4.0, lq], [-lq, 4.0, -lq], [lq, 4.0, -lq],
                  [lq, 4.0, lq])
    sphere = uv_sphere([0.0, 0.0, 0.0], 1.0, n_theta=12, n_phi=24)

    parts = [floor, light, sphere]
    mids = [
        np.zeros(len(floor[3]), np.int32),
        np.full(len(light[3]), 1, np.int32),
        np.full(len(sphere[3]), 2, np.int32),
    ]
    verts, norms, uvs, idxs, mid = _merge_mesh(
        [p[0] for p in parts], [p[1] for p in parts],
        [p[2] for p in parts], [p[3] for p in parts], mids,
    )
    n0 = len(floor[3]) + len(light[3])
    n1 = len(sphere[3])
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mid,
        instance_ids=np.zeros((len(idxs),), np.int32),
        materials=mats,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0, n0],
        submesh_n_faces=[n0, n1],
    )


SPHERE_XFORMS = [
    _translate(-1.6, 1.0, 0.0),
    _translate(1.6, 1.0, 0.5, s=0.6),
]


def _instanced_scene():
    return InstancedScene(
        base=_base_scene(),
        instances=[MeshInstance(0, np.eye(4, dtype=np.float32))]
        + [MeshInstance(1, m) for m in SPHERE_XFORMS],
    )


def _flattened_scene():
    """Same world: spheres pre-transformed into world-space vertices."""
    base = _base_scene()
    n0 = base.submesh_n_faces[0]
    # static part (submesh 0 faces reference the original vertex pool)
    parts_v, parts_n, parts_uv, parts_f, parts_m = [], [], [], [], []
    parts_v.append(base.vertices)
    parts_n.append(base.normals)
    parts_uv.append(base.texcoords)
    parts_f.append(base.indices[:n0])
    parts_m.append(base.material_ids[:n0])
    sph_f = base.indices[n0:]
    for m in SPHERE_XFORMS:
        r, t = m[:3, :3], m[:3, 3]
        nrm = np.linalg.inv(m[:3, :3]).T
        wv = base.vertices @ r.T + t
        wn = base.normals @ nrm.T
        wn = wn / np.maximum(
            np.linalg.norm(wn, axis=-1, keepdims=True), 1e-12
        )
        parts_v.append(wv.astype(np.float32))
        parts_n.append(wn.astype(np.float32))
        parts_uv.append(base.texcoords)
        parts_f.append(sph_f)
        parts_m.append(base.material_ids[n0:])
    verts, norms, uvs, idxs, mid = _merge_mesh(
        parts_v, parts_n, parts_uv, parts_f, parts_m
    )
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mid,
        instance_ids=np.zeros((len(idxs),), np.int32),
        materials=base.materials,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[len(idxs)],
    )


def _render(scene, spp=4, use_fused=True):
    r = Renderer(width=64, height=64)
    r.use_fused = use_fused
    r.set_scene(scene)
    r.camera.origin = np.asarray([0.0, 2.0, 6.5], np.float32)
    r.camera.look_around(0.0, -0.1)
    r.camera._update_transform()
    layers = r.render(n_samples=spp, max_depth=4)
    return r, np.asarray(layers["beauty"])


class TestInstancedRender:
    @pytest.mark.parametrize("use_fused", [True, False])
    def test_matches_flattened(self, use_fused):
        _, img_i = _render(_instanced_scene(), use_fused=use_fused)
        _, img_f = _render(_flattened_scene(), use_fused=use_fused)
        assert np.isfinite(img_i).all()
        assert img_i.mean() > 1e-3  # non-black
        # same world, same sampler streams; differences are fp-only
        # (shade-time vs host-baked transforms)
        err = np.abs(img_i - img_f).mean() / max(img_f.mean(), 1e-9)
        assert err < 2e-2, f"relative L1 {err}"

    def test_memory_is_o_unique_geometry(self):
        r, _ = _render(_instanced_scene(), spp=1)
        base = _base_scene()
        n_unique = base.n_faces()
        blocks = r._dev["clusters"]["blocks"]
        # blocks are padded to 256-triangle clusters; even so, three
        # instances of the sphere must NOT triple the geometry
        assert blocks.shape[1] <= 4 * 256 * (n_unique // 64 + 4)
        assert r._dev["face_verts"].shape[0] == n_unique
        assert r._dev["_n_instances"] == 3

    def test_move_instances_matches_rebuild(self):
        moved = [
            np.eye(4, dtype=np.float32),
            _translate(-0.5, 1.4, -0.5),
            _translate(2.2, 0.8, 0.3, s=0.45),
        ]
        r, _ = _render(_instanced_scene(), spp=1)
        r.set_instance_transforms(moved)
        r.render(n_samples=2, max_depth=4)
        img_moved = np.asarray(r.layers["beauty"])

        fresh = InstancedScene(
            base=_base_scene(),
            instances=[
                MeshInstance(0, moved[0]),
                MeshInstance(1, moved[1]),
                MeshInstance(1, moved[2]),
            ],
        )
        r2 = Renderer(width=64, height=64)
        r2.set_scene(fresh)
        r2.camera.origin = np.asarray([0.0, 2.0, 6.5], np.float32)
        r2.camera.look_around(0.0, -0.1)
        r2.camera._update_transform()
        r2.render(n_samples=2, max_depth=4)
        img_fresh = np.asarray(r2.layers["beauty"])
        np.testing.assert_allclose(img_moved, img_fresh, atol=1e-5)

    def test_instanced_emissive_light(self):
        """An emissive submesh instanced with a TRANSLATED transform:
        NEE must sample the light at its world position."""
        base = _base_scene()
        isc = InstancedScene(
            base=base,
            # place the floor+light submesh shifted up; sphere at origin
            instances=[
                MeshInstance(0, _translate(0.0, 0.5, 0.0)),
                MeshInstance(1, _translate(0.0, 1.5, 0.0)),
            ],
        )
        r, img = _render(isc, spp=2)
        assert np.isfinite(img).all()
        assert img.mean() > 1e-3
        # light SoA reflects the translated emissive quad (y = 4 + 0.5)
        lv = np.asarray(r._dev["light_verts"])
        assert np.allclose(lv[..., 1], 4.5, atol=1e-5)


class TestInstancedTiles:
    """instanced_tiles: the >=10M-triangle scene-class builder (San
    Miguel analog) at test scale."""

    def test_small_grid_renders(self):
        from fredholm_tpu.scene.procedural import instanced_tiles

        isc = instanced_tiles(grid=2, tile_n=24, size=4.0)
        assert len(isc.instances) == 4
        n_unique = isc.base.n_faces()
        assert n_unique == 2 * 24 * 24
        r = Renderer(width=32, height=32)
        r.set_scene(isc)
        r.camera.origin = np.asarray([0.0, 3.0, 7.0], np.float32)
        r.camera.look_around(0.0, -0.3)
        r.camera._update_transform()
        r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3],
                                angle=0.5)
        r.set_bg_color((0.4, 0.5, 0.7))
        layers = r.render(n_samples=2, max_depth=3)
        img = np.asarray(layers["beauty"])
        assert np.isfinite(img).all()
        assert img.mean() > 1e-3
        # device memory O(unique): 4 instances share one BLAS
        assert r._dev["face_verts"].shape[0] == n_unique
        assert r._dev["_n_instances"] == 4

    def test_full_scale_counts(self):
        """Default parameters really reach the 10M-triangle class
        (geometry counts only — no render; the real-chip render is
        bench.py metric 5)."""
        from fredholm_tpu.scene.procedural import instanced_tiles

        isc = instanced_tiles()
        n_scene = isc.base.n_faces() * len(isc.instances)
        assert n_scene >= 10_000_000
        assert len(isc.instances) == 16
