import json
import os
import struct

import numpy as np
import pytest

from fredholm_tpu.scene.animation import update_animation
from fredholm_tpu.scene.gltf_loader import load_gltf
from fredholm_tpu.scene.loaders import load_model
from fredholm_tpu.scene.obj_loader import load_obj

OBJ_TEXT = """
mtllib test.mtl
o quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
o tri
v 2 0 0
v 3 0 0
v 2 1 0
usemtl glow
f 5 6 7
"""

MTL_TEXT = """
newmtl red
Kd 0.8 0.1 0.1
Ks 1 1 1
Pr 0.35
Pm 0.2
sheen 0.5
sheen_color 0.9 0.8 0.7
sheen_roughness 0.25
subsurface 0.1
subsurface_color 1 0.9 0.8
thin_walled 1
diffuse 0.7
diffuse_roughness 0.3
newmtl glow
Kd 0.5 0.5 0.5
Ke 4 3 2
"""


@pytest.fixture()
def obj_scene(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL_TEXT)
    p = tmp_path / "test.obj"
    p.write_text(OBJ_TEXT)
    return load_obj(str(p))


class TestObjLoader:
    def test_geometry(self, obj_scene):
        sc = obj_scene
        assert sc.n_faces() == 3  # quad triangulated + tri
        assert len(sc.submesh_offsets) == 2
        assert sc.submesh_n_faces == [2, 1]
        assert len(sc.vertices) == 7  # 4 deduped + 3

    def test_materials_arnold_extensions(self, obj_scene):
        m = obj_scene.materials[0]
        assert m.base_color == pytest.approx((0.8, 0.1, 0.1))
        assert m.specular_roughness == pytest.approx(0.35)
        assert m.metalness == pytest.approx(0.2)
        assert m.sheen == pytest.approx(0.5)
        assert m.sheen_color == pytest.approx((0.9, 0.8, 0.7))
        assert m.sheen_roughness == pytest.approx(0.25)
        assert m.subsurface == pytest.approx(0.1)
        assert m.thin_walled == pytest.approx(1.0)
        assert m.diffuse == pytest.approx(0.7)
        assert m.diffuse_roughness == pytest.approx(0.3)

    def test_emission(self, obj_scene):
        m = obj_scene.materials[1]
        assert m.emission == 1.0
        assert m.emission_color == pytest.approx((4.0, 3.0, 2.0))
        lights = obj_scene.emissive_faces()
        assert list(lights) == [2]

    def test_face_normal_fallback(self, obj_scene):
        # second object has no vn: face normal (0,0,1)
        n = obj_scene.normals[obj_scene.indices[2, 0]]
        np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)

    def test_default_texcoords(self, obj_scene):
        uvs = obj_scene.texcoords[obj_scene.indices[2]]
        np.testing.assert_allclose(uvs, [[0, 0], [1, 0], [0, 1]], atol=1e-6)

    def test_renders(self, obj_scene):
        from fredholm_tpu.renderer import Renderer

        r = Renderer(width=16, height=16)
        r.set_scene(obj_scene)
        r.set_bg_color((0.1, 0.1, 0.1))
        layers = r.render(n_samples=1, max_depth=2)
        assert np.isfinite(np.asarray(layers["beauty"])).all()


def make_gltf(tmp_path, animated=False):
    # a single triangle with TRS node + optional rotation animation
    positions = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
    )
    normals = np.asarray([[0, 0, 1]] * 3, np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2], np.uint16)

    blobs = [
        indices.tobytes(),
        positions.tobytes(),
        normals.tobytes(),
        uvs.tobytes(),
    ]
    anim_in = np.asarray([0.0, 1.0], np.float32)
    anim_out = np.asarray(
        [[0, 0, 0, 1], [0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)]],
        np.float32,
    )  # 0 -> 90deg rotation about y
    if animated:
        blobs += [anim_in.tobytes(), anim_out.tobytes()]

    offsets = []
    buf = b""
    for b in blobs:
        offsets.append(len(buf))
        buf += b + b"\x00" * ((4 - len(b) % 4) % 4)

    views = [
        {"buffer": 0, "byteOffset": offsets[i], "byteLength": len(blobs[i])}
        for i in range(len(blobs))
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5123, "count": 3, "type": "SCALAR"},
        {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 3, "componentType": 5126, "count": 3, "type": "VEC2"},
    ]
    if animated:
        accessors += [
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "VEC4"},
        ]

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {
                "mesh": 0,
                "translation": [2.0, 0.0, 0.0],
                "name": "tri",
            },
            {
                "camera": 0,
                "translation": [0.0, 0.0, 5.0],
                "name": "cam",
            },
        ],
        "cameras": [
            {"type": "perspective", "perspective": {"yfov": 1.0, "znear": 0.01}}
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": 1,
                            "NORMAL": 2,
                            "TEXCOORD_0": 3,
                        },
                        "indices": 0,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
                    "metallicFactor": 0.3,
                    "roughnessFactor": 0.6,
                },
                "extensions": {
                    "KHR_materials_clearcoat": {
                        "clearcoatFactor": 0.5,
                        "clearcoatRoughnessFactor": 0.2,
                    }
                },
                "emissiveFactor": [0.0, 0.0, 0.0],
            }
        ],
        "buffers": [{"byteLength": len(buf), "uri": "data.bin"}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if animated:
        doc["animations"] = [
            {
                "channels": [
                    {"sampler": 0, "target": {"node": 0, "path": "rotation"}}
                ],
                "samplers": [{"input": 4, "output": 5, "interpolation": "LINEAR"}],
            }
        ]
    (tmp_path / "data.bin").write_bytes(buf)
    p = tmp_path / "test.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestGltfLoader:
    def test_geometry_and_transform(self, tmp_path):
        sc = load_gltf(make_gltf(tmp_path))
        assert sc.n_faces() == 1
        assert len(sc.vertices) == 3
        # node translation applied as instance transform
        np.testing.assert_allclose(sc.transforms[0][:3, 3], [2, 0, 0], atol=1e-6)

    def test_material(self, tmp_path):
        sc = load_gltf(make_gltf(tmp_path))
        m = sc.materials[0]
        assert m.base_color == pytest.approx((0.2, 0.4, 0.8))
        assert m.metalness == pytest.approx(0.3)
        assert m.specular_roughness == pytest.approx(0.6)
        assert m.coat == pytest.approx(0.5)
        assert m.coat_roughness == pytest.approx(0.2)

    def test_texcoord_vflip(self, tmp_path):
        sc = load_gltf(make_gltf(tmp_path))
        np.testing.assert_allclose(
            sc.texcoords, [[0, 1], [1, 1], [0, 0]], atol=1e-6
        )

    def test_camera_node(self, tmp_path):
        sc = load_gltf(make_gltf(tmp_path))
        assert sc.has_camera_transform
        np.testing.assert_allclose(
            sc.camera_transform[:3, 3], [0, 0, 5], atol=1e-6
        )

    def test_animation_playback(self, tmp_path):
        sc = load_gltf(make_gltf(tmp_path, animated=True))
        update_animation(sc, 0.0)
        t0 = sc.transforms[0].copy()
        # NOTE: animation transform REPLACES the node TRS (scene.cpp:883-893)
        np.testing.assert_allclose(t0[:3, 3], [0, 0, 0], atol=1e-5)
        update_animation(sc, 0.999)
        t1 = sc.transforms[0]
        # ~90 degrees about y: x axis maps to -z
        np.testing.assert_allclose(t1[:3, 0], [0, 0, -1], atol=0.01)

    def test_renders_with_animation_refresh(self, tmp_path):
        from fredholm_tpu.renderer import Renderer

        r = Renderer(width=8, height=8)
        r.load_scene(make_gltf(tmp_path, animated=True))
        r.set_bg_color((0.2, 0.2, 0.2))
        r.render(n_samples=1, max_depth=2)
        r.set_time(0.5)
        layers = r.render(n_samples=1, max_depth=2)
        assert np.isfinite(np.asarray(layers["beauty"])).all()


class TestMergeScenes:
    def test_obj_plus_gltf_camera(self, tmp_path):
        (tmp_path / "test.mtl").write_text(MTL_TEXT)
        (tmp_path / "test.obj").write_text(OBJ_TEXT)
        a = load_model(str(tmp_path / "test.obj"))
        merged = load_model(make_gltf(tmp_path), into=a)
        assert merged.n_faces() == 4
        assert merged.has_camera_transform
        assert len(merged.materials) == 3
        # gltf faces reference the shifted instance id
        assert merged.instance_ids[-1] == 1
