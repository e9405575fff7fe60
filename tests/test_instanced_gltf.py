"""glTF -> InstancedScene loader: shared meshes become shared BLASes."""

import json

import numpy as np

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.instanced_loader import load_gltf_instanced


def _make_shared_mesh_gltf(tmp_path, animated=False):
    """One triangle mesh referenced by THREE nodes (two transformed),
    plus a second unique mesh (a shifted triangle). With animated=True,
    node 1 gets a 0->1s translation animation [2,0,0] -> [2,3,0]."""
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.asarray([[0, 0, 1]] * 3, np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2], np.uint16)

    blobs = [indices.tobytes(), positions.tobytes(), normals.tobytes(),
             uvs.tobytes()]
    anim_in = np.asarray([0.0, 1.0], np.float32)
    anim_out = np.asarray([[2, 0, 0], [2, 3, 0]], np.float32)
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
        {"bufferView": 0, "componentType": 5123, "count": 3,
         "type": "SCALAR"},
        {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 3, "componentType": 5126, "count": 3, "type": "VEC2"},
    ]
    prim = {
        "attributes": {"POSITION": 1, "NORMAL": 2, "TEXCOORD_0": 3},
        "indices": 0,
        "material": 0,
    }
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2, 3]}],
        "nodes": [
            {"mesh": 0},
            {"mesh": 0, "translation": [2.0, 0.0, 0.0]},
            {"mesh": 0, "translation": [0.0, 2.0, 0.0],
             "scale": [0.5, 0.5, 0.5]},
            {"mesh": 1, "translation": [-2.0, 0.0, 0.0]},
        ],
        "meshes": [{"primitives": [prim]}, {"primitives": [dict(prim)]}],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.7, 0.5, 0.3, 1.0],
                "roughnessFactor": 0.6,
            }}
        ],
        "buffers": [{"byteLength": len(buf), "uri": "data.bin"}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if animated:
        accessors += [
            {"bufferView": 4, "componentType": 5126, "count": 2,
             "type": "SCALAR", "min": [0.0], "max": [1.0]},
            {"bufferView": 5, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ]
        doc["animations"] = [
            {
                "channels": [
                    {"sampler": 0,
                     "target": {"node": 1, "path": "translation"}}
                ],
                "samplers": [
                    {"input": 4, "output": 5, "interpolation": "LINEAR"}
                ],
            }
        ]
    (tmp_path / "data.bin").write_bytes(buf)
    p = tmp_path / "shared.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestGltfInstanced:
    def test_shared_meshes_dedupe(self, tmp_path):
        isc = load_gltf_instanced(_make_shared_mesh_gltf(tmp_path))
        assert isc.is_valid()
        # 4 nodes -> 4 instances; 2 unique meshes -> 2 base submeshes
        assert len(isc.instances) == 4
        assert len(isc.base.submesh_offsets) == 2
        # base holds only the unique faces (1 tri per mesh)
        assert isc.base.n_faces() == 2
        # instances of mesh 0 share submesh 0
        subs = [i.submesh for i in isc.instances]
        assert subs == [0, 0, 0, 1]
        np.testing.assert_allclose(
            isc.instances[1].transform[:3, 3], [2.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(
            np.diag(isc.instances[2].transform)[:3], [0.5, 0.5, 0.5]
        )

    def test_renders(self, tmp_path):
        isc = load_gltf_instanced(_make_shared_mesh_gltf(tmp_path))
        r = Renderer(width=64, height=64)
        r.set_scene(isc)
        r.camera.origin = np.asarray([0.0, 0.6, 4.0], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.3, 0.3, 0.35))
        layers = r.render(n_samples=2, max_depth=2)
        b = np.asarray(layers["beauty"])
        assert np.isfinite(b).all()
        assert float(b.mean()) > 0.0
        # device geometry is O(unique): 2 faces, not 4
        assert r._dev["n_faces"] == 2
        assert r._dev["_n_instances"] == 4

    def test_set_time_is_o_instances(self, tmp_path):
        """Animated instanced scene: set_time routes through the O(I)
        instance-transform update (renderer.h:614-640 IAS rebuild
        analog) — device geometry buffers must be reused, not rebuilt,
        and the animated node's instance must move."""
        isc = load_gltf_instanced(
            _make_shared_mesh_gltf(tmp_path, animated=True)
        )
        r = Renderer(width=32, height=32)
        r.set_scene(isc)
        r.camera.origin = np.asarray([0.0, 0.6, 4.0], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.3, 0.3, 0.35))
        r.render(n_samples=1, max_depth=2)

        geom_before = r._dev["face_verts"]
        r.set_time(0.5)
        # geometry untouched (same device buffer object), transforms moved
        assert r._dev["face_verts"] is geom_before
        np.testing.assert_allclose(
            r.scene.instances[1].transform[:3, 3], [2.0, 1.5, 0.0],
            atol=1e-5,
        )
        # un-animated instances keep their static node transforms
        np.testing.assert_allclose(
            r.scene.instances[3].transform[:3, 3], [-2.0, 0.0, 0.0],
            atol=1e-6,
        )
        layers = r.render(n_samples=1, max_depth=2)
        assert np.isfinite(np.asarray(layers["beauty"])).all()
