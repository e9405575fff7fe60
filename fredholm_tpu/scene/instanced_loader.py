"""glTF -> InstancedScene: file-loaded two-level instancing.

The reference builds an IAS whose OptixInstances are the glTF scene's
node transforms over per-mesh GASes (renderer.h:498-552 + scene.cpp node
walk): N nodes referencing one mesh share one GAS. `load_gltf` flattens
that (each node-with-mesh becomes its own submesh, duplicating shared
geometry); this loader recovers the shared structure — one base-scene
submesh per UNIQUE glTF mesh, one MeshInstance per node — so device
memory is O(unique geometry) and instance motion is an O(I) update.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from .gltf_loader import load_gltf, update_transform
from .types import InstancedScene, MeshInstance, Scene


def _load_doc(path: str) -> dict:
    """The glTF JSON document (header-only re-parse; no buffer loads)."""
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            magic, _version, _length = struct.unpack("<III", f.read(12))
            assert magic == 0x46546C67, "not a glb file"
            json_len, _json_type = struct.unpack("<II", f.read(8))
            return json.loads(f.read(json_len))
    with open(path) as f:
        return json.load(f)


def _submesh_mesh_ids(doc: dict):
    """glTF mesh id per flat-scene submesh, in the exact DFS order
    gltf_loader.load_gltf creates submeshes."""
    order = []

    def walk(ni: int):
        node = doc["nodes"][ni]
        if "mesh" in node:
            order.append(node["mesh"])
        for c in node.get("children", []):
            walk(c)

    scene_doc = doc.get("scenes", [{}])[doc.get("scene", 0)]
    for ni in scene_doc.get("nodes", []):
        walk(ni)
    return order


def load_gltf_instanced(path: str) -> InstancedScene:
    """Load a .gltf/.glb as an InstancedScene (shared-BLAS instancing)."""
    sc = load_gltf(path)
    update_transform(sc)
    order = _submesh_mesh_ids(_load_doc(path))
    assert len(order) == len(sc.submesh_offsets), (
        "node walk out of sync with load_gltf submesh order"
    )

    # keep the FIRST flat submesh of each unique glTF mesh
    first: dict = {}
    keep = []
    for sid, mid in enumerate(order):
        if mid not in first:
            first[mid] = len(keep)
            keep.append(sid)

    idxs, mids = [], []
    offsets, n_faces = [], []
    off = 0
    for s in keep:
        a = sc.submesh_offsets[s]
        b = a + sc.submesh_n_faces[s]
        idxs.append(sc.indices[a:b])
        mids.append(sc.material_ids[a:b])
        offsets.append(off)
        n_faces.append(b - a)
        off += b - a
    idx_cat = (
        np.concatenate(idxs) if idxs else np.zeros((0, 3), np.int32)
    )
    base = Scene(
        vertices=sc.vertices,
        normals=sc.normals,
        texcoords=sc.texcoords,
        indices=idx_cat,
        material_ids=(
            np.concatenate(mids) if mids else np.zeros((0,), np.int32)
        ),
        instance_ids=np.zeros((len(idx_cat),), np.int32),
        materials=sc.materials,
        textures=sc.textures,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=offsets,
        submesh_n_faces=n_faces,
        has_camera_transform=sc.has_camera_transform,
        camera_transform=sc.camera_transform,
        nodes=sc.nodes,
        animations=sc.animations,
    )
    instances = [
        MeshInstance(
            first[mid], np.asarray(sc.transforms[sid], np.float32)
        )
        for sid, mid in enumerate(order)
    ]
    return InstancedScene(base=base, instances=instances)
