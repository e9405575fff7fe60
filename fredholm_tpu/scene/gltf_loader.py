"""glTF 2.0 loader (hand-rolled JSON + buffer reader, no tinygltf).

Source-compatible re-implementation of the reference's tinygltf path
(/root/reference/fredholm/src/scene.cpp:445-834): pbrMetallicRoughness +
KHR_materials_clearcoat materials, node hierarchy with per-node TRS or
matrix transforms, one submesh/instance per mesh node (instance transforms
refreshed by update_transform), camera nodes feeding the camera transform,
texcoord v-flip (scene.cpp:801), and keyframe T/R/S animations with linear
interpolation. Improvements over the reference: uint32/uint8 indices are
accepted (the reference hard-requires ushort, scene.cpp:744-746), and .glb
containers + data URIs are supported.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
import struct
from typing import List, Optional

import numpy as np

from .types import Material, Scene, TextureImage

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1,
    "VEC2": 2,
    "VEC3": 3,
    "VEC4": 4,
    "MAT4": 16,
}


@dataclasses.dataclass
class GltfNode:
    idx: int
    children: list
    transform: np.ndarray  # local 4x4
    camera_id: int = -1
    submesh_id: int = -1


@dataclasses.dataclass
class Animation:
    node_idx: int
    translation_input: np.ndarray
    translation_output: np.ndarray
    rotation_input: np.ndarray
    rotation_output: np.ndarray  # quaternions xyzw
    scale_input: np.ndarray
    scale_output: np.ndarray


def _load_buffers(doc: dict, parent: str, glb_bin: Optional[bytes]) -> List[bytes]:
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin or b"")
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(parent, uri), "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(doc: dict, buffers: List[bytes], accessor_id: int) -> np.ndarray:
    acc = doc["accessors"][accessor_id]
    view = doc["bufferViews"][acc["bufferView"]]
    buf = buffers[view["buffer"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0)
    itemsize = np.dtype(dtype).itemsize * ncomp
    if stride and stride != itemsize:
        raw = np.frombuffer(
            buf, np.uint8, count * stride, offset
        ).reshape(count, stride)[:, :itemsize]
        data = raw.reshape(-1).view(dtype).reshape(count, ncomp)
    else:
        data = np.frombuffer(buf, dtype, count * ncomp, offset).reshape(
            count, ncomp
        )
    return data


def _trs_matrix(node: dict) -> np.ndarray:
    """TRS or matrix -> local 4x4 (scene.cpp:677-726)."""
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation", [0, 0, 0])
    q = node.get("rotation", [0, 0, 0, 1])  # xyzw
    s = node.get("scale", [1, 1, 1])
    m[:3, :3] = _quat_to_mat(q) * np.asarray(s, np.float32)[None, :]
    m[:3, 3] = t
    return m


def _quat_to_mat(q) -> np.ndarray:
    x, y, z, w = [float(v) for v in q]
    n = max(np.sqrt(x * x + y * y + z * z + w * w), 1e-12)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _load_gltf_material(mat: dict) -> Material:
    """scene.cpp:487-556."""
    m = Material()
    pmr = mat.get("pbrMetallicRoughness", {})
    bc = pmr.get("baseColorFactor", [1, 1, 1, 1])
    m.base_color = tuple(bc[:3])
    if "baseColorTexture" in pmr:
        m.base_color_texture_id = pmr["baseColorTexture"]["index"]
    m.specular_roughness = pmr.get("roughnessFactor", 1.0)
    m.metalness = pmr.get("metallicFactor", 1.0)
    if "metallicRoughnessTexture" in pmr:
        m.metallic_roughness_texture_id = pmr["metallicRoughnessTexture"]["index"]

    cc = mat.get("extensions", {}).get("KHR_materials_clearcoat")
    if cc:
        m.coat = cc.get("clearcoatFactor", 0.0)
        if "clearcoatTexture" in cc:
            m.coat_texture_id = cc["clearcoatTexture"]["index"]
        m.coat_roughness = cc.get("clearcoatRoughnessFactor", m.coat_roughness)
        if "clearcoatRoughnessTexture" in cc:
            m.coat_roughness_texture_id = cc["clearcoatRoughnessTexture"]["index"]

    ef = mat.get("emissiveFactor")
    if ef and len(ef) == 3:
        m.emission = 1.0
        m.emission_color = tuple(ef)
    if "emissiveTexture" in mat:
        m.emission_texture_id = mat["emissiveTexture"]["index"]
    if "normalTexture" in mat:
        m.normalmap_texture_id = mat["normalTexture"]["index"]
    return m


def load_gltf(path: str) -> Scene:
    parent = os.path.dirname(os.path.abspath(path))
    glb_bin = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            magic, _version, _length = struct.unpack("<III", f.read(12))
            assert magic == 0x46546C67, "not a glb file"
            json_len, json_type = struct.unpack("<II", f.read(8))
            doc = json.loads(f.read(json_len))
            rest = f.read()
            if len(rest) >= 8:
                bin_len, _bin_type = struct.unpack("<II", rest[:8])
                glb_bin = rest[8 : 8 + bin_len]
    else:
        with open(path) as f:
            doc = json.load(f)

    buffers = _load_buffers(doc, parent, glb_bin)

    materials = [_load_gltf_material(m) for m in doc.get("materials", [])]
    if not materials:
        materials = [Material()]

    # textures: the reference loads all glTF textures as NONCOLOR
    # (scene.cpp:559-567, including its TODO); we tag baseColor/emissive
    # textures as sRGB per the glTF spec — an intended fidelity improvement
    srgb_ids = set()
    for mat in doc.get("materials", []):
        pmr = mat.get("pbrMetallicRoughness", {})
        if "baseColorTexture" in pmr:
            srgb_ids.add(pmr["baseColorTexture"]["index"])
        if "emissiveTexture" in mat:
            srgb_ids.add(mat["emissiveTexture"]["index"])

    textures: List[TextureImage] = []
    for i, tex in enumerate(doc.get("textures", [])):
        image = doc["images"][tex["source"]]
        data = None
        if "uri" in image and not image["uri"].startswith("data:"):
            try:
                from PIL import Image

                img = Image.open(os.path.join(parent, image["uri"]))
                data = np.asarray(img.convert("RGBA"), np.uint8)
            except Exception:
                pass
        elif "bufferView" in image or ("uri" in image and image["uri"].startswith("data:")):
            try:
                from io import BytesIO

                from PIL import Image

                if "bufferView" in image:
                    view = doc["bufferViews"][image["bufferView"]]
                    raw = buffers[view["buffer"]][
                        view.get("byteOffset", 0) : view.get("byteOffset", 0)
                        + view["byteLength"]
                    ]
                else:
                    raw = base64.b64decode(image["uri"].split(",", 1)[1])
                img = Image.open(BytesIO(raw))
                data = np.asarray(img.convert("RGBA"), np.uint8)
            except Exception:
                pass
        if data is None:
            data = np.full((1, 1, 4), 255, np.uint8)
        textures.append(TextureImage(data=data, is_srgb=i in srgb_ids))

    vertices: List[np.ndarray] = []
    normals: List[np.ndarray] = []
    texcoords: List[np.ndarray] = []
    indices: List[np.ndarray] = []
    material_ids: List[np.ndarray] = []
    instance_ids: List[np.ndarray] = []
    submesh_offsets: List[int] = []
    submesh_n_faces: List[int] = []
    nodes: List[GltfNode] = []

    state = {"v_offset": 0, "f_offset": 0}

    def load_node(node_idx: int) -> GltfNode:
        node = doc["nodes"][node_idx]
        n = GltfNode(
            idx=node_idx,
            children=[],
            transform=_trs_matrix(node),
            camera_id=node.get("camera", -1),
        )
        if "mesh" in node:
            n.submesh_id = len(submesh_offsets)
            mesh = doc["meshes"][node["mesh"]]
            faces_before = state["f_offset"]
            for prim in mesh.get("primitives", []):
                idx = _read_accessor(doc, buffers, prim["indices"]).astype(
                    np.int64
                ).reshape(-1)
                attrs = prim["attributes"]
                pos = _read_accessor(doc, buffers, attrs["POSITION"]).astype(
                    np.float32
                )
                nrm = (
                    _read_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                    if "NORMAL" in attrs
                    else np.zeros_like(pos)
                )
                if "NORMAL" not in attrs:
                    # face normals fallback
                    tri = pos[idx.reshape(-1, 3)]
                    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
                    fn /= np.maximum(
                        np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12
                    )
                    nrm = np.zeros_like(pos)
                    for k in range(3):
                        nrm[idx.reshape(-1, 3)[:, k]] = fn
                uv = (
                    _read_accessor(doc, buffers, attrs["TEXCOORD_0"]).astype(
                        np.float32
                    )
                    if "TEXCOORD_0" in attrs
                    else np.zeros((len(pos), 2), np.float32)
                )
                uv = uv.copy()
                uv[:, 1] = 1.0 - uv[:, 1]  # v-flip (scene.cpp:801)

                vertices.append(pos)
                normals.append(nrm)
                texcoords.append(uv)
                f = idx.reshape(-1, 3) + state["v_offset"]
                indices.append(f.astype(np.int32))
                mat_id = prim.get("material", 0)
                material_ids.append(np.full((len(f),), mat_id, np.int32))
                instance_ids.append(
                    np.full((len(f),), len(submesh_offsets), np.int32)
                )
                state["v_offset"] += len(pos)
                state["f_offset"] += len(f)
            submesh_offsets.append(faces_before)
            submesh_n_faces.append(state["f_offset"] - faces_before)
        for child in node.get("children", []):
            n.children.append(load_node(child))
        return n

    scene_doc = doc.get("scenes", [{}])[doc.get("scene", 0)]
    for node_idx in scene_doc.get("nodes", []):
        nodes.append(load_node(node_idx))

    # animations (scene.cpp:582-660)
    animations: List[Animation] = []
    for anim_doc in doc.get("animations", []):
        channels = anim_doc.get("channels", [])
        if not channels:
            continue
        node_idx = channels[0]["target"]["node"]
        data = {
            "translation": (np.zeros((0,)), np.zeros((0, 3))),
            "rotation": (np.zeros((0,)), np.zeros((0, 4))),
            "scale": (np.zeros((0,)), np.zeros((0, 3))),
        }
        for ch in channels:
            path_name = ch["target"]["path"]
            if path_name not in data:
                continue
            sampler = anim_doc["samplers"][ch["sampler"]]
            inp = _read_accessor(doc, buffers, sampler["input"]).astype(
                np.float32
            ).reshape(-1)
            out = _read_accessor(doc, buffers, sampler["output"]).astype(
                np.float32
            )
            data[path_name] = (inp, out)
        animations.append(
            Animation(
                node_idx=node_idx,
                translation_input=data["translation"][0],
                translation_output=data["translation"][1],
                rotation_input=data["rotation"][0],
                rotation_output=data["rotation"][1],
                scale_input=data["scale"][0],
                scale_output=data["scale"][1],
            )
        )

    n_sub = len(submesh_offsets)
    scene = Scene(
        vertices=np.concatenate(vertices) if vertices else np.zeros((0, 3), np.float32),
        normals=np.concatenate(normals) if normals else np.zeros((0, 3), np.float32),
        texcoords=np.concatenate(texcoords) if texcoords else np.zeros((0, 2), np.float32),
        indices=np.concatenate(indices) if indices else np.zeros((0, 3), np.int32),
        material_ids=np.concatenate(material_ids) if material_ids else np.zeros((0,), np.int32),
        instance_ids=np.concatenate(instance_ids) if instance_ids else np.zeros((0,), np.int32),
        materials=materials,
        textures=textures,
        transforms=np.tile(np.eye(4, dtype=np.float32), (max(n_sub, 1), 1, 1)),
        submesh_offsets=submesh_offsets,
        submesh_n_faces=submesh_n_faces,
        nodes=nodes,
        animations=animations,
    )
    update_transform(scene)
    return scene


def update_transform(scene: Scene) -> None:
    """Recompute per-instance transforms from the node tree
    (scene.cpp:836-860)."""

    def walk(node: GltfNode, parent_m: np.ndarray):
        m = parent_m @ node.transform
        if node.camera_id != -1:
            scene.has_camera_transform = True
            scene.camera_transform = m
        if node.submesh_id != -1:
            scene.transforms[node.submesh_id] = m
        for child in node.children:
            walk(child, m)

    for node in scene.nodes:
        walk(node, np.eye(4, dtype=np.float32))


def find_node(scene: Scene, node_idx: int) -> Optional[GltfNode]:
    """scene.cpp:900-918 (with the reference's child-recursion bug fixed:
    it drops the recursive result)."""

    def walk(node: GltfNode):
        if node.idx == node_idx:
            return node
        for child in node.children:
            got = walk(child)
            if got is not None:
                return got
        return None

    for node in scene.nodes:
        got = walk(node)
        if got is not None:
            return got
    return None
