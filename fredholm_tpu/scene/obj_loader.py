"""Wavefront .obj + .mtl loader with Arnold-Standard-Surface extensions.

Source-compatible re-implementation of the reference's tinyobjloader-based
path (/root/reference/fredholm/src/scene.cpp:119-443): triangulated faces,
vertex deduplication by (position, normal, texcoord), per-face material
ids, one submesh per obj shape ('o'/'g'), face normals when missing,
barycentric default texcoords, and the Arnold extension keys the reference
reads from MTL `unknown_parameter` entries (scene.cpp:177-315): diffuse,
diffuse_roughness, sheen, sheen_color, sheen_roughness, subsurface,
subsurface_color, thin_walled.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .types import Material, Scene, TextureImage


def _parse_floats(tokens: List[str]) -> Tuple[float, ...]:
    return tuple(float(t) for t in tokens)


def load_mtl(path: str) -> Tuple[Dict[str, dict], List[str]]:
    """Parse a .mtl file into {material_name: raw key/value dict} plus the
    declaration order."""
    mats: Dict[str, dict] = {}
    order: List[str] = []
    cur: Optional[dict] = None
    if not os.path.exists(path):
        return mats, order
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tokens = line.split()
            key = tokens[0]
            if key == "newmtl":
                name = " ".join(tokens[1:])
                cur = {}
                mats[name] = cur
                order.append(name)
            elif cur is not None:
                cur[key] = tokens[1:]
    return mats, order


def _texture(parent: str, rel: str, is_srgb: bool, cache: dict,
             textures: List[TextureImage]) -> int:
    if rel in cache:
        return cache[rel]
    path = os.path.join(parent, rel)
    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGBA"), dtype=np.uint8)
    except Exception:
        img = np.full((1, 1, 4), 255, np.uint8)
    tid = len(textures)
    textures.append(TextureImage(data=img, is_srgb=is_srgb))
    cache[rel] = tid
    return tid


def _material_from_mtl(raw: dict, parent: str, cache: dict,
                       textures: List[TextureImage]) -> Material:
    """MTL (+PBR extension +Arnold unknown parameters) -> Material,
    matching scene.cpp:177-315 semantics."""
    m = Material()

    def f1(key, default=None):
        if key in raw:
            return float(raw[key][0])
        return default

    def f3(key, default=None):
        if key in raw:
            return _parse_floats(raw[key][:3])
        return default

    # Arnold extension: diffuse weight / roughness
    if "diffuse" in raw:
        m.diffuse = f1("diffuse")
    if "diffuse_roughness" in raw:
        m.diffuse_roughness = f1("diffuse_roughness")

    kd = f3("Kd")
    if kd is not None:
        m.base_color = kd
    if "map_Kd" in raw:
        m.base_color_texture_id = _texture(
            parent, raw["map_Kd"][-1], True, cache, textures
        )

    ks = f3("Ks")
    if ks is not None:
        m.specular_color = ks
    if "map_Ks" in raw:
        m.specular_color_texture_id = _texture(
            parent, raw["map_Ks"][-1], True, cache, textures
        )

    pr = f1("Pr", 0.0)  # PBR roughness
    if pr and pr > 0:
        m.specular_roughness = pr
    if "map_Pr" in raw:
        m.specular_roughness_texture_id = _texture(
            parent, raw["map_Pr"][-1], False, cache, textures
        )

    m.metalness = f1("Pm", 0.0) or 0.0
    if "map_Pm" in raw:
        m.metalness_texture_id = _texture(
            parent, raw["map_Pm"][-1], False, cache, textures
        )

    pc = f1("Pc", 0.0)  # clearcoat thickness
    if pc and pc > 0:
        m.coat = pc
        # NOTE: the reference sets coat_roughness from clearcoat_thickness
        # too (scene.cpp:239-242, a quirk we reproduce)
        m.coat_roughness = pc

    d = f1("d", 1.0)
    m.transmission = max(1.0 - (d if d is not None else 1.0), 0.0)
    tf = f3("Tf")
    if tf is not None and any(c > 0 for c in tf):
        m.transmission_color = tf

    if "sheen" in raw:
        m.sheen = f1("sheen")
    if "sheen_color" in raw:
        m.sheen_color = f3("sheen_color")
    if "sheen_roughness" in raw:
        m.sheen_roughness = f1("sheen_roughness")
    if "subsurface" in raw:
        m.subsurface = f1("subsurface")
    if "subsurface_color" in raw:
        m.subsurface_color = f3("subsurface_color")
    if "thin_walled" in raw:
        m.thin_walled = f1("thin_walled")

    ke = f3("Ke")
    if ke is not None and any(c > 0 for c in ke):
        m.emission = 1.0
        m.emission_color = ke

    if "map_bump" in raw or "bump" in raw:
        key = "map_bump" if "map_bump" in raw else "bump"
        m.heightmap_texture_id = _texture(
            parent, raw[key][-1], False, cache, textures
        )
    if "norm" in raw or "map_Kn" in raw:
        key = "norm" if "norm" in raw else "map_Kn"
        m.normalmap_texture_id = _texture(
            parent, raw[key][-1], False, cache, textures
        )
    if "map_d" in raw:
        m.alpha_texture_id = _texture(
            parent, raw["map_d"][-1], False, cache, textures
        )
    return m


def load_obj(path: str) -> Scene:
    """Load .obj into a Scene (scene.cpp:119-443 semantics)."""
    parent = os.path.dirname(os.path.abspath(path))
    positions: List[Tuple[float, ...]] = []
    normals: List[Tuple[float, ...]] = []
    texcoords: List[Tuple[float, ...]] = []

    materials: List[Material] = []
    mat_index: Dict[str, int] = {}
    textures: List[TextureImage] = []
    tex_cache: dict = {}

    # accumulated scene data
    out_vertices: List[Tuple] = []
    vertex_lut: Dict[Tuple, int] = {}
    out_indices: List[List[int]] = []
    out_mat_ids: List[int] = []
    submesh_offsets: List[int] = []
    submesh_n_faces: List[int] = []

    cur_mat = -1
    cur_submesh_start = 0

    def close_submesh():
        nonlocal cur_submesh_start
        n = len(out_indices) - cur_submesh_start
        if n > 0:
            submesh_offsets.append(cur_submesh_start)
            submesh_n_faces.append(n)
            cur_submesh_start = len(out_indices)

    def vertex_id(vi: int, ni: int, ti: int, face_pos, k) -> int:
        pos = positions[vi]
        if ni >= 0:
            nrm = normals[ni]
        else:
            # face normal (scene.cpp:363-372)
            v0 = np.asarray(face_pos[0])
            v1 = np.asarray(face_pos[1])
            v2 = np.asarray(face_pos[2])
            e1 = v1 - v0
            e2 = v2 - v0
            e1 /= max(np.linalg.norm(e1), 1e-12)
            e2 /= max(np.linalg.norm(e2), 1e-12)
            n = np.cross(e1, e2)
            n /= max(np.linalg.norm(n), 1e-12)
            nrm = tuple(n.tolist())
        if ti >= 0:
            uv = texcoords[ti]
        else:
            uv = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)][k]  # scene.cpp:375-379
        key = (pos, nrm, uv)
        if key not in vertex_lut:
            vertex_lut[key] = len(out_vertices)
            out_vertices.append(key)
        return vertex_lut[key]

    def parse_index(tok: str, count: int) -> int:
        if not tok:
            return -1
        i = int(tok)
        return i - 1 if i > 0 else count + i

    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tokens = line.split()
            key = tokens[0]
            if key == "v":
                positions.append(tuple(float(t) for t in tokens[1:4]))
            elif key == "vn":
                normals.append(tuple(float(t) for t in tokens[1:4]))
            elif key == "vt":
                texcoords.append(tuple(float(t) for t in tokens[1:3]))
            elif key == "mtllib":
                mtl_path = os.path.join(parent, " ".join(tokens[1:]))
                raw_mats, order = load_mtl(mtl_path)
                for name in order:
                    mat_index[name] = len(materials)
                    materials.append(
                        _material_from_mtl(
                            raw_mats[name], parent, tex_cache, textures
                        )
                    )
            elif key == "usemtl":
                name = " ".join(tokens[1:])
                cur_mat = mat_index.get(name, -1)
            elif key in ("o", "g"):
                close_submesh()
            elif key == "f":
                corners = tokens[1:]
                parsed = []
                for c in corners:
                    parts = (c.split("/") + ["", ""])[:3]
                    parsed.append(
                        (
                            parse_index(parts[0], len(positions)),
                            parse_index(parts[2], len(normals)),
                            parse_index(parts[1], len(texcoords)),
                        )
                    )
                # triangulate fan (tinyobj triangulate=true)
                for t in range(1, len(parsed) - 1):
                    tri = [parsed[0], parsed[t], parsed[t + 1]]
                    face_pos = [positions[p[0]] for p in tri]
                    ids = [
                        vertex_id(p[0], p[1], p[2], face_pos, k)
                        for k, p in enumerate(tri)
                    ]
                    out_indices.append(ids)
                    out_mat_ids.append(max(cur_mat, 0))
    close_submesh()

    if not materials:
        materials = [Material()]

    verts = np.asarray([v[0] for v in out_vertices], np.float32)
    norms = np.asarray([v[1] for v in out_vertices], np.float32)
    uvs = np.asarray([v[2] for v in out_vertices], np.float32)
    idx = np.asarray(out_indices, np.int32)
    n_faces = len(out_indices)

    return Scene(
        vertices=verts,
        normals=norms,
        texcoords=uvs,
        indices=idx,
        material_ids=np.asarray(out_mat_ids, np.int32),
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials,
        textures=textures,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=submesh_offsets or [0],
        submesh_n_faces=submesh_n_faces or [n_faces],
    )
