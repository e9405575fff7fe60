"""Model loading dispatch (Scene::load_model, scene.cpp:103-117)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .gltf_loader import load_gltf
from .obj_loader import load_obj
from .types import Scene


def load_model(filepath: str, into: Optional[Scene] = None) -> Scene:
    ext = os.path.splitext(filepath)[1].lower()
    if ext == ".obj":
        scene = load_obj(filepath)
    elif ext in (".gltf", ".glb"):
        scene = load_gltf(filepath)
    else:
        raise ValueError(
            f"failed to load {filepath}: invalid extension {ext}"
        )
    if into is not None and into.is_valid():
        return merge_scenes(into, scene)
    return scene


def merge_scenes(a: Scene, b: Scene) -> Scene:
    """Additive load (load_scene(..., clear=false), e.g. a glTF camera
    track loaded on top of an .obj scene, rtcamp8.cpp:120-121)."""
    if not b.is_valid():
        # camera/animation-only payload: adopt its camera + animations
        a.nodes = a.nodes + b.nodes
        a.animations = a.animations + b.animations
        if b.has_camera_transform:
            a.has_camera_transform = True
            a.camera_transform = b.camera_transform
        return a

    v_off = len(a.vertices)
    m_off = len(a.materials)
    t_off = len(a.textures)
    i_off = a.transforms.shape[0]

    import dataclasses

    for mat in b.materials:
        mat = dataclasses.replace(mat)
        for field in (
            "base_color_texture_id",
            "specular_color_texture_id",
            "specular_roughness_texture_id",
            "metalness_texture_id",
            "metallic_roughness_texture_id",
            "coat_texture_id",
            "coat_roughness_texture_id",
            "emission_texture_id",
            "heightmap_texture_id",
            "normalmap_texture_id",
            "alpha_texture_id",
        ):
            tid = getattr(mat, field)
            if tid >= 0:
                setattr(mat, field, tid + t_off)
        a.materials.append(mat)
    a.textures.extend(b.textures)

    a.vertices = np.concatenate([a.vertices, b.vertices])
    a.normals = np.concatenate([a.normals, b.normals])
    a.texcoords = np.concatenate([a.texcoords, b.texcoords])
    a.indices = np.concatenate([a.indices, b.indices + v_off])
    a.material_ids = np.concatenate(
        [a.material_ids, b.material_ids + m_off]
    )
    a.instance_ids = np.concatenate([a.instance_ids, b.instance_ids + i_off])
    a.transforms = np.concatenate([a.transforms, b.transforms])
    a.submesh_offsets.extend(
        off + a.n_faces() - b.n_faces() for off in b.submesh_offsets
    )
    a.submesh_n_faces.extend(b.submesh_n_faces)

    # b's node tree indexes b-relative submeshes/instances: shift them
    def shift_nodes(node):
        if node.submesh_id >= 0:
            node.submesh_id += i_off
        for child in node.children:
            shift_nodes(child)

    for node in b.nodes:
        shift_nodes(node)
    a.nodes = a.nodes + b.nodes
    a.animations = a.animations + b.animations
    if b.has_camera_transform:
        a.has_camera_transform = True
        a.camera_transform = b.camera_transform
    return a
