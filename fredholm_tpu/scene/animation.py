"""Keyframe animation playback.

Mirrors Scene::update_animation (/root/reference/fredholm/src/
scene.cpp:862-898): per animated node, linearly interpolate T/R/S channels
at `time mod duration` (scene.h:163-178), rebuild the node's local
transform, then re-walk the node tree to refresh instance/camera
transforms.
"""

from __future__ import annotations

import numpy as np

from .gltf_loader import _quat_to_mat, find_node, update_transform
from .types import Scene


def _interp(inputs: np.ndarray, outputs: np.ndarray, time: float) -> np.ndarray:
    """glm::mix-style linear keyframe interpolation (scene.h:163-178).

    NOTE: the reference uses h = t - input[idx0] as the blend factor (not
    normalized by the keyframe gap); we reproduce intent with the proper
    normalized factor for correct playback on non-unit keyframe spacing.
    """
    t = float(np.fmod(time, inputs[-1])) if inputs[-1] > 0 else 0.0
    idx1 = int(np.searchsorted(inputs, t, side="left"))
    idx1 = min(idx1, len(inputs) - 1)
    idx0 = max(idx1 - 1, 0)
    gap = inputs[idx1] - inputs[idx0]
    h = (t - inputs[idx0]) / gap if gap > 0 else 0.0
    return (1.0 - h) * outputs[idx0] + h * outputs[idx1]


def update_animation(scene: Scene, time: float,
                     refresh_transforms: bool = True) -> None:
    for anim in scene.animations:
        translation = np.zeros(3, np.float32)
        rotation = np.asarray([0, 0, 0, 1], np.float32)
        scale = np.ones(3, np.float32)
        if len(anim.translation_input) > 0:
            translation = _interp(
                anim.translation_input, anim.translation_output, time
            )
        if len(anim.rotation_input) > 0:
            rotation = _interp(anim.rotation_input, anim.rotation_output, time)
        if len(anim.scale_input) > 0:
            scale = _interp(anim.scale_input, anim.scale_output, time)

        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = _quat_to_mat(rotation) * np.asarray(scale, np.float32)[None, :]
        m[:3, 3] = translation

        node = find_node(scene, anim.node_idx)
        if node is None:
            raise ValueError(f"invalid animation target node {anim.node_idx}")
        node.transform = m

    if refresh_transforms:
        update_transform(scene)


def node_world_transforms(scene: Scene, n_slots: int) -> np.ndarray:
    """[n_slots, 4, 4] world transform per node `submesh_id` slot, plus a
    camera-transform refresh — the node walk of update_transform
    (scene.cpp:836-860) writing to a standalone array instead of
    scene.transforms.

    Instanced animation path: `load_gltf_instanced` preserves the flat
    node tree, whose submesh_id is exactly the MeshInstance index, so
    this yields the per-instance object-to-world matrices for an O(I)
    `set_instance_transforms` (renderer.h:614-640 IAS rebuild analog)
    without touching base.transforms (which must stay identity: instanced
    geometry lives on device in object space)."""
    out = np.tile(np.eye(4, dtype=np.float32), (n_slots, 1, 1))

    def walk(node, parent_m: np.ndarray):
        m = parent_m @ node.transform
        if node.camera_id != -1:
            scene.has_camera_transform = True
            scene.camera_transform = m
        if node.submesh_id != -1 and node.submesh_id < n_slots:
            out[node.submesh_id] = m
        for child in node.children:
            walk(child, m)

    for node in scene.nodes:
        walk(node, np.eye(4, dtype=np.float32))
    return out
