"""fredholm-tpu: a TPU-native offline rendering framework.

Public API surface; see README.md for the architecture and SURVEY.md for
the reference parity map.
"""

__version__ = "0.1.0"

from .camera import Camera, CameraMovement  # noqa: F401
from .renderer import Renderer  # noqa: F401
from .scene.types import (  # noqa: F401
    DirectionalLight,
    InstancedScene,
    Material,
    MeshInstance,
    Scene,
    TextureImage,
)

__all__ = [
    "Camera",
    "CameraMovement",
    "DirectionalLight",
    "InstancedScene",
    "Material",
    "MeshInstance",
    "Renderer",
    "Scene",
    "TextureImage",
    "load_model",
    "load_model_instanced",
]


def load_model(filepath, into=None):
    from .scene.loaders import load_model as _lm

    return _lm(filepath, into=into)


def load_model_instanced(filepath):
    """glTF/.glb -> InstancedScene (shared-BLAS instancing)."""
    from .scene.instanced_loader import load_gltf_instanced

    return load_gltf_instanced(filepath)
