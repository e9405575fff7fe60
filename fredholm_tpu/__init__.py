"""fredholm-tpu: a TPU-native offline rendering framework.

Public API surface; see README.md for the architecture and SURVEY.md for
the reference parity map.
"""

__version__ = "0.1.0"

from .camera import Camera, CameraMovement  # noqa: F401
from .renderer import Renderer  # noqa: F401
from .scene.types import DirectionalLight, Material, Scene, TextureImage  # noqa: F401

__all__ = [
    "Camera",
    "CameraMovement",
    "DirectionalLight",
    "Material",
    "Renderer",
    "Scene",
    "TextureImage",
    "load_model",
]


def load_model(filepath, into=None):
    from .scene.loaders import load_model as _lm

    return _lm(filepath, into=into)
