from .atrous import Denoiser, atrous_denoise  # noqa: F401

__all__ = ["Denoiser", "atrous_denoise"]
