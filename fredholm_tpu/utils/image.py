"""Image IO helpers (PNG write path of the reference apps,
/root/reference/app/rtcamp8.cpp:248-297)."""

from __future__ import annotations

import numpy as np


def layer_to_image(buf: np.ndarray, width: int, height: int) -> np.ndarray:
    """Flat [N, C] or [N] AOV buffer -> [H, W, C] image.

    Pixel (x, y) lives at index x + width*y; with the film-plane mapping of
    pixel_uv (pt.cu:438-442) row y=0 looks UP in camera space, i.e. rows are
    already top-down for image files.
    """
    buf = np.asarray(buf)
    if buf.ndim == 1:
        buf = buf[:, None]
    return buf.reshape(height, width, -1)


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img[..., :3]


def write_png(path: str, img: np.ndarray) -> None:
    """float [H, W, 3/4] in [0,1] (or uint8) -> PNG."""
    from PIL import Image

    Image.fromarray(_to_u8(img)).save(path)


def png_bytes(img: np.ndarray) -> bytes:
    """float [H, W, 3/4] in [0,1] (or uint8) -> in-memory PNG (the web
    viewer's progressive frame stream)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_to_u8(img)).save(buf, format="PNG")
    return buf.getvalue()
