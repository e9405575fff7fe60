"""Generate golden images for the SSIM regression suite (tests/golden/).

Runs on the CPU backend so goldens are reproducible anywhere. Keep renders
small (64x64) — they exist to catch behavioral regressions, not to look
pretty. Regenerate ONLY when an intentional change alters converged images;
tests/test_golden.py compares at SSIM >= 0.98.

Run:  python tools/gen_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def golden_scenes():
    """name -> (renderer setup fn) shared by generator and tests."""
    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import (
        cornell_box,
        furnace_sphere,
        sphere_array_test,
    )
    from fredholm_tpu.scene.types import Material

    def cornell():
        r = Renderer(width=64, height=64)
        r.set_scene(cornell_box())
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
        r.camera._update_transform()
        return r, dict(n_samples=32, max_depth=4)

    def metal_row():
        r = Renderer(width=64, height=64)
        r.set_scene(
            sphere_array_test("metalness", [0.0, 0.5, 1.0], spacing=1.05)
        )
        r.camera.origin = np.asarray([0.0, 0.8, 2.2], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.6, 0.7, 0.9))
        return r, dict(n_samples=16, max_depth=3)

    def furnace():
        r = Renderer(width=48, height=48)
        r.set_scene(furnace_sphere(Material(specular=0.0)))
        r.set_bg_color((0.5, 0.5, 0.5))
        r.camera.origin = np.asarray([0.0, 0.0, 2.5], np.float32)
        r.camera._update_transform()
        return r, dict(n_samples=16, max_depth=8)

    def hosek_sun():
        r = Renderer(width=64, height=64)
        r.set_scene(
            sphere_array_test("specular_roughness", [0.1, 0.5], spacing=1.2)
        )
        r.camera.origin = np.asarray([0.0, 0.8, 2.5], np.float32)
        r.camera._update_transform()
        r.set_directional_light((5, 5, 5), (0.4, 1.0, 0.3), angle=1.0)
        r.load_arhosek_sky(3.0, 0.3)
        r.set_sky_intensity(0.05)
        return r, dict(n_samples=8, max_depth=3)

    def transmission():
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "transmission",
                [1.0],
                base=Material(specular_roughness=0.05, diffuse=0.0),
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.9, 0.6, 0.3))
        return r, dict(n_samples=16, max_depth=6)

    return {
        "cornell": cornell,
        "metal_row": metal_row,
        "furnace": furnace,
        "hosek_sun": hosek_sun,
        "transmission": transmission,
    }


def render_golden(name: str):
    import numpy as np

    setup = golden_scenes()[name]
    r, kwargs = setup()
    r.render(**kwargs)
    img = r.get_layer("beauty")
    return np.clip(img, 0.0, 4.0)  # HDR clamp for storage


def main() -> None:
    import numpy as np

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in golden_scenes():
        img = render_golden(name)
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, image=img.astype(np.float16))
        print(f"wrote {path}: mean {img.mean():.4f}")


if __name__ == "__main__":
    # force CPU like the test suite (sitecustomize would pick the TPU)
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
