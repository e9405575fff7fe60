"""Controller builtin scene registry: every entry must construct, and the
new grid/instanced builtins must render (the registry is the analog of the
reference's 42-entry scene list, controller.h:30-70)."""

import numpy as np
import pytest

from fredholm_tpu.apps.controller import BUILTIN_SCENES
from fredholm_tpu.renderer import Renderer

# the million-triangle-class scenes take minutes to build on the test host
# (hero's 260k-tri terrain + instanced BLAS build is covered by its golden)
_SKIP_BUILD = {"terrain_1m", "tiles_10m", "hero"}


class TestBuiltinScenes:
    def test_registry_covers_reference_test_scenes(self):
        """Procedural analogs exist for every per-lobe/feature test scene
        in the reference list (the 13 large art assets map to the
        terrain/tiles scene class)."""
        expected = {
            "cornell_box", "specular_test", "specular_roughness_test",
            "metal_test", "coat_test", "transmission_test",
            "transmission_roughness_test", "transmission_test_sphere",
            "specular_transmission_test",
            "specular_transmission_roughness_test",
            "diffuse_transmission_test", "thin_film_test", "texture_test",
            "normalmap_test", "emission_texture_test", "sheen_test",
            "diffuse_test", "specular_white_furnace_test",
            "coat_white_furnace_test", "metal_rough_spheres",
            "clear_coat_test", "instance_test", "terrain_1m",
            "terrain_100k", "tiles_10m",
        }
        missing = expected - set(BUILTIN_SCENES)
        assert not missing, f"missing builtins: {sorted(missing)}"

    @pytest.mark.parametrize(
        "name", [n for n in sorted(BUILTIN_SCENES) if n not in _SKIP_BUILD]
    )
    def test_builtin_constructs(self, name):
        scene = BUILTIN_SCENES[name]()
        base = getattr(scene, "base", scene)
        assert base.n_faces() > 0
        assert len(base.materials) > 0

    def test_hero_constructs_small(self):
        """The everything-on composite (registry entry "hero") builds at
        reduced scale: instanced base with terrain + tree + rock +
        lantern submeshes, alpha + normal-map textures."""
        from fredholm_tpu.scene.procedural import hero

        sc = hero(terrain_n=24, n_trees=2, n_rocks=2)
        assert sc.is_valid()
        assert len(sc.base.submesh_offsets) == 4
        assert len(sc.instances) >= 5

    def test_metal_rough_grid_renders(self):
        r = Renderer(width=32, height=32)
        r.set_scene(BUILTIN_SCENES["metal_rough_spheres"]())
        r.camera.origin = np.asarray([0.0, 2.0, 5.0], np.float32)
        r.camera._update_transform()
        r.set_bg_color((0.5, 0.6, 0.7))
        img = np.asarray(r.render(n_samples=1, max_depth=2)["beauty"])
        assert np.isfinite(img).all() and img.mean() > 1e-3

    def test_instance_test_renders_shared_blas(self):
        r = Renderer(width=32, height=32)
        r.set_scene(BUILTIN_SCENES["instance_test"]())
        r.camera.origin = np.asarray([0.0, 2.0, 6.0], np.float32)
        r.camera.look_around(0.0, -0.2)
        r.camera._update_transform()
        r.set_bg_color((0.4, 0.4, 0.5))
        img = np.asarray(r.render(n_samples=1, max_depth=2)["beauty"])
        assert np.isfinite(img).all() and img.mean() > 1e-3
        assert r._dev["_n_instances"] == 4
