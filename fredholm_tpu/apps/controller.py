"""Controller: binds interactive state to the Renderer + Denoiser.

TPU-native analog of the reference's GUI controller
(/root/reference/app/controller.h:75-174, controller.cpp): owns the scene
list, AOV selection, sky-type switch, camera parameters, the progressive
1-spp-per-tick loop capped at max_samples (controller.cpp:205-230), and the
denoise / post-process / save-PNG actions (controller.cpp:232-312).
The display layer (apps/viewer.py) consumes it instead of ImGui+OpenGL.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import numpy as np

from ..camera import CameraMovement
from ..denoise.atrous import Denoiser
from ..post.post_process import PostProcessParams, post_process
from ..renderer import Renderer
from ..scene import procedural
from ..utils.image import layer_to_image, write_png


class AOVType(enum.Enum):
    # controller.h:18-26
    BEAUTY = 0
    DENOISED = 1
    POSITION = 2
    NORMAL = 3
    TEXCOORD = 4
    DEPTH = 5
    ALBEDO = 6


class SkyType(enum.Enum):
    # controller.h:28
    CONSTANT = 0
    IBL = 1
    ARHOSEK = 2


# built-in procedural analogs of the reference's scene list
# (controller.h:30-70); file scenes load via load_scene(path)
BUILTIN_SCENES = {
    "cornell_box": lambda: procedural.cornell_box(),
    # the everything-on composite (rtcamp8.cpp:47-303 analog); the
    # scale-test scenes are terrain_1m / terrain_100k / tiles_10m below
    "hero": lambda: procedural.hero(),
    "specular_test": lambda: procedural.sphere_array_test(
        "specular", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    "specular_roughness_test": lambda: procedural.sphere_array_test(
        "specular_roughness", [0.01, 0.2, 0.4, 0.6, 0.8]
    ),
    "metal_test": lambda: procedural.sphere_array_test(
        "metalness", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    "coat_test": lambda: procedural.sphere_array_test(
        "coat", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    "transmission_test": lambda: procedural.sphere_array_test(
        "transmission", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    # transmission roughness rides specular_roughness in the Arnold
    # material model (shared.h:123 has no separate field); the reference's
    # transmission_roughness_test .obj sweeps it the same way
    "transmission_roughness_test": lambda: procedural.sphere_array_test(
        "specular_roughness", [0.01, 0.15, 0.3, 0.5, 0.7],
        base=procedural.Material(transmission=1.0, diffuse=0.0),
    ),
    "specular_transmission_test": lambda: procedural.sphere_array_test(
        "transmission", [0.0, 0.25, 0.5, 0.75, 1.0],
        base=procedural.Material(
            specular=1.0, specular_roughness=0.05, diffuse=0.0
        ),
    ),
    # diffuse transmission = subsurface * thin_walled (bsdf.cu:165,330)
    "diffuse_transmission_test": lambda: procedural.sphere_array_test(
        "subsurface", [0.0, 0.25, 0.5, 0.75, 1.0],
        base=procedural.Material(thin_walled=1.0),
    ),
    "thin_film_test": lambda: procedural.sphere_array_test(
        "thin_film_thickness", [0.0, 200.0, 400.0, 600.0, 800.0],
        base=procedural.Material(
            diffuse=0.0, specular=1.0, specular_roughness=0.05
        ),
    ),
    "texture_test": lambda: procedural.texture_test(),
    "normalmap_test": lambda: procedural.normalmap_test(),
    "emission_texture_test": lambda: procedural.emission_texture_test(),
    # single-sphere transmission scene (transmission_test_sphere,
    # controller.h:50)
    "transmission_test_sphere": lambda: procedural.sphere_array_test(
        "transmission", [1.0],
        base=procedural.Material(diffuse=0.0),
    ),
    # transmission=1 + specular=1 sweeping roughness
    # (specular_transmission_roughness_test, controller.h:52)
    "specular_transmission_roughness_test":
        lambda: procedural.sphere_array_test(
            "specular_roughness", [0.01, 0.15, 0.3, 0.5, 0.7],
            base=procedural.Material(
                transmission=1.0, specular=1.0, diffuse=0.0
            ),
        ),
    # 2D metalness x roughness grid (MetalRoughSpheres.gltf analog,
    # controller.h:60)
    "metal_rough_spheres": lambda: procedural.sphere_grid_test(
        "metalness", [0.0, 0.25, 0.5, 0.75, 1.0],
        "specular_roughness", [0.05, 0.3, 0.6, 0.9],
    ),
    # coat=1 sweeping coat roughness (ClearCoatTest.gltf analog,
    # controller.h:61)
    "clear_coat_test": lambda: procedural.sphere_array_test(
        "coat_roughness", [0.0, 0.25, 0.5, 0.75, 1.0],
        base=procedural.Material(coat=1.0, base_color=(0.6, 0.1, 0.1)),
    ),
    # shared-BLAS instanced ring (instance_test.gltf analog,
    # controller.h:63)
    "instance_test": lambda: procedural.instance_test(),
    "sheen_test": lambda: procedural.sphere_array_test(
        "sheen", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    "diffuse_test": lambda: procedural.sphere_array_test(
        "diffuse_roughness", [0.0, 0.25, 0.5, 0.75, 1.0]
    ),
    "specular_white_furnace_test": lambda: procedural.furnace_sphere(
        procedural.Material(base_color=(1, 1, 1), diffuse=0.0, specular=1.0)
    ),
    "coat_white_furnace_test": lambda: procedural.furnace_sphere(
        procedural.Material(base_color=(1, 1, 1), diffuse=0.0, coat=1.0)
    ),
    # million-triangle scene class (San Miguel/Rungholt analog,
    # controller.h:31-43) through the supercluster traversal
    "terrain_1m": lambda: procedural.terrain(),
    "terrain_100k": lambda: procedural.terrain(n=224),
    # 10.4M scene triangles, O(unique)=650k device memory (San Miguel
    # 10M-tri class, controller.h:39)
    "tiles_10m": lambda: procedural.instanced_tiles(),
}


@dataclasses.dataclass
class ControllerState:
    """The GUI widget state (controller.h:78-111 defaults)."""

    resolution: tuple = (1920, 1080)
    n_samples: int = 0
    max_samples: int = 100
    max_depth: int = 10
    aov_type: AOVType = AOVType.BEAUTY
    time: float = 0.0
    play_animation: bool = False
    timestep: float = 0.01
    filename: str = "output.png"

    camera_origin: tuple = (0.0, 1.0, 5.0)
    fov_deg: float = 90.0
    f_number: float = 100.0
    focus: float = 10000.0
    movement_speed: float = 1.0
    rotation_speed: float = 0.1

    directional_light_le: tuple = (0.0, 0.0, 0.0)
    directional_light_dir: tuple = (0.0, 1.0, 0.0)
    directional_light_angle: float = 0.0

    sky_type: SkyType = SkyType.CONSTANT
    bg_color: tuple = (0.0, 0.0, 0.0)
    sky_intensity: float = 1.0
    arhosek_turbidity: float = 3.0
    arhosek_albedo: float = 0.3

    use_bloom: bool = False
    bloom_threshold: float = 1.0
    bloom_sigma: float = 1.0
    iso: float = 400.0
    chromatic_aberration: float = 1.0


class Controller:
    def __init__(self, width: int = 512, height: int = 512):
        self.state = ControllerState(resolution=(width, height))
        self.renderer = Renderer(width=width, height=height)
        self.denoiser = Denoiser(width, height)
        self._denoised = None

    # -- scene ------------------------------------------------------------

    def scene_names(self) -> List[str]:
        return list(BUILTIN_SCENES.keys())

    def load_builtin_scene(self, name: str):
        self.renderer.set_scene(BUILTIN_SCENES[name]())
        self.clear_render()

    def load_scene(self, path: str):
        self.renderer.load_scene(path)
        self.clear_render()

    # -- camera (gui.cpp:23-54) --------------------------------------------

    def move_camera(self, direction: CameraMovement, dt: float):
        self.renderer.camera.movement_speed = self.state.movement_speed
        self.renderer.camera.move(direction, dt)
        self.clear_render()

    def rotate_camera(self, d_phi: float, d_theta: float):
        self.renderer.camera.look_around(d_phi, d_theta)
        self.clear_render()

    def update_camera_params(self):
        self.renderer.camera.fov = np.deg2rad(self.state.fov_deg)
        self.renderer.camera.f_number = self.state.f_number
        self.renderer.camera.focus = self.state.focus
        self.clear_render()

    # -- render state -------------------------------------------------------

    def update_resolution(self, width: int, height: int):
        self.state.resolution = (width, height)
        self.renderer.set_resolution(width, height)
        self.denoiser = Denoiser(width, height)
        self.state.n_samples = 0

    def clear_render(self):
        # controller.cpp:198-203
        self.renderer.init_render_states()
        self.state.n_samples = 0
        self._denoised = None

    # -- sky (controller.cpp:148-164) ---------------------------------------

    def update_sky_type(self):
        st = self.state
        if st.sky_type == SkyType.CONSTANT:
            self.renderer.set_bg_color(st.bg_color)
        elif st.sky_type == SkyType.ARHOSEK:
            self.renderer.set_directional_light(
                st.directional_light_le,
                st.directional_light_dir,
                st.directional_light_angle,
            )
            self.renderer.load_arhosek_sky(
                st.arhosek_turbidity, st.arhosek_albedo
            )
        self.renderer.set_sky_intensity(st.sky_intensity)
        self.clear_render()

    def load_ibl(self, path: str):
        self.renderer.load_ibl(path)
        self.state.sky_type = SkyType.IBL
        self.clear_render()

    def update_directional_light(self):
        st = self.state
        if any(c > 0 for c in st.directional_light_le):
            self.renderer.set_directional_light(
                st.directional_light_le,
                st.directional_light_dir,
                st.directional_light_angle,
            )
        else:
            self.renderer.clear_directional_light()
        self.clear_render()

    # -- progressive loop (controller.cpp:205-230) ---------------------------

    def render_tick(self, spp: int = 1):
        """Accumulate spp more samples unless max_samples reached."""
        if self.state.n_samples >= self.state.max_samples:
            return False
        if self.state.play_animation:
            self.state.time += self.state.timestep
            self.renderer.set_time(self.state.time)
            self.clear_render()
        self.renderer.render(n_samples=spp, max_depth=self.state.max_depth)
        self.state.n_samples = self.renderer.n_accumulated
        self._denoised = None
        return True

    def set_time(self, t: float):
        self.state.time = t
        self.renderer.set_time(t)
        self.clear_render()

    # -- output (controller.cpp:232-312) -------------------------------------

    def denoise(self):
        layers = self.renderer.layers
        self._denoised = self.denoiser.denoise(
            layers["beauty"], normal=layers["normal"], albedo=layers["albedo"]
        )
        return self._denoised

    def get_aov_image(self) -> np.ndarray:
        """Selected AOV as [H, W, C] float."""
        st = self.state
        w, h = self.renderer.width, self.renderer.height
        if st.aov_type == AOVType.DENOISED:
            if self._denoised is None:
                self.denoise()
            return layer_to_image(np.asarray(self._denoised), w, h)
        name = {
            AOVType.BEAUTY: "beauty",
            AOVType.POSITION: "position",
            AOVType.NORMAL: "normal",
            AOVType.TEXCOORD: "texcoord",
            AOVType.DEPTH: "depth",
            AOVType.ALBEDO: "albedo",
        }[st.aov_type]
        return self.renderer.get_layer(name)

    def get_display_image(self) -> np.ndarray:
        """AOV -> post-processed sRGB image for display/saving."""
        import jax.numpy as jnp

        img = self.get_aov_image()
        st = self.state
        if st.aov_type in (AOVType.BEAUTY, AOVType.DENOISED):
            pp = PostProcessParams(
                use_bloom=st.use_bloom,
                bloom_threshold=st.bloom_threshold,
                bloom_sigma=st.bloom_sigma,
                iso=st.iso,
                chromatic_aberration=st.chromatic_aberration,
            )
            return np.asarray(post_process(jnp.asarray(img), pp))
        if st.aov_type == AOVType.NORMAL:
            return np.asarray(img) * 0.5 + 0.5
        if st.aov_type == AOVType.DEPTH:
            d = np.asarray(img)
            return d / max(d.max(), 1e-6)
        return np.clip(np.asarray(img), 0.0, 1.0)

    def save_image(self, path: Optional[str] = None):
        path = path or self.state.filename
        write_png(path, self.get_display_image())
        return path
