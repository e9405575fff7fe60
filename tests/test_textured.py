"""End-to-end coverage of texture-driven shading paths: base-color
textures, normal maps, emission textures, and animated-transform refits."""

import numpy as np
import pytest

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import _quad
from fredholm_tpu.scene.types import Material, Scene, TextureImage


def quad_scene(materials, textures, mids=(0, 0)):
    v, n, t, f = _quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
    return Scene(
        vertices=v,
        normals=n,
        texcoords=t,
        indices=f,
        material_ids=np.asarray(mids, np.int32),
        instance_ids=np.zeros((2,), np.int32),
        materials=materials,
        textures=textures,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[2],
    )


def front_renderer(scene, res=16):
    r = Renderer(width=res, height=res)
    r.set_scene(scene)
    r.camera.origin = np.asarray([0.0, 0.0, 1.5], np.float32)
    r.camera._update_transform()
    return r


class TestBaseColorTexture:
    def test_checker_texture_visible_in_albedo(self):
        # 16x16 texture, left half red / right half blue (big blocks so
        # bilinear filtering stays inside a block)
        tex = np.zeros((16, 16, 4), np.uint8)
        tex[..., 3] = 255
        tex[:, :8, 0] = 255
        tex[:, 8:, 2] = 255
        mat = Material(specular=0.0, base_color_texture_id=0)
        sc = quad_scene([mat], [TextureImage(data=tex, is_srgb=False)])
        r = front_renderer(sc)
        r.set_bg_color((1.0, 1.0, 1.0))
        r.render(n_samples=1, max_depth=2)
        albedo = r.get_layer("albedo")
        # the quad spans roughly columns 5..11 at this framing; compare
        # points inside each half
        a = albedo[8, 6]
        b = albedo[8, 10]
        pair = sorted([(float(a[0]), float(a[2])), (float(b[0]), float(b[2]))])
        # one sample strongly red, the other strongly blue
        assert pair[0][1] > 0.5 and pair[0][0] < 0.3, (a, b)
        assert pair[1][0] > 0.5 and pair[1][1] < 0.3, (a, b)


class TestFusedTextures:
    """In-pipeline texture fetch on the fused/regen fast paths must match
    the general wavefront integrator (fill_shading_params overrides,
    pt.cu:181-280)."""

    def _scene(self):
        rng = np.random.RandomState(7)
        bc = np.zeros((16, 16, 4), np.uint8)
        bc[..., 3] = 255
        bc[:, :8, 0] = 255
        bc[:, 8:, 2] = 200
        bc[8:, :, 1] = 120
        mr = np.zeros((8, 8, 4), np.uint8)
        mr[..., 3] = 255
        mr[..., 1] = rng.randint(40, 220, (8, 8))
        mr[..., 2] = rng.randint(0, 255, (8, 8))
        em = np.zeros((4, 4, 4), np.uint8)
        em[..., 3] = 255
        em[2:, 2:, 0] = 255
        em[2:, 2:, 1] = 180
        mats = [
            Material(base_color_texture_id=0,
                     metallic_roughness_texture_id=1),
            Material(specular=0.0, emission_color=(1.0, 0.5, 0.2),
                     emission_texture_id=2),
        ]
        v, n, t, f = _quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
        v2, n2, t2, f2 = _quad(
            [-1, -1, -0.5], [1, -1, -0.5], [1, 1, -0.5], [-1, 1, -0.5]
        )
        return Scene(
            vertices=np.concatenate([v, v2]),
            normals=np.concatenate([n, n2]),
            texcoords=np.concatenate([t, t2]),
            indices=np.concatenate([f, f2 + len(v)]),
            material_ids=np.asarray([0, 0, 1, 1], np.int32),
            instance_ids=np.zeros((4,), np.int32),
            materials=mats,
            textures=[
                TextureImage(data=bc, is_srgb=True),
                TextureImage(data=mr, is_srgb=False),
                TextureImage(data=em, is_srgb=False),
            ],
            transforms=np.eye(4, dtype=np.float32)[None],
            submesh_offsets=[0],
            submesh_n_faces=[4],
        )

    def _render(self, fused, regen, spp=2):
        # width*height must be a multiple of 128 for the fused gate
        r = Renderer(width=32, height=32)
        r.use_pallas = False
        r.use_fused = fused
        r.use_regen = regen
        r.set_scene(self._scene())
        r.set_bg_color((0.3, 0.4, 0.5))
        r.camera.origin = np.asarray([0.0, 0.0, 1.5], np.float32)
        r.camera._update_transform()
        cfg = r._config(1, 3)
        assert cfg.use_fused == fused
        if fused:
            assert cfg.tex_kinds == (
                "base_color", "metallic_roughness", "emission"
            )
        r.render(n_samples=spp, max_depth=3)
        return {k: np.asarray(v) for k, v in r.layers.items()}

    def test_fused_and_regen_match_general(self):
        gen = self._render(False, False)
        fus = self._render(True, False)
        reg = self._render(True, True)
        for k in ("beauty", "albedo", "depth", "normal"):
            np.testing.assert_allclose(
                gen[k], fus[k], rtol=2e-4, atol=5e-4, err_msg="fused " + k
            )
            np.testing.assert_allclose(
                fus[k], reg[k], rtol=2e-4, atol=5e-4, err_msg="regen " + k
            )


class TestNormalMapping:
    def test_normal_map_tilts_shading_normal(self):
        # constant normal map pointing 45 degrees in tangent-u direction
        val = np.zeros((2, 2, 4), np.uint8)
        nrm = np.asarray([0.7071, 0.0, 0.7071])  # tangent-space (x, y, z)
        rgb = ((nrm * 0.5 + 0.5) * 255).astype(np.uint8)
        val[..., 0] = rgb[0]
        val[..., 1] = rgb[1]
        val[..., 2] = rgb[2]
        val[..., 3] = 255
        mat = Material(specular=0.0, normalmap_texture_id=0)
        sc = quad_scene([mat], [TextureImage(data=val, is_srgb=False)])
        r = front_renderer(sc)
        r.render(n_samples=1, max_depth=1)
        n = r.get_layer("normal")[8, 8]
        # without the map the normal is (0,0,1); with it, tilted in-plane
        assert abs(float(n[2]) - 1.0) > 0.2, n
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-3)

    def test_heightmap_changes_shading(self):
        # a ramp heightmap perturbs the frame; just verify it runs and the
        # first-hit normals deviate from the flat quad somewhere
        hm = np.zeros((8, 8, 4), np.uint8)
        hm[:, :, 0] = np.tile((np.arange(8) * 32).astype(np.uint8), (8, 1))
        hm[..., 3] = 255
        mat = Material(specular=0.0, heightmap_texture_id=0)
        sc = quad_scene([mat], [TextureImage(data=hm, is_srgb=False)])
        r = front_renderer(sc)
        r.render(n_samples=1, max_depth=1)
        n = r.get_layer("normal")
        inner = n[4:12, 4:12] if n.shape[0] >= 12 else n
        assert np.isfinite(n).all()


class TestEmissionTexture:
    def test_emissive_texture_lights_first_hit(self):
        tex = np.zeros((2, 2, 4), np.uint8)
        tex[..., 1] = 255  # green emission
        tex[..., 3] = 255
        mat = Material(
            specular=0.0,
            emission=1.0,
            emission_color=(0, 0, 0),
            emission_texture_id=0,
        )
        sc = quad_scene([mat], [TextureImage(data=tex, is_srgb=False)])
        r = front_renderer(sc)
        r.render(n_samples=2, max_depth=2)
        b = r.get_layer("beauty")[8, 8]
        assert float(b[1]) > 0.5 and float(b[0]) < 0.1, b


class TestAnimatedRefit:
    def test_transform_update_moves_geometry(self):
        # quad at origin; after a transform update it shifts out of frame
        mat = Material(specular=0.0)
        sc = quad_scene([mat], [])
        r = front_renderer(sc)
        r.set_bg_color((1.0, 0.0, 0.0))
        r.render(n_samples=1, max_depth=1)
        depth_before = float(np.asarray(r.layers["depth"]).max())
        assert depth_before > 0.5  # quad visible

        # move the instance far away and refresh the device scene (the
        # set_time path: transforms -> world verts -> BVH refit)
        from fredholm_tpu.scene.device import update_device_scene_transforms

        sc.transforms[0][0, 3] = 100.0
        r._dev = update_device_scene_transforms(r._dev)
        r.init_render_states()
        r.render(n_samples=1, max_depth=1)
        depth_after = float(np.asarray(r.layers["depth"]).max())
        assert depth_after == 0.0, depth_after  # nothing hit
        # background shows through
        b = r.get_layer("beauty")[8, 8]
        np.testing.assert_allclose(b, [1.0, 0.0, 0.0], atol=0.05)


class TestInstancing:
    def test_two_instances_of_one_quad(self):
        """Two instances of the same submesh with different transforms both
        render (IAS-analog path: per-face instance ids + transforms)."""
        v, n, t, f = _quad([-0.4, -0.4, 0], [0.4, -0.4, 0], [0.4, 0.4, 0], [-0.4, 0.4, 0])
        # duplicate faces referencing the same verts, second set instance 1
        faces = np.concatenate([f, f])
        transforms = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        transforms[0][0, 3] = -0.55
        transforms[1][0, 3] = 0.55
        sc = Scene(
            vertices=v,
            normals=n,
            texcoords=t,
            indices=faces,
            material_ids=np.asarray([0, 0, 1, 1], np.int32),
            instance_ids=np.asarray([0, 0, 1, 1], np.int32),
            materials=[
                Material(base_color=(1, 0, 0), specular=0.0,
                         emission=1.0, emission_color=(1, 0, 0)),
                Material(base_color=(0, 1, 0), specular=0.0,
                         emission=1.0, emission_color=(0, 1, 0)),
            ],
            textures=[],
            transforms=transforms,
            submesh_offsets=[0, 2],
            submesh_n_faces=[2, 2],
        )
        r = front_renderer(sc)
        r.render(n_samples=1, max_depth=1)
        img = r.get_layer("beauty")
        # one instance emits red, the other green (film x is flipped,
        # pt.cu:442, so +x lands on the left)
        left = img[8, 6]
        right = img[8, 9]
        assert float(left[0]) > 0.5 and float(left[1]) < 0.1, left
        assert float(right[1]) > 0.5 and float(right[0]) < 0.1, right


class TestPerturbFusedMatchesGeneral:
    """Normal/height-mapped scenes entered the fused envelope in round 5:
    the fused pipeline's in-gather fetch + elementwise perturbation
    (pt_fused.mega_body) must reproduce the general wavefront path's
    apply_normal_mapping (pt.cu:710-742 parity chain)."""

    def _nm_scene(self):
        # sine-ripple tangent-space normal map over a checker base color
        w = 16
        nm = np.zeros((w, w, 4), np.uint8)
        xs = np.arange(w) / w
        tilt = 0.45 * np.sin(2 * np.pi * xs * 2)
        nx = tilt[None, :].repeat(w, 0)
        nz = np.sqrt(1.0 - nx**2)
        nm[..., 0] = ((nx * 0.5 + 0.5) * 255).astype(np.uint8)
        nm[..., 1] = 127
        nm[..., 2] = ((nz * 0.5 + 0.5) * 255).astype(np.uint8)
        nm[..., 3] = 255
        bc = np.zeros((8, 8, 4), np.uint8)
        bc[..., 3] = 255
        bc[::2, :, 0] = 255
        bc[1::2, :, 1] = 255
        mat = Material(
            specular=0.3, specular_roughness=0.4,
            normalmap_texture_id=0, base_color_texture_id=1,
        )
        return quad_scene(
            [mat],
            [TextureImage(data=nm, is_srgb=False),
             TextureImage(data=bc, is_srgb=True)],
        )

    def _hm_scene(self):
        hm = np.zeros((8, 8, 4), np.uint8)
        hm[:, :, 0] = np.tile((np.arange(8) * 32).astype(np.uint8), (8, 1))
        hm[..., 3] = 255
        mat = Material(specular=0.2, heightmap_texture_id=0)
        return quad_scene([mat], [TextureImage(data=hm, is_srgb=False)])

    def _render(self, sc, fused, spp=2, depth=3):
        r = front_renderer(sc)
        r.use_fused = fused
        r.set_bg_color((0.3, 0.4, 0.5))
        cfg = r._config(1, depth)
        assert cfg.use_fused == fused  # normal maps no longer disqualify
        r.render(n_samples=spp, max_depth=depth)
        return {k: np.asarray(v) for k, v in r.layers.items()}

    @pytest.mark.parametrize("which", ["normalmap", "heightmap"])
    def test_fused_matches_general(self, which):
        sc = self._nm_scene() if which == "normalmap" else self._hm_scene()
        gen = self._render(sc, fused=False)
        fus = self._render(sc, fused=True)
        for k in ("beauty", "normal", "albedo", "depth"):
            np.testing.assert_allclose(
                gen[k], fus[k], rtol=2e-4, atol=5e-4,
                err_msg=f"{which} fused {k}",
            )


class TestAlphaFusedMatchesGeneral:
    """Alpha-cutout scenes entered the fused envelope in round 5: every
    fused trace routes through the alpha-aware re-trace loop
    (pt.cu:545-678 anyhit analog), so images must match the general
    wavefront path."""

    def _scene(self):
        # front quad with a checker alpha cutout over a solid back quad
        a = np.full((8, 8, 4), 255, np.uint8)
        a[::2, ::2, 0] = 0  # alpha texture reads channel 0
        a[1::2, 1::2, 0] = 0
        front = Material(specular=0.0, base_color=(0.9, 0.2, 0.2),
                         alpha_texture_id=0)
        back = Material(specular=0.0, base_color=(0.2, 0.2, 0.9))
        v, n, t, f = _quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
        v2, n2, t2, f2 = _quad(
            [-2, -2, -1], [2, -2, -1], [2, 2, -1], [-2, 2, -1]
        )
        return Scene(
            vertices=np.concatenate([v, v2]),
            normals=np.concatenate([n, n2]),
            texcoords=np.concatenate([t, t2]),
            indices=np.concatenate([f, f2 + len(v)]),
            material_ids=np.asarray([0, 0, 1, 1], np.int32),
            instance_ids=np.zeros((4,), np.int32),
            materials=[front, back],
            textures=[TextureImage(data=a, is_srgb=False)],
            transforms=np.eye(4, dtype=np.float32)[None],
            submesh_offsets=[0],
            submesh_n_faces=[4],
        )

    def test_fused_matches_general(self):
        outs = {}
        for fused in (False, True):
            r = front_renderer(self._scene())
            r.use_fused = fused
            r.set_bg_color((0.3, 0.4, 0.5))
            cfg = r._config(1, 3)
            assert cfg.has_alpha
            assert cfg.use_fused == fused  # alpha no longer disqualifies
            r.render(n_samples=2, max_depth=3)
            outs[fused] = {k: np.asarray(v) for k, v in r.layers.items()}
        for k in ("beauty", "depth", "albedo", "normal"):
            np.testing.assert_allclose(
                outs[False][k], outs[True][k], rtol=2e-4, atol=5e-4,
                err_msg="alpha fused " + k,
            )
