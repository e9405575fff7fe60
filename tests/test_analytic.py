"""Absolute ground truth: renderer vs CLOSED-FORM radiance.

The golden suite locks regressions but is self-referential (VERDICT
round-1 weak #9); the furnace test is the only absolute check. This adds
a second, independent one: direct lighting of a Lambertian floor by an
axis-aligned rectangular area light has a classical closed form (the
point-to-rectangle form factor), so every floor pixel's radiance is
computable analytically from its position AOV:

  L = (diffuse * base_color / pi) * Le * F(P)

with F the exact rectangle form-factor integral. Rendered with NEE at
max_depth=1 (direct only, no sky), the Monte-Carlo mean over the floor
must match the formula to ~1%.
"""

import numpy as np

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import _merge_mesh, _quad
from fredholm_tpu.scene.types import Material, Scene

# light rectangle [±A] x [±B] at height H, emitting DOWN with radiance LE
A, B, H = 0.8, 0.6, 2.5
LE = np.array([4.0, 3.0, 2.0], np.float32)
ALBEDO = np.array([0.6, 0.5, 0.4], np.float32)


def _form_factor(px, pz, py=0.0):
    """Exact form factor from a point at (px, py, pz) (floor, normal +y)
    to the rectangle [-A, A] x [-B, B] at height H (facing down).

    Decompose the rectangle into four corner-anchored sub-rectangles
    around the point's vertical projection and sum the standard corner
    formula F = (1/2pi)[ a/sqrt(1+a^2) atan(b/sqrt(1+a^2))
                       + b/sqrt(1+b^2) atan(a/sqrt(1+b^2)) ].
    """
    h = H - py

    def corner(a, b):
        if a <= 0 or b <= 0:
            return 0.0
        a, b = a / h, b / h
        ra = np.sqrt(1 + a * a)
        rb = np.sqrt(1 + b * b)
        return (
            a / ra * np.arctan(b / ra) + b / rb * np.arctan(a / rb)
        ) / (2 * np.pi)

    # signed splits (point projection may lie outside the rectangle)
    x0, x1 = -A - px, A - px
    z0, z1 = -B - pz, B - pz

    def side(lo, hi):
        # contributions of [lo, hi] split at 0 with inclusion-exclusion
        if lo >= 0:
            return [(hi, +1), (lo, -1)]
        if hi <= 0:
            return [(-lo, +1), (-hi, -1)]
        return [(hi, +1), (-lo, +1)]

    f = 0.0
    for xa, sx in side(x0, x1):
        for zb, sz in side(z0, z1):
            f += sx * sz * corner(xa, zb)
    return f


def _scene():
    mats = [
        Material(
            base_color=tuple(ALBEDO), diffuse=1.0, specular=0.0
        ),
        Material(
            base_color=(0.0, 0.0, 0.0), diffuse=0.0, specular=0.0,
            emission=1.0, emission_color=tuple(LE),
        ),
    ]
    s = 50.0  # floor much larger than the view
    floor = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    # light winding so the normal faces DOWN (toward the floor)
    light = _quad([-A, H, B], [-A, H, -B], [A, H, -B], [A, H, B])
    verts, norms, uvs, idxs, mid = _merge_mesh(
        [floor[0], light[0]], [floor[1], light[1]],
        [floor[2], light[2]], [floor[3], light[3]],
        [np.zeros(2, np.int32), np.ones(2, np.int32)],
    )
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mid,
        instance_ids=np.zeros((len(idxs),), np.int32),
        materials=mats,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[len(idxs)],
    )


def test_direct_lighting_matches_closed_form():
    W = Hh = 64
    r = Renderer(width=W, height=Hh)
    r.set_scene(_scene())
    # look down at the floor from the side so the light is out of frame
    r.camera.origin = np.asarray([2.5, 2.0, 2.5], np.float32)
    r.camera.look_around(np.deg2rad(35.0), -0.9)
    r.camera._update_transform()
    r.render(n_samples=192, max_depth=1)

    beauty = np.asarray(r.get_layer("beauty")).reshape(Hh, W, 3)
    pos = np.asarray(r.get_layer("position")).reshape(Hh, W, 3)
    depth = np.asarray(r.get_layer("depth")).reshape(Hh, W)

    floor_mask = (depth > 0) & (np.abs(pos[..., 1]) < 1e-3)
    assert floor_mask.sum() > 1000, "camera setup: floor not visible"

    ff = np.zeros(floor_mask.sum())
    pts = pos[floor_mask]
    for i, p in enumerate(pts):
        ff[i] = _form_factor(p[0], p[2])
    expected = ALBEDO[None, :] * LE[None, :] * ff[:, None]
    got = beauty[floor_mask]

    # MC mean over >1000 pixels x 192 NEE samples: ~1%
    rel = np.abs(got.mean(0) - expected.mean(0)) / expected.mean(0)
    assert (rel < 0.015).all(), f"per-channel relative error {rel}"
    # and pointwise (noisier): 90th percentile within 10%
    per_pix = np.abs(got - expected).sum(-1) / expected.sum(-1)
    assert np.quantile(per_pix, 0.9) < 0.1
