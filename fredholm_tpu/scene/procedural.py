"""Procedural test scenes.

The reference validates visually against a curated scene list
(/root/reference/app/controller.h:30-70): Cornell box, per-lobe sphere-array
material tests, and white-furnace energy tests. Those assets are not shipped
with the reference repo, so we generate equivalent scenes procedurally; the
same generators back the unit-test and benchmark suites.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .types import Material, Scene, TextureImage


def _merge_mesh(
    scenes_vertices, scenes_normals, scenes_texcoords, scenes_indices,
    scenes_mids,
):
    v_off = 0
    verts, norms, uvs, idxs, mids = [], [], [], [], []
    for v, n, t, i, m in zip(
        scenes_vertices, scenes_normals, scenes_texcoords, scenes_indices,
        scenes_mids,
    ):
        verts.append(v)
        norms.append(n)
        uvs.append(t)
        idxs.append(i + v_off)
        mids.append(m)
        v_off += len(v)
    return (
        np.concatenate(verts).astype(np.float32),
        np.concatenate(norms).astype(np.float32),
        np.concatenate(uvs).astype(np.float32),
        np.concatenate(idxs).astype(np.int32),
        np.concatenate(mids).astype(np.int32),
    )


def _quad(p0, p1, p2, p3):
    """Two triangles for a quad with a consistent normal; returns
    (verts[4,3], normals[4,3], uvs[4,2], faces[2,3])."""
    p0, p1, p2, p3 = [np.asarray(p, np.float32) for p in (p0, p1, p2, p3)]
    n = np.cross(p1 - p0, p3 - p0)
    n = n / max(np.linalg.norm(n), 1e-12)
    verts = np.stack([p0, p1, p2, p3])
    normals = np.tile(n, (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, normals, uvs, faces


def uv_sphere(center, radius, n_theta=16, n_phi=32):
    """UV sphere mesh; returns (verts, normals, uvs, faces)."""
    center = np.asarray(center, np.float32)
    thetas = np.linspace(0.0, np.pi, n_theta + 1)
    phis = np.linspace(0.0, 2.0 * np.pi, n_phi + 1)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.cos(tt)
    z = np.sin(tt) * np.sin(pp)
    normals = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    verts = center + radius * normals
    uvs = np.stack([pp / (2 * np.pi), tt / np.pi], -1).reshape(-1, 2)

    faces = []
    w = n_phi + 1
    for i in range(n_theta):
        for j in range(n_phi):
            a, b = i * w + j, i * w + j + 1
            c, d = (i + 1) * w + j, (i + 1) * w + j + 1
            if i > 0:
                faces.append([a, b, c])
            if i < n_theta - 1:
                faces.append([b, d, c])
    return (
        verts.astype(np.float32),
        normals,
        uvs.astype(np.float32),
        np.asarray(faces, np.int32),
    )


def cornell_box(light_le=(10.0, 10.0, 10.0)) -> Scene:
    """Classic Cornell box in [0,1]^3-ish coordinates, matching the standard
    CornellBox-Original layout the reference's scene list uses
    (controller.h:31)."""
    white = Material(base_color=(0.8, 0.8, 0.8), specular=0.0)
    red = Material(base_color=(0.8, 0.05, 0.05), specular=0.0)
    green = Material(base_color=(0.05, 0.8, 0.05), specular=0.0)
    light = Material(
        base_color=(0.8, 0.8, 0.8),
        specular=0.0,
        emission=1.0,
        emission_color=tuple(light_le),
    )
    materials = [white, red, green, light]

    parts = []  # (verts, normals, uvs, faces, material_id)

    def add_quad(p0, p1, p2, p3, mid):
        v, n, t, f = _quad(p0, p1, p2, p3)
        parts.append((v, n, t, f, np.full((len(f),), mid, np.int32)))

    s = 1.0
    # floor (y=0, normal +y)
    add_quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s], 0)
    # ceiling (y=2, normal -y)
    add_quad([-s, 2, -s], [s, 2, -s], [s, 2, s], [-s, 2, s], 0)
    # back wall (z=-1, normal +z)
    add_quad([-s, 0, -s], [s, 0, -s], [s, 2, -s], [-s, 2, -s], 0)
    # left wall (x=-1, red, normal +x)
    add_quad([-s, 0, s], [-s, 0, -s], [-s, 2, -s], [-s, 2, s], 1)
    # right wall (x=1, green, normal -x)
    add_quad([s, 0, -s], [s, 0, s], [s, 2, s], [s, 2, -s], 2)
    # area light near ceiling (normal -y)
    l = 0.4
    add_quad([-l, 1.98, -l], [l, 1.98, -l], [l, 1.98, l], [-l, 1.98, l], 3)

    # two boxes
    def add_box(center, size, ry, mid):
        cx, cy, cz = center
        sx, sy, sz = size
        c, sn = np.cos(ry), np.sin(ry)

        def rot(p):
            x, y, z = p
            return [cx + c * x + sn * z, cy + y, cz - sn * x + c * z]

        x0, x1 = -sx / 2, sx / 2
        y0, y1 = 0.0, sy
        z0, z1 = -sz / 2, sz / 2
        add_quad(rot([x0, y1, z0]), rot([x0, y1, z1]), rot([x1, y1, z1]), rot([x1, y1, z0]), mid)
        add_quad(rot([x0, y0, z1]), rot([x0, y0, z0]), rot([x1, y0, z0]), rot([x1, y0, z1]), mid)
        add_quad(rot([x0, y0, z1]), rot([x1, y0, z1]), rot([x1, y1, z1]), rot([x0, y1, z1]), mid)
        add_quad(rot([x1, y0, z0]), rot([x0, y0, z0]), rot([x0, y1, z0]), rot([x1, y1, z0]), mid)
        add_quad(rot([x1, y0, z1]), rot([x1, y0, z0]), rot([x1, y1, z0]), rot([x1, y1, z1]), mid)
        add_quad(rot([x0, y0, z0]), rot([x0, y0, z1]), rot([x0, y1, z1]), rot([x0, y1, z0]), mid)

    add_box([-0.35, 0.0, -0.35], [0.6, 1.2, 0.6], np.deg2rad(20), 0)
    add_box([0.4, 0.0, 0.35], [0.6, 0.6, 0.6], np.deg2rad(-17), 0)

    verts, norms, uvs, idxs, mids = _merge_mesh(
        [p[0] for p in parts],
        [p[1] for p in parts],
        [p[2] for p in parts],
        [p[3] for p in parts],
        [p[4] for p in parts],
    )
    n_faces = len(idxs)
    return Scene(
        vertices=verts,
        normals=norms,
        texcoords=uvs,
        indices=idxs,
        material_ids=mids,
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[n_faces],
    )


def sphere_array_test(
    param_name: str,
    values,
    base: Optional[Material] = None,
    radius: float = 0.45,
    spacing: float = 1.1,
    with_floor: bool = True,
) -> Scene:
    """Material-test scene: a row of spheres sweeping one material
    parameter, analog of the reference's `*_test/spheres_test_scene.obj`
    scenes (controller.h:44-55)."""
    import dataclasses as dc

    base = base or Material()
    materials: List[Material] = []
    parts = []
    n = len(values)
    for i, val in enumerate(values):
        m = dc.replace(base)
        setattr(m, param_name, val)
        materials.append(m)
        cx = (i - (n - 1) / 2.0) * spacing
        v, nn, t, f = uv_sphere([cx, radius, 0.0], radius)
        parts.append((v, nn, t, f, np.full((len(f),), i, np.int32)))

    if with_floor:
        materials.append(Material(base_color=(0.5, 0.5, 0.5), specular=0.0))
        s = n * spacing
        v, nn, t, f = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
        parts.append((v, nn, t, f, np.full((len(f),), n, np.int32)))

    verts, norms, uvs, idxs, mids = _merge_mesh(
        [p[0] for p in parts],
        [p[1] for p in parts],
        [p[2] for p in parts],
        [p[3] for p in parts],
        [p[4] for p in parts],
    )
    n_faces = len(idxs)
    return Scene(
        vertices=verts,
        normals=norms,
        texcoords=uvs,
        indices=idxs,
        material_ids=mids,
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[n_faces],
    )


def furnace_sphere(material: Material) -> Scene:
    """White-furnace test scene: a single sphere, lit only by a constant
    environment (controller.h:58-59 analog). A lossless material must
    disappear against the background."""
    v, n, t, f = uv_sphere([0.0, 0.0, 0.0], 1.0, n_theta=32, n_phi=64)
    n_faces = len(f)
    return Scene(
        vertices=v,
        normals=n,
        texcoords=t,
        indices=f,
        material_ids=np.zeros((n_faces,), np.int32),
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=[material],
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[n_faces],
    )


def terrain(n: int = 724, size: float = 20.0, amp: float = 1.8,
            material: Optional[Material] = None) -> Scene:
    """Million-triangle-class displaced terrain (2*n^2 tris; n=724 ~ 1.05M).

    The scale-test analog of the reference's San Miguel / Rungholt scenes
    (controller.h:31-43): one connected mesh with strong spatial coherence,
    exercising the cluster-hierarchy traversal well past the dense regime.
    Deterministic sum-of-sines displacement (no RNG, stable goldens).
    """
    xs = np.linspace(-size / 2, size / 2, n + 1, dtype=np.float32)
    zs = np.linspace(-size / 2, size / 2, n + 1, dtype=np.float32)
    x, z = np.meshgrid(xs, zs, indexing="ij")
    y = amp * (
        np.sin(0.7 * x) * np.cos(0.5 * z)
        + 0.45 * np.sin(2.3 * x + 1.0) * np.sin(1.9 * z + 0.5)
        + 0.18 * np.cos(6.1 * x + 2.0) * np.cos(5.7 * z + 1.2)
    ).astype(np.float32)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)

    # analytic gradient -> smooth shading normals
    dy_dx = amp * (
        0.7 * np.cos(0.7 * x) * np.cos(0.5 * z)
        + 0.45 * 2.3 * np.cos(2.3 * x + 1.0) * np.sin(1.9 * z + 0.5)
        - 0.18 * 6.1 * np.sin(6.1 * x + 2.0) * np.cos(5.7 * z + 1.2)
    )
    dy_dz = amp * (
        -0.5 * np.sin(0.7 * x) * np.sin(0.5 * z)
        + 0.45 * 1.9 * np.sin(2.3 * x + 1.0) * np.cos(1.9 * z + 0.5)
        - 0.18 * 5.7 * np.cos(6.1 * x + 2.0) * np.sin(5.7 * z + 1.2)
    )
    norms = np.stack(
        [-dy_dx, np.ones_like(y), -dy_dz], axis=-1
    ).reshape(-1, 3)
    norms = (norms / np.linalg.norm(norms, axis=-1, keepdims=True)).astype(
        np.float32
    )
    uvs = np.stack(
        [(x + size / 2) / size, (z + size / 2) / size], axis=-1
    ).reshape(-1, 2).astype(np.float32)

    # two triangles per grid cell
    i0 = (np.arange(n)[:, None] * (n + 1) + np.arange(n)[None, :]).ravel()
    a, b, c, d = i0, i0 + 1, i0 + n + 1, i0 + n + 2
    idxs = np.concatenate(
        [np.stack([a, b, d], -1), np.stack([a, d, c], -1)]
    ).astype(np.int32)

    n_faces = len(idxs)
    mat = material or Material(
        base_color=(0.55, 0.5, 0.42), specular=0.25, specular_roughness=0.5
    )
    return Scene(
        vertices=verts,
        normals=norms,
        texcoords=uvs,
        indices=idxs,
        material_ids=np.zeros((n_faces,), np.int32),
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=[mat],
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0],
        submesh_n_faces=[n_faces],
    )

def sphere_grid_test(
    param_x: str,
    values_x,
    param_y: str,
    values_y,
    base: Optional[Material] = None,
    radius: float = 0.4,
    spacing: float = 1.0,
) -> Scene:
    """2D material sweep: a grid of spheres varying param_x along columns
    and param_y along rows (MetalRoughSpheres.gltf analog,
    controller.h:60)."""
    import dataclasses as dc

    base = base or Material()
    materials: List[Material] = []
    parts = []
    nx, ny = len(values_x), len(values_y)
    for j, vy in enumerate(values_y):
        for i, vx in enumerate(values_x):
            m = dc.replace(base)
            setattr(m, param_x, vx)
            setattr(m, param_y, vy)
            materials.append(m)
            cx = (i - (nx - 1) / 2.0) * spacing
            cy = radius + j * spacing
            v, nn, t, f = uv_sphere([cx, cy, 0.0], radius)
            parts.append(
                (v, nn, t, f,
                 np.full((len(f),), j * nx + i, np.int32))
            )
    verts, norms, uvs, idxs, mids = _merge_mesh(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts],
        [p[3] for p in parts], [p[4] for p in parts],
    )
    n_faces = len(idxs)
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids, instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[n_faces],
    )


def instance_test(n: int = 4):
    """Small shared-BLAS instanced scene (instance_test.gltf analog,
    controller.h:63): one sphere+pedestal mesh instanced in a ring."""
    from .types import InstancedScene, MeshInstance

    v, nn, t, f = uv_sphere([0.0, 0.5, 0.0], 0.5, n_theta=16, n_phi=32)
    vq, nq, tq, fq = _quad(
        [-0.55, 0, -0.55], [-0.55, 0, 0.55], [0.55, 0, 0.55],
        [0.55, 0, -0.55],
    )
    verts, norms, uvs, idxs, mids = _merge_mesh(
        [v, vq], [nn, nq], [t, tq],
        [f, fq], [np.zeros((len(f),), np.int32),
                  np.ones((len(fq),), np.int32)],
    )
    n_faces = len(idxs)
    base = Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids, instance_ids=np.zeros((n_faces,), np.int32),
        materials=[
            Material(base_color=(0.8, 0.3, 0.2), specular=0.5,
                     specular_roughness=0.2),
            Material(base_color=(0.6, 0.6, 0.6), specular=0.0),
        ],
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[n_faces],
    )
    instances = []
    for k in range(n):
        a = 2.0 * np.pi * k / n
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 2.0 * np.cos(a)
        m[2, 3] = 2.0 * np.sin(a)
        instances.append(MeshInstance(0, m))
    return InstancedScene(base=base, instances=instances)


# -- texture-driven test scenes (controller.h:61-66 analogs) ----------------


def checker_texture(res: int = 64, n: int = 8,
                    c0=(240, 240, 240), c1=(30, 30, 160),
                    is_srgb: bool = True) -> TextureImage:
    """Procedural checkerboard TextureImage (stands in for the texture_test
    asset's image files, which the reference does not ship)."""
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    mask = ((xx * n // res) + (yy * n // res)) % 2 == 0
    img = np.empty((res, res, 4), np.uint8)
    img[..., :3] = np.where(mask[..., None], np.uint8(1), np.uint8(0)) * (
        np.asarray(c0, np.uint8) - np.asarray(c1, np.uint8)
    ) + np.asarray(c1, np.uint8)
    img[..., 3] = 255
    return TextureImage(data=img, is_srgb=is_srgb)


def _floor_sphere_scene(materials: List[Material], textures,
                        sphere_material_id: int = 0,
                        floor_material_id: int = 1) -> Scene:
    """Shared layout for the texture/normal-map tests: one sphere on a
    UV-mapped floor."""
    parts = []
    v, nn, t, f = uv_sphere([0.0, 0.55, 0.0], 0.55, n_theta=24, n_phi=48)
    parts.append((v, nn, t, f,
                  np.full((len(f),), sphere_material_id, np.int32)))
    s = 3.0
    v, nn, t, f = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    parts.append((v, nn, t, f,
                  np.full((len(f),), floor_material_id, np.int32)))
    verts, norms, uvs, idxs, mids = _merge_mesh(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts],
        [p[3] for p in parts], [p[4] for p in parts],
    )
    n_faces = len(idxs)
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids, instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials, textures=list(textures),
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[n_faces],
    )


def texture_test() -> Scene:
    """Base-color-texture scene (resources/texture_test analog,
    controller.h:61): checkered sphere + checkered floor."""
    tex = checker_texture()
    return _floor_sphere_scene(
        [Material(base_color_texture_id=0, specular=0.3),
         Material(base_color_texture_id=0, specular=0.0)],
        [tex],
    )


def normalmap_test() -> Scene:
    """Normal-map scene (resources/normalmap_test analog, controller.h:64):
    a sine-wave tangent-space normal map on sphere + floor."""
    res = 64
    yy, xx = np.meshgrid(
        np.linspace(0, 1, res, endpoint=False),
        np.linspace(0, 1, res, endpoint=False), indexing="ij",
    )
    # tangent-space normal tilting along u with a sine ripple
    nx = 0.55 * np.sin(2 * np.pi * 6 * xx)
    ny = 0.55 * np.sin(2 * np.pi * 6 * yy)
    nz = np.sqrt(np.clip(1.0 - nx * nx - ny * ny, 0.0, 1.0))
    img = np.empty((res, res, 4), np.uint8)
    img[..., 0] = np.uint8(np.clip((nx * 0.5 + 0.5) * 255, 0, 255))
    img[..., 1] = np.uint8(np.clip((ny * 0.5 + 0.5) * 255, 0, 255))
    img[..., 2] = np.uint8(np.clip((nz * 0.5 + 0.5) * 255, 0, 255))
    img[..., 3] = 255
    nm = TextureImage(data=img, is_srgb=False)
    return _floor_sphere_scene(
        [Material(specular=0.6, specular_roughness=0.15,
                  normalmap_texture_id=0),
         Material(specular=0.0, base_color=(0.6, 0.6, 0.6))],
        [nm],
    )


def emission_texture_test() -> Scene:
    """Emission-texture scene (resources/emission_texture_test analog,
    controller.h:66): an emissive checker panel lighting a diffuse sphere
    in an otherwise black environment."""
    tex = checker_texture(c0=(255, 255, 255), c1=(0, 0, 0), is_srgb=False)
    parts = []
    v, nn, t, f = uv_sphere([0.0, 0.55, 0.0], 0.55, n_theta=24, n_phi=48)
    parts.append((v, nn, t, f, np.zeros((len(f),), np.int32)))
    s = 2.0
    v, nn, t, f = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    parts.append((v, nn, t, f, np.ones((len(f),), np.int32)))
    # emissive panel hanging above, facing down
    v, nn, t, f = _quad([-1, 2.2, 1], [-1, 2.2, -1], [1, 2.2, -1], [1, 2.2, 1])
    parts.append((v, nn, t, f, np.full((len(f),), 2, np.int32)))
    verts, norms, uvs, idxs, mids = _merge_mesh(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts],
        [p[3] for p in parts], [p[4] for p in parts],
    )
    n_faces = len(idxs)
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids, instance_ids=np.zeros((n_faces,), np.int32),
        materials=[
            Material(specular=0.2, base_color=(0.8, 0.8, 0.8)),
            Material(specular=0.0, base_color=(0.5, 0.5, 0.5)),
            Material(diffuse=0.0, specular=0.0, emission=6.0,
                     emission_color=(1.0, 0.9, 0.7), emission_texture_id=0),
        ],
        textures=[tex],
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[n_faces],
    )


def instanced_tiles(grid: int = 4, tile_n: int = 570, size: float = 20.0):
    """>=10M-triangle scene class proof (San Miguel 10M analog,
    controller.h:39): a `grid` x `grid` sheet of displaced-terrain tile
    INSTANCES sharing one ~2*tile_n^2-triangle BLAS, traced through the
    two-level supercluster path. Defaults: 16 x 649,800 = 10.4M scene
    triangles with O(unique)=650k device memory."""
    from .types import InstancedScene, MeshInstance

    base = terrain(n=tile_n, size=size)
    instances = []
    half = (grid - 1) / 2.0
    for i in range(grid):
        for j in range(grid):
            # vary orientation: 90-degree y rotations keep the
            # heightfield a valid surface but break trivial coherence
            k = (i + 2 * j) % 4
            c, s = [(1, 0), (0, 1), (-1, 0), (0, -1)][k]
            m = np.eye(4, dtype=np.float32)
            m[0, 0], m[0, 2] = c, s
            m[2, 0], m[2, 2] = -s, c
            m[0, 3] = (i - half) * size
            m[2, 3] = (j - half) * size
            instances.append(MeshInstance(0, m))
    return InstancedScene(base=base, instances=instances)


def gradient_ibl(width: int = 128, height: int = 64,
                 sun_px=(32, 20), sun_le: float = 40.0) -> np.ndarray:
    """Small HDR environment map: vertical sky gradient + one bright patch
    (procedural stand-in for the reference's .hdr IBL assets). Float32
    [H, W, 3], lat-long layout."""
    v = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None]
    sky = np.stack(
        [0.35 + 0.25 * (1 - v), 0.5 + 0.3 * (1 - v), 0.9 - 0.25 * v],
        axis=-1,
    ) * np.ones((height, width, 3), np.float32)
    sky[height // 2:] *= 0.25  # darker lower hemisphere
    y, x = sun_px[1], sun_px[0]
    sky[max(0, y - 2): y + 3, max(0, x - 2): x + 3] = sun_le
    return sky


def _leaf_texture(res: int = 64) -> TextureImage:
    """Foliage card texture: green leaf clusters with alpha cutout holes
    (procedural stand-in for the reference's foliage assets — drives the
    anyhit alpha path, pt.cu:545-678)."""
    rng = np.random.default_rng(11)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, res, endpoint=False),
        np.linspace(0, 1, res, endpoint=False), indexing="ij",
    )
    alpha = np.zeros((res, res), np.float32)
    shade = np.zeros((res, res), np.float32)
    for _ in range(26):
        cx, cy = rng.random(2)
        rx = 0.05 + 0.10 * rng.random()
        ry = 0.03 + 0.06 * rng.random()
        th = rng.random() * np.pi
        dx, dy = xx - cx, yy - cy
        u = np.cos(th) * dx + np.sin(th) * dy
        v = -np.sin(th) * dx + np.cos(th) * dy
        inside = (u / rx) ** 2 + (v / ry) ** 2 < 1.0
        alpha = np.maximum(alpha, inside.astype(np.float32))
        shade = np.where(inside, 0.35 + 0.65 * rng.random(), shade)
    img = np.empty((res, res, 4), np.uint8)
    img[..., 0] = np.uint8(30 + 40 * shade)
    img[..., 1] = np.uint8(70 + 130 * shade)
    img[..., 2] = np.uint8(25 + 35 * shade)
    img[..., 3] = np.uint8(alpha * 255)
    return TextureImage(data=img, is_srgb=True)


def _dirt_textures(res: int = 128):
    """Terrain base-color + tangent-space normal map (deterministic
    sum-of-sines 'dirt' pattern)."""
    yy, xx = np.meshgrid(
        np.linspace(0, 1, res, endpoint=False),
        np.linspace(0, 1, res, endpoint=False), indexing="ij",
    )
    h = (
        0.5
        + 0.22 * np.sin(2 * np.pi * (7 * xx + 3 * yy))
        + 0.18 * np.sin(2 * np.pi * (2 * xx - 9 * yy) + 1.3)
        + 0.10 * np.sin(2 * np.pi * (17 * xx + 13 * yy) + 0.4)
    )
    bc = np.empty((res, res, 4), np.uint8)
    bc[..., 0] = np.uint8(np.clip(120 + 70 * h, 0, 255))
    bc[..., 1] = np.uint8(np.clip(95 + 55 * h, 0, 255))
    bc[..., 2] = np.uint8(np.clip(60 + 40 * h, 0, 255))
    bc[..., 3] = 255
    # normal map from the analytic gradient of h
    dhx = (
        0.22 * 7 * np.cos(2 * np.pi * (7 * xx + 3 * yy))
        + 0.18 * 2 * np.cos(2 * np.pi * (2 * xx - 9 * yy) + 1.3)
        + 0.10 * 17 * np.cos(2 * np.pi * (17 * xx + 13 * yy) + 0.4)
    ) * 2 * np.pi * 0.035
    dhy = (
        0.22 * 3 * np.cos(2 * np.pi * (7 * xx + 3 * yy))
        - 0.18 * 9 * np.cos(2 * np.pi * (2 * xx - 9 * yy) + 1.3)
        + 0.10 * 13 * np.cos(2 * np.pi * (17 * xx + 13 * yy) + 0.4)
    ) * 2 * np.pi * 0.035
    nx = np.clip(-dhx, -0.8, 0.8)
    ny = np.clip(-dhy, -0.8, 0.8)
    nz = np.sqrt(np.clip(1.0 - nx * nx - ny * ny, 0.0, 1.0))
    nm = np.empty((res, res, 4), np.uint8)
    nm[..., 0] = np.uint8(np.clip((nx * 0.5 + 0.5) * 255, 0, 255))
    nm[..., 1] = np.uint8(np.clip((ny * 0.5 + 0.5) * 255, 0, 255))
    nm[..., 2] = np.uint8(np.clip((nz * 0.5 + 0.5) * 255, 0, 255))
    nm[..., 3] = 255
    return (TextureImage(data=bc, is_srgb=True),
            TextureImage(data=nm, is_srgb=False))


def hero(terrain_n: int = 360, n_trees: int = 40, n_rocks: int = 24):
    """The 'everything-on' composite scene (rtcamp8.cpp:47-303 analog):
    textured + normal-mapped terrain, alpha-cutout foliage, shared-BLAS
    instanced trees/rocks, emissive lanterns, metallic-roughness-textured
    rocks — meant for Hosek sun + thin-lens DOF + denoise through
    render_cli. Returns an InstancedScene (TLAS/BLAS two-level).

    Submeshes of the base scene: 0 = terrain (2*terrain_n^2 tris),
    1 = tree (trunk + crossed alpha foliage cards), 2 = rock,
    3 = lantern (emissive). Deterministic placements (seeded RNG).
    """
    from .types import InstancedScene, MeshInstance

    leaf = _leaf_texture()
    dirt_bc, dirt_nm = _dirt_textures()
    mr_res = 32
    yy, xx = np.meshgrid(np.arange(mr_res), np.arange(mr_res),
                         indexing="ij")
    mr = np.empty((mr_res, mr_res, 4), np.uint8)
    mr[..., 0] = 0
    mr[..., 1] = np.uint8(60 + 160 * ((xx // 4 + yy // 4) % 2))  # roughness
    mr[..., 2] = np.uint8(255 * ((yy // 8) % 2))                 # metalness
    mr[..., 3] = 255
    rock_mr = TextureImage(data=mr, is_srgb=False)
    textures = [leaf, dirt_bc, dirt_nm, rock_mr]

    materials = [
        Material(base_color_texture_id=1, normalmap_texture_id=2,
                 specular=0.3, specular_roughness=0.6),       # 0 terrain
        Material(base_color=(0.36, 0.24, 0.14), specular=0.15,
                 specular_roughness=0.7),                     # 1 trunk
        Material(base_color_texture_id=0, specular=0.1,
                 specular_roughness=0.6, thin_walled=1.0,
                 subsurface=0.35,
                 subsurface_color=(0.3, 0.6, 0.25)),          # 2 foliage
        Material(base_color=(0.6, 0.6, 0.62), specular=0.9,
                 metallic_roughness_texture_id=3),            # 3 rock
        Material(base_color=(0.2, 0.2, 0.2), emission=1.0,
                 emission_color=(14.0, 9.0, 4.0)),            # 4 lantern
    ]

    size = 26.0
    base_terrain = terrain(n=terrain_n, size=size, amp=1.2)

    parts_v = [base_terrain.vertices]
    parts_n = [base_terrain.normals]
    parts_uv = [base_terrain.texcoords]
    parts_f = [base_terrain.indices]
    parts_m = [np.zeros((len(base_terrain.indices),), np.int32)]

    def add_part(v, nn, t, f, mid):
        parts_v.append(v.astype(np.float32))
        parts_n.append(nn.astype(np.float32))
        parts_uv.append(t.astype(np.float32))
        parts_f.append(f)
        parts_m.append(np.full((len(f),), mid, np.int32))

    n_before = [len(base_terrain.indices)]

    # --- tree: tapered trunk (scaled sphere) + 3 crossed foliage cards
    v, nn, t, f = uv_sphere([0.0, 0.0, 0.0], 1.0, n_theta=8, n_phi=12)
    tv = v.copy()
    tv[:, 0] *= 0.12
    tv[:, 2] *= 0.12
    tv[:, 1] = tv[:, 1] * 1.1 + 1.1  # 0..2.2 trunk
    add_part(tv, nn, t, f, 1)
    rngq = np.random.default_rng(5)
    for k in range(3):
        th = k * np.pi / 3
        c, s = np.cos(th), np.sin(th)
        w, h0, h1 = 1.5, 1.2, 3.3
        quad = np.asarray(
            [[-w * c, h0, -w * s], [w * c, h0, w * s],
             [w * c, h1, w * s], [-w * c, h1, -w * s]], np.float32)
        qv, qn, qt, qf = _quad(*quad)
        add_part(qv, qn, qt, qf, 2)
    n_before.append(sum(len(f) for f in parts_f))

    # --- rock: squashed low-res sphere
    v, nn, t, f = uv_sphere([0.0, 0.0, 0.0], 1.0, n_theta=10, n_phi=16)
    rv = v.copy()
    rv[:, 1] = rv[:, 1] * 0.55 + 0.4
    add_part(rv, nn, t, f, 3)
    n_before.append(sum(len(f) for f in parts_f))

    # --- lantern: two emissive panels (n_lights = emissive faces must
    # stay <= 16 across all instances for the fused in-kernel light table)
    e = 0.12
    for q in (
        [[-e, 0, -e], [e, 0, -e], [e, 2 * e, -e], [-e, 2 * e, -e]],
        [[e, 0, e], [-e, 0, e], [-e, 2 * e, e], [e, 2 * e, e]],
    ):
        qv, qn, qt, qf = _quad(*[np.asarray(p, np.float32) for p in q])
        add_part(qv, qn, qt, qf, 4)
    n_total_faces = None

    verts, norms, uvs, idxs, mids = _merge_mesh(
        parts_v, parts_n, parts_uv, parts_f, parts_m
    )
    n_total_faces = len(idxs)
    offsets = [0, n_before[0], n_before[1], n_before[2]]
    counts = [
        n_before[0],
        n_before[1] - n_before[0],
        n_before[2] - n_before[1],
        n_total_faces - n_before[2],
    ]
    base = Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids,
        instance_ids=np.zeros((n_total_faces,), np.int32),
        materials=materials, textures=textures,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=offsets, submesh_n_faces=counts,
    )

    # terrain height (matches terrain()'s displacement) for placements
    def ground_y(x, z, amp=1.2):
        return amp * (
            np.sin(0.7 * x) * np.cos(0.5 * z)
            + 0.45 * np.sin(2.3 * x + 1.0) * np.sin(1.9 * z + 0.5)
            + 0.18 * np.cos(6.1 * x + 2.0) * np.cos(5.7 * z + 1.2)
        )

    rng = np.random.default_rng(7)
    instances = [MeshInstance(0, np.eye(4, dtype=np.float32))]

    def place(submesh, n, s_lo, s_hi, margin=0.88, y_off=0.0):
        for _ in range(n):
            x = (rng.random() * 2 - 1) * size / 2 * margin
            z = (rng.random() * 2 - 1) * size / 2 * margin
            s = s_lo + (s_hi - s_lo) * rng.random()
            th = rng.random() * 2 * np.pi
            c, si = np.cos(th), np.sin(th)
            m = np.eye(4, dtype=np.float32)
            m[0, 0], m[0, 2] = s * c, s * si
            m[2, 0], m[2, 2] = -s * si, s * c
            m[1, 1] = s
            m[0, 3], m[2, 3] = x, z
            m[1, 3] = ground_y(x, z) + y_off
            instances.append(MeshInstance(submesh, m))

    place(1, n_trees, 0.7, 1.4)
    place(2, n_rocks, 0.3, 0.9)
    place(3, 3, 1.0, 1.0, margin=0.3, y_off=0.6)
    return InstancedScene(base=base, instances=instances)
