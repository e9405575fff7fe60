"""Host scene -> device SoA ("upload" step).

TPU-native analog of Renderer::load_scene + build_gas/build_ias
(/root/reference/fredholm/include/fredholm/renderer.h:354-552): instead of
OptiX accel structures we pre-transform every instanced face into world
space, build the threaded BVH over the flattened triangle soup, and pack
per-face attribute SoA so a hit shades with contiguous gathers by prim id.

`set_time`-style animation updates (renderer.h:614-640) re-run
`world_face_data` with new transforms and refit the BVH (topology is kept).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..accel.bvh import build_bvh, refit_bvh
from ..accel.cluster import build_tlas, extract_hierarchy, refit_hierarchy
from ..accel.pallas_clustered import prepare_clustered
from ..accel.pallas_dense import prepare_tri_soa
from ..accel.traverse import build_device_bvh
from .texture import pack_textures, texture_headers_np
from .types import Scene, materials_to_soa


def _affine_rows(m4: np.ndarray) -> np.ndarray:
    """4x4 -> [3, 4] row-major affine."""
    return np.asarray(m4, np.float32)[:3, :]


def world_face_data(scene: Scene) -> Dict[str, np.ndarray]:
    """Per-face world-space SoA: verts [F,3,3], normals [F,3,3], uvs
    [F,3,2]."""
    v = scene.vertices[scene.indices]  # [F, 3, 3] object space
    n = scene.normals[scene.indices]
    uv = scene.texcoords[scene.indices]

    o2w = np.asarray(scene.transforms, np.float32)  # [I, 4, 4]
    inst = scene.instance_ids
    m = o2w[inst]  # [F, 4, 4]
    vw = np.einsum("fij,fkj->fki", m[:, :3, :3], v) + m[:, None, :3, 3]
    m_inv = np.linalg.inv(o2w)[inst]  # [F, 4, 4]
    # normal transform: (M^-1)^T
    nw = np.einsum("fji,fkj->fki", m_inv[:, :3, :3], n)
    norm = np.linalg.norm(nw, axis=-1, keepdims=True)
    nw = nw / np.maximum(norm, 1e-12)
    return {
        "verts": vw.astype(np.float32),
        "normals": nw.astype(np.float32),
        "uvs": uv.astype(np.float32),
    }


# skip-link threading (6 orderings, Python preorder walks) and the dense
# tri SoA only pay off below these sizes; million-tri scenes always trace
# through the cluster hierarchy
SKIPLINK_MAX_FACES = 300_000
DENSE_MAX_FACES = 4_096


def _light_soa(lv, ln, luv, lmat) -> Dict[str, np.ndarray]:
    """World-space emissive-face SoA for NEE sampling (numpy).

    lv/ln: [L,3,3], luv: [L,3,2], lmat: [L]. Always at least one row so
    jit shapes stay static when a scene has no area lights."""
    n = max(len(lv), 1)
    out = {
        "light_verts": np.zeros((n, 3, 3), np.float32),
        "light_normals": np.zeros((n, 3, 3), np.float32),
        "light_uvs": np.zeros((n, 3, 2), np.float32),
        "light_mat": np.zeros((n,), np.int32),
    }
    if len(lv):
        out["light_verts"][:] = lv
        out["light_normals"][:] = ln
        out["light_uvs"][:] = luv
        out["light_mat"][:] = lmat
    return out


def build_device_scene(scene: Scene) -> Dict:
    """Full device scene dict consumed by the integrator.

    All attribute tables are assembled in NUMPY first and uploaded once at
    the end — building them from already-uploaded jax arrays round-trips
    every array through the device (measured 42 s of a 74 s build for a 1M
    triangle scene on the tunneled dev chip).
    """
    assert scene.is_valid(), "invalid scene"
    fd = world_face_data(scene)
    vw = fd["verts"]
    n_faces = int(scene.n_faces())

    v0 = vw[:, 0]
    e1 = vw[:, 1] - vw[:, 0]
    e2 = vw[:, 2] - vw[:, 0]
    lo = vw.min(axis=1)
    hi = vw.max(axis=1)
    with_links = n_faces <= SKIPLINK_MAX_FACES
    bvh = build_bvh(lo, hi, thread=with_links)

    mats = materials_to_soa(scene.materials)
    n_mats = len(scene.materials) if scene.materials else 1
    mat_ids = np.clip(scene.material_ids, 0, n_mats - 1).astype(np.int32)

    lights = scene.emissive_faces().astype(np.int32)

    # cluster hierarchy: baked geometry = one BLAS + one identity instance
    # (the TLAS analog; true N-instance mode arrives via instanced scenes)
    hier = extract_hierarchy(bvh, v0, e1, e2)
    tlas = build_tlas([hier], [(0, np.eye(4))])

    # explicit world-space light SoA: NEE sampling never gathers through
    # the (possibly object-space, instanced) face tables
    lsoa = _light_soa(
        fd["verts"][lights], fd["normals"][lights], fd["uvs"][lights],
        mat_ids[lights],
    )

    # numpy-first staging dict for the fused-table builders
    np_dev = {
        "face_verts": fd["verts"],
        "face_normals": fd["normals"],
        "face_uvs": fd["uvs"],
        "face_mat": mat_ids,
        "materials": mats,
        "tex_header": texture_headers_np(scene.textures),
        **lsoa,
    }
    from ..fused.pt_fused import (
        build_fused_mat_table,
        build_fused_table,
        build_light_table,
    )

    fused_table = build_fused_table(np_dev)
    fused_mat_table = build_fused_mat_table(np_dev)
    light_table = build_light_table(np_dev)

    dev = {
        "bvh": build_device_bvh(bvh, v0, e1, e2) if with_links else None,
        "clusters": prepare_clustered(tlas),
        "face_verts": jnp.asarray(fd["verts"]),
        "face_normals": jnp.asarray(fd["normals"]),
        "face_uvs": jnp.asarray(fd["uvs"]),
        "face_mat": jnp.asarray(mat_ids),
        "materials": {k: jnp.asarray(v) for k, v in mats.items()},
        "textures": pack_textures(scene.textures),
        "n_lights": int(lights.shape[0]),
        "n_faces": n_faces,
        "fused_table": jnp.asarray(fused_table),
        "fused_mat_table": jnp.asarray(fused_mat_table),
        "light_table": jnp.asarray(light_table),
        # host-only statics (underscore keys never enter traced pytrees)
        "_inst_identity": tlas.inst_identity,
        "_n_superclusters": tlas.n_superclusters,
        "_n_instances": tlas.n_instances,
    }
    dev.update({k: jnp.asarray(v) for k, v in lsoa.items()})
    dev.update(_maybe_slot_attrs(np_dev, tlas))
    if n_faces <= DENSE_MAX_FACES:
        dev["tri_soa"] = prepare_tri_soa(v0, e1, e2)
    # host-side handles for animation refresh
    dev["_host"] = {"scene": scene, "bvh": bvh, "hier": hier}
    return dev


def _maybe_slot_attrs(np_dev, tlas) -> dict:
    """Slot-ordered geometry attr blocks for the cluster-block fetch
    kernel (fused/slot_fetch.py) — built only when the scene would
    otherwise hit the catastrophic per-lane row gather (geometry table
    over ONEHOT_MAX_ROWS). FREDHOLM_SLOT_FETCH=0 disables (A/B)."""
    import os

    from ..core.gather import ONEHOT_MAX_ROWS
    from ..fused.slot_fetch import build_slot_attrs

    if os.environ.get("FREDHOLM_SLOT_FETCH", "1") == "0":
        return {}
    if np_dev["face_verts"].shape[0] <= ONEHOT_MAX_ROWS:
        return {}
    return {
        "slot_attrs": jnp.asarray(
            build_slot_attrs(np_dev, np.asarray(tlas.blocks[9]))
        )
    }


def update_device_scene_transforms(dev: Dict) -> Dict:
    """Refresh world-space data after scene.transforms changed
    (set_time analog, renderer.h:614-640). Returns an updated dict; BVH
    topology is kept and bounds are refit host-side."""
    host = dev["_host"]
    scene: Scene = host["scene"]
    bvh = host["bvh"]
    fd = world_face_data(scene)
    vw = fd["verts"]
    lo = vw.min(axis=1)
    hi = vw.max(axis=1)
    refit_bvh(bvh, lo, hi)
    v0 = vw[:, 0]
    e1 = vw[:, 1] - vw[:, 0]
    e2 = vw[:, 2] - vw[:, 0]
    new = dict(dev)
    if dev.get("bvh") is not None:
        new["bvh"] = build_device_bvh(bvh, v0, e1, e2)
    if "tri_soa" in dev:
        new["tri_soa"] = prepare_tri_soa(v0, e1, e2)
    # animation step keeps the cut topology and only refits bounds +
    # triangle data (the IAS/GAS refit analog, renderer.h:614-640) —
    # the full re-cut loops over every cluster in python and costs
    # seconds per frame on million-triangle scenes
    hier = host.get("hier")
    if hier is not None and hier.perm is not None:
        hier = refit_hierarchy(hier, bvh, v0, e1, e2)
    else:
        hier = extract_hierarchy(bvh, v0, e1, e2)
    host["hier"] = hier
    tlas = build_tlas([hier], [(0, np.eye(4))])
    new["clusters"] = prepare_clustered(tlas)
    new["face_verts"] = jnp.asarray(fd["verts"])
    new["face_normals"] = jnp.asarray(fd["normals"])
    new["face_uvs"] = jnp.asarray(fd["uvs"])
    host_scene = host["scene"]
    mat_ids = np.clip(
        host_scene.material_ids, 0, max(len(host_scene.materials), 1) - 1
    ).astype(np.int32)
    from ..fused.pt_fused import (
        build_fused_mat_table,
        build_fused_table,
        build_light_table,
    )

    lights = host_scene.emissive_faces().astype(np.int32)
    lsoa = _light_soa(
        fd["verts"][lights], fd["normals"][lights], fd["uvs"][lights],
        mat_ids[lights],
    )
    new.update({k: jnp.asarray(v) for k, v in lsoa.items()})

    # numpy-first (see build_device_scene): never read device arrays back
    np_dev = {
        "face_verts": fd["verts"],
        "face_normals": fd["normals"],
        "face_uvs": fd["uvs"],
        "face_mat": mat_ids,
        "materials": {k: np.asarray(v) for k, v in dev["materials"].items()},
        "tex_header": texture_headers_np(host_scene.textures),
        **lsoa,
    }
    new["fused_table"] = jnp.asarray(build_fused_table(np_dev))
    new["fused_mat_table"] = jnp.asarray(build_fused_mat_table(np_dev))
    new["light_table"] = jnp.asarray(build_light_table(np_dev))
    new.pop("slot_attrs", None)
    new.update(_maybe_slot_attrs(np_dev, tlas))
    return new


# ---------------------------------------------------------------------------
# instanced scenes: two-level TLAS/BLAS with shared geometry


def _instance_table(instances) -> np.ndarray:
    """[I, 24] float32 per-instance shade-time transforms: cols 0:12 the
    object-to-world affine [3,4] rows (vertices), cols 12:21 the normal
    matrix (inverse-transpose rotation), rest padding. Gathered per hit by
    instance id (a tiny one-hot matmul — I <= 1024)."""
    n = len(instances)
    out = np.zeros((n, 24), np.float32)
    for i, (_, m4) in enumerate(instances):
        m4 = np.asarray(m4, np.float64)
        out[i, 0:12] = m4[:3, :].reshape(-1).astype(np.float32)
        out[i, 12:21] = (
            np.linalg.inv(m4[:3, :3]).T.reshape(-1).astype(np.float32)
        )
    return out


def build_instanced_device_scene(iscene) -> Dict:
    """InstancedScene -> device dict: one BLAS per referenced submesh,
    TLAS instance table, OBJECT-space attribute tables indexed by the
    global base-scene face id the traversal reports, and a per-instance
    shade-time transform table.

    TPU-native analog of build_ias (renderer.h:498-552): device geometry
    is O(unique geometry); moving instances is an O(I) host update
    (`update_instance_transforms`), not an O(F) rebuild.
    """
    from .types import InstancedScene

    assert iscene.is_valid(), "invalid instanced scene"
    base = iscene.base
    fd = world_face_data(base)  # base transforms are normally identity
    vw = fd["verts"]
    n_faces = int(base.n_faces())

    v0 = vw[:, 0]
    e1 = vw[:, 1] - vw[:, 0]
    e2 = vw[:, 2] - vw[:, 0]

    mats = materials_to_soa(base.materials)
    n_mats = len(base.materials) if base.materials else 1
    mat_ids = np.clip(base.material_ids, 0, n_mats - 1).astype(np.int32)

    referenced = sorted({mi.submesh for mi in iscene.instances})
    blas_list = []
    blas_of_submesh = {}
    for s in referenced:
        off = int(base.submesh_offsets[s])
        cnt = int(base.submesh_n_faces[s])
        sl = slice(off, off + cnt)
        lo = np.minimum(np.minimum(v0[sl], v0[sl] + e1[sl]), v0[sl] + e2[sl])
        hi = np.maximum(np.maximum(v0[sl], v0[sl] + e1[sl]), v0[sl] + e2[sl])
        bvh = build_bvh(lo, hi, thread=False)
        blas_of_submesh[s] = len(blas_list)
        blas_list.append(
            extract_hierarchy(
                bvh, v0[sl], e1[sl], e2[sl],
                prim_ids=np.arange(off, off + cnt, dtype=np.int64),
            )
        )
    instances = [
        (blas_of_submesh[mi.submesh], np.asarray(mi.transform, np.float32))
        for mi in iscene.instances
    ]
    tlas = build_tlas(blas_list, instances)

    # world-space lights: every placed copy of an emissive face
    emissive = base.emissive_faces()
    lv, ln, luv, lm = [], [], [], []
    for s, m4 in [(mi.submesh, mi.transform) for mi in iscene.instances]:
        off = int(base.submesh_offsets[s])
        cnt = int(base.submesh_n_faces[s])
        le_f = emissive[(emissive >= off) & (emissive < off + cnt)]
        if len(le_f) == 0:
            continue
        m4 = np.asarray(m4, np.float32)
        r, t = m4[:3, :3], m4[:3, 3]
        nrm = np.linalg.inv(m4[:3, :3]).T.astype(np.float32)
        fv = fd["verts"][le_f]  # [l, 3, 3]
        fn = fd["normals"][le_f]
        wv = np.einsum("ij,fkj->fki", r, fv) + t
        wn = np.einsum("ij,fkj->fki", nrm, fn)
        wn = wn / np.maximum(
            np.linalg.norm(wn, axis=-1, keepdims=True), 1e-12
        )
        lv.append(wv.astype(np.float32))
        ln.append(wn.astype(np.float32))
        luv.append(fd["uvs"][le_f])
        lm.append(mat_ids[le_f])
    n_lights = sum(len(a) for a in lv)
    cat = (lambda xs, sh, dt: np.concatenate(xs) if xs
           else np.zeros(sh, dt))
    lsoa = _light_soa(
        cat(lv, (0, 3, 3), np.float32), cat(ln, (0, 3, 3), np.float32),
        cat(luv, (0, 3, 2), np.float32), cat(lm, (0,), np.int32),
    )

    np_dev = {
        "face_verts": fd["verts"],
        "face_normals": fd["normals"],
        "face_uvs": fd["uvs"],
        "face_mat": mat_ids,
        "materials": mats,
        "tex_header": texture_headers_np(base.textures),
        **lsoa,
    }
    from ..fused.pt_fused import (
        build_fused_mat_table,
        build_fused_table,
        build_light_table,
    )

    dev = {
        "bvh": None,
        "clusters": prepare_clustered(tlas),
        "inst_table": jnp.asarray(_instance_table(instances)),
        "face_verts": jnp.asarray(fd["verts"]),
        "face_normals": jnp.asarray(fd["normals"]),
        "face_uvs": jnp.asarray(fd["uvs"]),
        "face_mat": jnp.asarray(mat_ids),
        "materials": {k: jnp.asarray(v) for k, v in mats.items()},
        "textures": pack_textures(base.textures),
        "n_lights": int(n_lights),
        "n_faces": n_faces,
        "fused_table": jnp.asarray(build_fused_table(np_dev)),
        "fused_mat_table": jnp.asarray(build_fused_mat_table(np_dev)),
        "light_table": jnp.asarray(build_light_table(np_dev)),
        "_inst_identity": tlas.inst_identity,
        "_n_superclusters": tlas.n_superclusters,
        "_n_instances": tlas.n_instances,
        "_instanced": True,
    }
    dev.update({k: jnp.asarray(v) for k, v in lsoa.items()})
    dev.update(_maybe_slot_attrs(np_dev, tlas))
    dev["_host"] = {
        "scene": iscene,
        "blas_list": blas_list,
        "blas_of_submesh": blas_of_submesh,
        "fd": fd,
        "mat_ids": mat_ids,
    }
    return dev


def update_instance_transforms(dev: Dict, transforms) -> Dict:
    """Move instances without touching geometry: O(I) host work rebuilds
    only the TLAS instance arrays, the shade-time transform table, and the
    light list (set_time analog for instanced scenes, renderer.h:614-640).

    transforms: sequence of 4x4, one per instance (order preserved)."""
    host = dev["_host"]
    iscene = host["scene"]
    assert len(transforms) == len(iscene.instances)
    from .types import InstancedScene, MeshInstance

    new_scene = InstancedScene(
        base=iscene.base,
        instances=[
            MeshInstance(mi.submesh, np.asarray(m, np.float32))
            for mi, m in zip(iscene.instances, transforms)
        ],
    )
    from ..accel.cluster import update_tlas_instances

    instances = [
        (host["blas_of_submesh"][mi.submesh], mi.transform)
        for mi in new_scene.instances
    ]
    new = dict(dev)
    new["clusters"] = update_tlas_instances(
        dev["clusters"], host["blas_list"], instances
    )
    new["inst_table"] = jnp.asarray(_instance_table(instances))
    identity = all(
        np.allclose(m, np.eye(4), atol=1e-7) for _, m in instances
    )
    new["_inst_identity"] = identity

    # refresh world-space lights (O(#emissive x I))
    base = new_scene.base
    fd = host["fd"]
    mat_ids = host["mat_ids"]
    emissive = base.emissive_faces()
    lv, ln, luv, lm = [], [], [], []
    for mi in new_scene.instances:
        off = int(base.submesh_offsets[mi.submesh])
        cnt = int(base.submesh_n_faces[mi.submesh])
        le_f = emissive[(emissive >= off) & (emissive < off + cnt)]
        if len(le_f) == 0:
            continue
        m4 = np.asarray(mi.transform, np.float32)
        r, t = m4[:3, :3], m4[:3, 3]
        nrm = np.linalg.inv(m4[:3, :3]).T.astype(np.float32)
        wv = np.einsum("ij,fkj->fki", r, fd["verts"][le_f]) + t
        wn = np.einsum("ij,fkj->fki", nrm, fd["normals"][le_f])
        wn = wn / np.maximum(
            np.linalg.norm(wn, axis=-1, keepdims=True), 1e-12
        )
        lv.append(wv.astype(np.float32))
        ln.append(wn.astype(np.float32))
        luv.append(fd["uvs"][le_f])
        lm.append(mat_ids[le_f])
    cat = (lambda xs, sh, dt: np.concatenate(xs) if xs
           else np.zeros(sh, dt))
    lsoa = _light_soa(
        cat(lv, (0, 3, 3), np.float32), cat(ln, (0, 3, 3), np.float32),
        cat(luv, (0, 3, 2), np.float32), cat(lm, (0,), np.int32),
    )
    new.update({k: jnp.asarray(v) for k, v in lsoa.items()})
    from ..fused.pt_fused import build_light_table

    np_dev = {
        "materials": {k: np.asarray(v) for k, v in dev["materials"].items()},
        **lsoa,
    }
    new["light_table"] = jnp.asarray(build_light_table(np_dev))
    new["_host"] = {**host, "scene": new_scene}
    return new
