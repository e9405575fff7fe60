"""Pallas fused dense ray-triangle intersection.

Speed-of-light TPU replacement for `optixTrace` on small/medium scenes
(/root/reference/fredholm/modules/pt.cu:82-123). Each program instance owns
a [8, 128] = 1024-ray register tile (rays on both sublanes and lanes) and
loops over triangles held in SMEM as scalars; every Moller-Trumbore test is
a handful of scalar-broadcast VPU ops on the whole tile, and the running
closest hit lives in registers. HBM traffic is exactly rays-once +
outputs-once; triangles are read from SMEM. No [rays x tris] intermediates
exist anywhere — unlike the jnp dense path which materializes them in HBM.

Scaling: work is O(N_rays * N_tris), so this is the right kernel below a
few thousand triangles (the BVH path takes over beyond that).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# large ray tiles amortize the per-program and per-loop-iteration overhead;
# VMEM use ~= 12 arrays * SUBLANES * 128 * 4B ~= 6 MB at 1024 sublanes
SUBLANES = 512
RAY_TILE = LANES * SUBLANES  # rays per program


def _pad_rows(x: np.ndarray, m: int, value=0.0):
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    return np.concatenate([x, np.full((pad,) + x.shape[1:], value, x.dtype)])


def prepare_tri_soa(tri_v0, tri_e1, tri_e2) -> Dict:
    """Triangle SoA as [1, F] float32 rows for SMEM residency."""
    comps = {}
    for name, arr in (("v0", tri_v0), ("e1", tri_e1), ("e2", tri_e2)):
        arr = np.asarray(arr, np.float32)
        for c, ax in enumerate("xyz"):
            comps[f"{name}{ax}"] = jnp.asarray(arr[:, c][None, :])
    return comps


_TRI_KEYS = (
    "v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z",
)


def _mt_one(tri, s, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of the ray tile against scalar triangle s."""
    v0x = tri["v0x"][0, s]
    v0y = tri["v0y"][0, s]
    v0z = tri["v0z"][0, s]
    e1x = tri["e1x"][0, s]
    e1y = tri["e1y"][0, s]
    e1z = tri["e1z"][0, s]
    e2x = tri["e2x"][0, s]
    e2y = tri["e2y"][0, s]
    e2z = tri["e2z"][0, s]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, valid


def _closest_kernel(n_tris: int, o_ref, d_ref, tmax_ref, *rest):
    tri = dict(zip(_TRI_KEYS, rest[:9]))
    t_out, prim_out, u_out, v_out = rest[9:13]

    tmax = tmax_ref[:]
    t_out[:] = tmax
    prim_out[:] = jnp.full(tmax.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros_like(tmax)
    v_out[:] = jnp.zeros_like(tmax)

    # wavefront compaction, TPU form: dead lanes carry tmax < 0 and are
    # pixel-coherent (RR kills / misses cluster in screen space), so whole
    # ray tiles go dead together — skip the entire triangle sweep for them
    @pl.when(jnp.any(tmax > 0.0))
    def _():
        ox = o_ref[0]  # [SUBLANES, 128]
        oy = o_ref[1]
        oz = o_ref[2]
        dx = d_ref[0]
        dy = d_ref[1]
        dz = d_ref[2]

        best_t = tmax
        best_prim = jnp.full(best_t.shape, -1.0, jnp.float32)
        best_u = jnp.zeros_like(best_t)
        best_v = jnp.zeros_like(best_t)

        def body(s, carry):
            best_t, best_prim, best_u, best_v = carry
            t, u, v, valid = _mt_one(tri, s, ox, oy, oz, dx, dy, dz)
            improved = valid & (t < best_t)
            best_t = jnp.where(improved, t, best_t)
            best_prim = jnp.where(improved, s.astype(jnp.float32), best_prim)
            best_u = jnp.where(improved, u, best_u)
            best_v = jnp.where(improved, v, best_v)
            return best_t, best_prim, best_u, best_v

        best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
            0, n_tris, body, (best_t, best_prim, best_u, best_v)
        )
        t_out[:] = best_t
        prim_out[:] = best_prim.astype(jnp.int32)
        u_out[:] = best_u
        v_out[:] = best_v


def _any_kernel(n_tris: int, o_ref, d_ref, tmax_ref, *rest):
    tri = dict(zip(_TRI_KEYS, rest[:9]))
    occ_out = rest[9]

    tlim = tmax_ref[:]
    occ_out[:] = jnp.zeros(tlim.shape, jnp.bool_)

    # skip all-dead ray tiles (see _closest_kernel)
    @pl.when(jnp.any(tlim > 0.0))
    def _():
        ox = o_ref[0]
        oy = o_ref[1]
        oz = o_ref[2]
        dx = d_ref[0]
        dy = d_ref[1]
        dz = d_ref[2]

        # NOTE: bool [8,128] carries crash the mosaic scf lowering; carry f32
        def body(s, occ):
            t, _, _, valid = _mt_one(tri, s, ox, oy, oz, dx, dy, dz)
            return jnp.maximum(occ, (valid & (t < tlim)).astype(jnp.float32))

        occ = jax.lax.fori_loop(
            0, n_tris, body, jnp.zeros_like(tlim)
        )
        occ_out[:] = occ > 0.0


def _ray_tiles(o, d, t_max, n_pad):
    """Pack rays as [3, rows, 128] transposes + tmax [rows, 128].

    Kernel-launch overhead dominates on this backend (~1 ms each), so the
    wrapper must emit as few ops as possible: one transpose per vector
    (padding only when n is not tile-aligned) instead of seven
    strided-slice/pad kernels.
    """
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n != n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad - n, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((n_pad - n, 3), d.dtype)])
        t_max = jnp.concatenate(
            [t_max, jnp.zeros((n_pad - n,), t_max.dtype)]
        )
    rows = n_pad // LANES
    o_t = o.T.reshape(3, rows, LANES)
    d_t = d.T.reshape(3, rows, LANES)
    return o_t, d_t, t_max.reshape(rows, LANES)


def _specs(n_pad: int, f: int):
    vec_spec = pl.BlockSpec(
        (3, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (1, f), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    grid = (n_pad // RAY_TILE,)
    return grid, vec_spec, ray_spec, tri_spec


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _closest_call(o_t, d_t, tmax_t, tris, n_tris: int):
    n_pad = o_t.shape[1] * LANES
    f = tris[0].shape[1]
    grid, vec_spec, ray_spec, tri_spec = _specs(n_pad, f)
    rows = n_pad // LANES
    out_shapes = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    kernel = functools.partial(_closest_kernel, n_tris)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, ray_spec] + [tri_spec] * 9,
        out_specs=[ray_spec] * 4,
        out_shape=out_shapes,
    )(o_t, d_t, tmax_t, *tris)


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _any_call(o_t, d_t, tmax_t, tris, n_tris: int):
    n_pad = o_t.shape[1] * LANES
    f = tris[0].shape[1]
    grid, vec_spec, ray_spec, tri_spec = _specs(n_pad, f)
    rows = n_pad // LANES
    kernel = functools.partial(_any_kernel, n_tris)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, ray_spec] + [tri_spec] * 9,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.bool_),
    )(o_t, d_t, tmax_t, *tris)


def _component_tiles(ox, oy, oz, n_pad):
    """Pack component arrays [N] into [3, rows, 128] with padding — no
    [N, 3] interleave, just free reshapes + one concat (the fused pipeline
    keeps ray state in component SoA, so this avoids a real transpose)."""
    n = ox.shape[0]
    comps = []
    for c in (ox, oy, oz):
        if n != n_pad:
            c = jnp.concatenate([c, jnp.zeros((n_pad - n,), c.dtype)])
        comps.append(c.reshape(1, n_pad // LANES, LANES))
    return jnp.concatenate(comps, axis=0)


def intersect_closest_pallas_c(tris: Dict, o, d, t_max):
    """Component-SoA entry: o, d are (x, y, z) triples of [N] arrays;
    t_max is [N]. Returns the same hit dict as intersect_closest_pallas."""
    n = o[0].shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    o_t = _component_tiles(*o, n_pad)
    d_t = _component_tiles(*d, n_pad)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n != n_pad:
        t_max_p = jnp.concatenate(
            [t_max, jnp.zeros((n_pad - n,), t_max.dtype)]
        )
    else:
        t_max_p = t_max
    tmax_t = t_max_p.reshape(n_pad // LANES, LANES)
    tri_list = [tris[k] for k in _TRI_KEYS]
    t, prim, u, v = _closest_call(o_t, d_t, tmax_t, tri_list,
                                  tri_list[0].shape[1])
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    miss = prim < 0
    return {
        "t": jnp.where(miss, t_max, t),
        "prim": prim,
        "u": u.reshape(-1)[:n],
        "v": v.reshape(-1)[:n],
        "hit": ~miss,
    }


def intersect_closest_pallas(tris: Dict, o, d, t_max):
    """Closest hit via the fused kernel. tris: prepare_tri_soa output."""
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    o_t, d_t, tmax_t = _ray_tiles(o, d, t_max, n_pad)
    tri_list = [tris[k] for k in _TRI_KEYS]
    n_tris = tri_list[0].shape[1]  # static
    t, prim, u, v = _closest_call(o_t, d_t, tmax_t, tri_list, n_tris)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    miss = prim < 0
    return {
        "t": jnp.where(miss, t_max_b, t),
        "prim": prim,
        "u": u.reshape(-1)[:n],
        "v": v.reshape(-1)[:n],
        "hit": ~miss,
    }


def intersect_any_pallas_c(tris: Dict, o, d, t_max):
    """Component-SoA any-hit entry (see intersect_closest_pallas_c):
    o, d are (x, y, z) triples of [N] arrays; returns occluded [N] bool."""
    n = o[0].shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    o_t = _component_tiles(*o, n_pad)
    d_t = _component_tiles(*d, n_pad)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n != n_pad:
        t_max = jnp.concatenate([t_max, jnp.zeros((n_pad - n,), t_max.dtype)])
    tmax_t = t_max.reshape(n_pad // LANES, LANES)
    tri_list = [tris[k] for k in _TRI_KEYS]
    occ = _any_call(o_t, d_t, tmax_t, tri_list, tri_list[0].shape[1])
    return occ.reshape(-1)[:n]


def intersect_any_pallas(tris: Dict, o, d, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    o_t, d_t, tmax_t = _ray_tiles(o, d, t_max, n_pad)
    tri_list = [tris[k] for k in _TRI_KEYS]
    occ = _any_call(o_t, d_t, tmax_t, tri_list, tri_list[0].shape[1])
    return occ.reshape(-1)[:n]
