"""Two-level clustered ray traversal in Pallas.

The large-scene replacement for OptiX BVH traversal
(/root/reference/fredholm/include/fredholm/renderer.h:434-552 GAS/IAS +
optixTrace): a predicated linear sweep over BVH treelets.

Per program instance (one [SUBLANES, 128] ray tile):
  for each cluster c (treelet of <= 256 triangles, accel/cluster.py):
    - slab-test the tile against c's AABB (scalars from SMEM) with the
      CURRENT per-ray best t as tmax -> tile-level hit predicate
    - @pl.when(any hit): DMA c's triangle block HBM -> SMEM (one [10, 256]
      copy) and run the scalar-broadcast Moller-Trumbore sweep, updating
      the running best hit held in VMEM scratch

Ray coherence within a tile makes most cluster tests fail, so the expensive
inner sweep runs only for the handful of treelets a tile actually overlaps —
the same work-saving a per-ray tree walk gives, but with zero per-lane
control flow and only sequential, aligned DMA.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import CLUSTER_SIZE, Clusters, TRI_COMPONENTS

LANES = 128
SUBLANES = 64  # 8k rays per program instance: smaller tiles cull better
RAY_TILE = LANES * SUBLANES

_HBM_SPACE = getattr(pltpu, "HBM", pltpu.ANY)


def prepare_clustered(clusters: Clusters) -> Dict:
    """Device arrays for the kernels."""
    return {
        # [6, K] SMEM scalars: lo.xyz, hi.xyz
        "aabbs": jnp.asarray(
            np.concatenate([clusters.aabb_lo.T, clusters.aabb_hi.T], axis=0)
        ),
        "counts": jnp.asarray(clusters.counts.astype(np.int32)),
        "blocks": jnp.asarray(clusters.blocks),  # [10, K*256] in HBM
    }


def _slab_test(c, aabbs_ref, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best):
    lo_x = aabbs_ref[0, c]
    lo_y = aabbs_ref[1, c]
    lo_z = aabbs_ref[2, c]
    hi_x = aabbs_ref[3, c]
    hi_y = aabbs_ref[4, c]
    hi_z = aabbs_ref[5, c]
    t1x = (lo_x - ox) * inv_dx
    t2x = (hi_x - ox) * inv_dx
    t1y = (lo_y - oy) * inv_dy
    t2y = (hi_y - oy) * inv_dy
    t1z = (lo_z - oz) * inv_dz
    t2z = (hi_z - oz) * inv_dz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return (tn <= tf) & (tf >= 0.0) & (tn <= t_best)


def _mt_scalar(smem, i, ox, oy, oz, dx, dy, dz):
    v0x = smem[0, i]
    v0y = smem[1, i]
    v0z = smem[2, i]
    e1x = smem[3, i]
    e1y = smem[4, i]
    e1z = smem[5, i]
    e2x = smem[6, i]
    e2y = smem[7, i]
    e2z = smem[8, i]
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


def _make_kernel(n_clusters: int, any_hit: bool):
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               aabbs_ref, counts_ref, blocks_hbm,
               t_out, prim_out, u_out, v_out,
               best_t, best_prim, best_u, best_v, smem, sem):
        tmax = tmax_ref[:]
        alive = tmax > 0.0

        best_t[:] = tmax
        best_prim[:] = jnp.full(tmax.shape, -1.0, jnp.float32)
        best_u[:] = jnp.zeros(tmax.shape, jnp.float32)
        best_v[:] = jnp.zeros(tmax.shape, jnp.float32)

        # wavefront compaction, TPU form: dead lanes (tmax < 0, from RR
        # kills / misses) are pixel-coherent, so tiles go dead together —
        # skip the whole cluster sweep when no lane is alive
        @pl.when(jnp.any(alive))
        def _sweep():
            ox = ox_ref[:]
            oy = oy_ref[:]
            oz = oz_ref[:]
            dx = dx_ref[:]
            dy = dy_ref[:]
            dz = dz_ref[:]

            eps = 1e-12
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

            def cluster_body(c, _):
                box_hit = alive & _slab_test(
                    c, aabbs_ref, ox, oy, oz, inv_dx, inv_dy, inv_dz,
                    best_t[:],
                )
                if any_hit:
                    # lanes already occluded need no more work
                    box_hit = box_hit & (best_prim[:] < 0.0)

                @pl.when(jnp.any(box_hit))
                def _():
                    dma = pltpu.make_async_copy(
                        blocks_hbm.at[:, pl.ds(c * CLUSTER_SIZE, CLUSTER_SIZE)],
                        smem,
                        sem,
                    )
                    dma.start()
                    dma.wait()
                    count = counts_ref[c]

                    def tri_body(i, _):
                        t, u, v, valid = _mt_scalar(smem, i, ox, oy, oz, dx, dy, dz)
                        improved = valid & (t < best_t[:])
                        if any_hit:
                            hit_any = improved
                            best_prim[:] = jnp.where(
                                hit_any, smem[9, i], best_prim[:]
                            )
                        else:
                            best_prim[:] = jnp.where(
                                improved, smem[9, i], best_prim[:]
                            )
                            best_u[:] = jnp.where(improved, u, best_u[:])
                            best_v[:] = jnp.where(improved, v, best_v[:])
                            best_t[:] = jnp.where(improved, t, best_t[:])
                        return 0

                    jax.lax.fori_loop(0, count, tri_body, 0)

                return 0

            jax.lax.fori_loop(0, n_clusters, cluster_body, 0)

        t_out[:] = best_t[:]
        prim_out[:] = best_prim[:].astype(jnp.int32)
        u_out[:] = best_u[:]
        v_out[:] = best_v[:]

    return kernel


def _ray_tiles(o, d, t_max, n_pad):
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tiles = []
    for arr in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max):
        a = jnp.zeros((n_pad,), jnp.float32).at[:n].set(arr)
        tiles.append(a.reshape(-1, LANES))
    return tiles


@functools.partial(jax.jit, static_argnames=("n_clusters", "any_hit"))
def _call(tiles, aabbs, counts, blocks, n_clusters: int, any_hit: bool):
    n_pad = tiles[0].shape[0] * LANES
    rows = n_pad // LANES
    sub = min(SUBLANES, rows)
    grid = (rows // sub,)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = _make_kernel(n_clusters, any_hit)
    out_shapes = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aabbs [6, K]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts [K]
            pl.BlockSpec(memory_space=_HBM_SPACE),  # blocks [16, K*256]
        ],
        out_specs=[ray_spec] * 4,
        out_shape=out_shapes,
        # CPU (tests) runs the kernel in the pallas interpreter
        interpret=jax.default_backend() == "cpu",
        scratch_shapes=[
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.SMEM((TRI_COMPONENTS, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(*tiles, aabbs, counts, blocks)


def intersect_closest_clustered(dev_c: Dict, o, d, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE if n >= RAY_TILE else -(-n // LANES) * LANES
    tiles = _ray_tiles(o, d, t_max, n_pad)
    k = dev_c["counts"].shape[0]
    t, prim, u, v = _call(
        tiles, dev_c["aabbs"], dev_c["counts"], dev_c["blocks"], k, False
    )
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


def intersect_any_clustered(dev_c: Dict, o, d, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE if n >= RAY_TILE else -(-n // LANES) * LANES
    tiles = _ray_tiles(o, d, t_max, n_pad)
    k = dev_c["counts"].shape[0]
    _, prim, _, _ = _call(
        tiles, dev_c["aabbs"], dev_c["counts"], dev_c["blocks"], k, True
    )
    return (prim.reshape(-1)[:n]) >= 0
