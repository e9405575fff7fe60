"""Cluster-block attribute fetch keyed by hit SLOT.

THE large-scene shading wall (PERF.md round 5): for geometry tables over
~2k rows the per-hit attribute fetch falls back to XLA's per-lane HBM
row gather — the slowest primitive on this hardware — and dominates the
render (sub-window gating made the isolated traversal 1.5x faster with
NO end-to-end change). This module replaces it with a TPU-shaped fetch:

- scene build lays the per-face geometry attributes out in TRAVERSAL
  SLOT order ([SLOT_ROWS, K*CLUSTER_SIZE] f32, the blocks layout):
  slot = cid*CLUSTER_SIZE + in-cluster index, exactly what the closest
  traversal kernel now reports per hit.
- a Pallas kernel walks each [SUB, 128] ray tile's DISTINCT hit
  clusters (min-reduction loop), DMAs one 16 KB attr block per cluster
  HBM -> VMEM, and resolves that cluster's lanes with per-row
  `take_along_axis` lane shuffles (Mosaic's tile gather: out[s, l] =
  row[local[s, l]]). Pixel-coherent tiles hit FEW distinct clusters, so
  the cost is a handful of DMAs + shuffles per tile instead of N
  irregular HBM touches.

Row layout mirrors pt_fused._GEOM_COL_NAMES exactly, so the fetch
drops into _gather_attrs as the geometry stage; the material stage
(one-hot over M materials) is unchanged.

Reference analog: OptiX hit-attribute fetch from the SBT record
(pt.cu:140-180 fill_surface_info inputs).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.cluster import CLUSTER_SIZE
from ..accel.pallas_clustered import _HBM_SPACE

LANES = 128
SUB = 16                 # ray-tile sublanes (matches the traversal tile)
A_USED = 26              # v0,v1,v2,n0,n1,n2 (18) uv0-2 (6) area, mat_id
SLOT_ROWS = 32           # padded for clean [32, 128] DMA blocks
_BIG = np.int32(2**30)


def build_slot_attrs(np_dev: Dict, blocks_row9) -> np.ndarray:
    """[SLOT_ROWS, n_slots] f32 attr table in slot order.

    blocks_row9: tlas.blocks[9] — the slot -> global face id map the
    traversal reports (-1 for pad slots)."""
    prim = np.asarray(blocks_row9)
    n_slots = prim.shape[0]
    filled = prim >= 0
    p = np.where(filled, prim, 0).astype(np.int64)
    fv = np.asarray(np_dev["face_verts"])[p]      # [S, 3, 3]
    fn = np.asarray(np_dev["face_normals"])[p]
    fuv = np.asarray(np_dev["face_uvs"])[p]
    mid = np.asarray(np_dev["face_mat"])[p]
    e1 = fv[:, 1] - fv[:, 0]
    e2 = fv[:, 2] - fv[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    out = np.zeros((SLOT_ROWS, n_slots), np.float32)
    m = filled
    out[0:9] = np.where(m, fv.reshape(n_slots, 9).T, 0.0)
    out[9:18] = np.where(m, fn.reshape(n_slots, 9).T, 0.0)
    out[18:24] = np.where(m, fuv.reshape(n_slots, 6).T, 0.0)
    out[24] = np.where(m, area, 0.0)
    out[25] = np.where(m, mid.astype(np.float32), 0.0)
    return out


def _make_kernel(n_attr: int):
    def kernel(slot_ref, attr_hbm, *rest):
        outs = rest[:n_attr]
        blk, sem = rest[n_attr:]

        slot = slot_ref[:]
        valid = slot >= 0
        for o in outs:
            o[:] = jnp.zeros(slot.shape, jnp.float32)

        # remaining-cluster mask: resolved lanes park at _BIG
        cid0 = jnp.where(valid, slot // CLUSTER_SIZE, _BIG)

        def cond(cidm):
            return jnp.min(cidm) < _BIG

        def body(cidm):
            c = jnp.min(cidm)  # next unresolved cluster (scalar)
            dma = pltpu.make_async_copy(
                attr_hbm.at[:, pl.ds(c * CLUSTER_SIZE, CLUSTER_SIZE)],
                blk, sem,
            )
            dma.start()
            dma.wait()
            sel = cidm == c
            local = jnp.where(sel, slot - c * CLUSTER_SIZE, 0)
            table = blk[:]  # [SLOT_ROWS, 128] VMEM value
            for a in range(n_attr):
                # row a broadcast over sublanes, then a per-lane lane
                # shuffle: val[s, l] = table[a, local[s, l]]
                row = jnp.broadcast_to(table[a:a + 1, :], slot.shape)
                val = jnp.take_along_axis(
                    row, local, axis=1,
                    mode="promise_in_bounds",
                )
                outs[a][:] = jnp.where(sel, val, outs[a][:])
            return jnp.where(sel, _BIG, cidm)

        jax.lax.while_loop(cond, body, cid0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_attr",))
def _call(slot_tiles, attr_hbm, n_attr: int):
    rows = slot_tiles.shape[0]
    sub = min(SUB, rows)
    grid = (rows // sub,)
    tile = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(n_attr),
        grid=grid,
        in_specs=[tile, pl.BlockSpec(memory_space=_HBM_SPACE)],
        out_specs=[tile] * n_attr,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                   for _ in range(n_attr)],
        interpret=jax.default_backend() == "cpu",
        scratch_shapes=[
            pltpu.VMEM((SLOT_ROWS, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(slot_tiles, attr_hbm)


def fetch_geom_by_slot(dev: Dict, slot) -> Dict:
    """Geometry-attribute planes for [N] hit slots (-1 = miss -> zeros).

    Returns {col_index: [N] f32} in pt_fused geometry-column order —
    drop-in for the geometry half of _gather_attrs."""
    n = slot.shape[0]
    rows = -(-n // LANES)
    pad_rows = -(-rows // SUB) * SUB if rows >= SUB else rows
    st = jnp.full((pad_rows * LANES,), -1, jnp.int32).at[:n].set(
        slot.astype(jnp.int32)
    ).reshape(pad_rows, LANES)
    planes = _call(st, dev["slot_attrs"], A_USED)
    return {c: planes[c].reshape(-1)[:n] for c in range(A_USED)}
