"""Ray-resident, geometry-streamed traversal for INCOHERENT dispatches.

The ordered per-tile kernel (pallas_clustered.py) is DMA-redundancy bound
on bounce rays: an incoherent [16, 128] tile visits ~2/3 of all
superclusters, so each of the ~72 tiles in a 147k-lane dispatch re-DMAs
most of the cluster meta (4 KB x ~354/tile, ~89 ms) and a large share of
the triangle blocks (~71 ms) — per-transfer issue cost ~3.5 us is the
floor (PERF.md round-3 DMA microprobe). This kernel inverts the loops:

  ALL ray tiles of the dispatch stay RESIDENT in VMEM scratch
  (R_SUB x 128 lanes, ~8 MB at 1152 sublanes), and the geometry is
  streamed over them ONCE — meta in [16, 128]-column chunks (128
  clusters each), triangle blocks in P_CL-cluster pages (32 KB) gated
  by the resident sub-tiles' interest.

Stream order is cid order, which is supercluster build order (spatially
coherent); per-lane best-t tightening still prunes later pages the same
way the ordered kernel's gates do (verified by tools/sim_stream_order.py
— see PERF.md round 4). Replaces the same reference machinery as
pallas_clustered.py (OptiX GAS traversal, renderer.h:434-552); the
ordered kernel remains the coherent-dispatch (primary/shadow) path.

Identity-transform scenes only (flattened/baked geometry): instanced
scenes keep the ordered kernel, whose per-instance object-space
transform this kernel does not carry.

Known inefficiency (kept as-is — the kernel is chip-rejected and
quarantined): _rows_for pads dispatches just over a super-block
boundary to a full R_SUB multiple (up to ~2x padded lanes); padded
lanes are gated off per sub-tile, so it is wasted DMA/gate work, not
wrongness.

Layout (prepare_resident):
  res_meta [16, K_pad]  dense-by-cid cluster meta, HBM. Rows 0-5 cluster
                        AABB (lo.xyz, hi.xyz), row 6 tri count, rows
                        8-13 PAGE AABB (union of the page's P_CL
                        clusters) stored at the page's first cid column.
  blocks   [16, K*128]  the existing triangle SoA (shared, unchanged).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.cluster import CLUSTER_SIZE, N_TRI_GROUPS, TRI_COMPONENTS, TRI_GROUP
from ..accel.pallas_clustered import _HBM_SPACE, _inv_dir, _mt_scalar, _slab

LANES = 128
SUB = 16                     # sub-tile sublanes (gate granularity)
P_CL = int(_os.environ.get("FREDHOLM_RES_PCL", "4"))   # clusters per page
CHUNK = 128                  # meta columns per chunk (one [16,128] DMA)
PAGES_PER_CHUNK = CHUNK // P_CL
# resident ray super-block: sublanes held in VMEM at once. 1152 x 128
# lanes x (7 in + 4 out + 3 inv) f32 ~ 8.3 MB of the ~16 MB VMEM.
R_SUB = int(_os.environ.get("FREDHOLM_RES_SUB", "1152"))
assert R_SUB % SUB == 0 and CHUNK % P_CL == 0


def prepare_resident(tlas) -> Dict:
    """Dense-by-cid meta table (see module docstring). The triangle
    blocks are shared with prepare_clustered's dict."""
    from ..accel.cluster import SC_GROUP

    k_total = int(tlas.blocks.shape[1] // CLUSTER_SIZE)
    k_pad = -(-k_total // CHUNK) * CHUNK
    meta = np.zeros((16, k_pad), np.float32)
    meta[0:3] = 1e30
    meta[3:6] = -1e30
    meta[8:11] = 1e30
    meta[11:14] = -1e30
    s_total = tlas.sc_aabb.shape[1]
    for s in range(s_total):
        base = s * SC_GROUP
        mc = int(tlas.sc_mcount[s])
        cids = tlas.cl_meta[7, base:base + mc].astype(np.int64)
        meta[0:7, cids] = tlas.cl_meta[0:7, base:base + mc]
    # page AABBs at the first cid column of each page
    lo = meta[0:3, :].reshape(3, -1, P_CL)
    hi = meta[3:6, :].reshape(3, -1, P_CL)
    first = np.arange(0, k_pad, P_CL)
    meta[8:11, first] = lo.min(2)
    meta[11:14, first] = hi.max(2)
    out = {"res_meta": jnp.asarray(meta)}
    if k_total % P_CL:
        # the last page's block DMA reads P_CL*CLUSTER_SIZE columns from
        # cid0*CLUSTER_SIZE — out of bounds when k_total isn't a P_CL
        # multiple (unclamped OOB HBM read on hardware). Carry a padded
        # copy of the triangle blocks for this kernel; pad clusters are
        # harmless (empty meta AABBs never pass a gate, tri count 0).
        pad = (-k_total % P_CL) * CLUSTER_SIZE
        out["res_blocks"] = jnp.asarray(
            np.pad(np.asarray(tlas.blocks), ((0, 0), (0, pad)))
        )
    return out


def _make_kernel(n_chunks: int, n_sub: int, r_sub: int, any_hit: bool):
    def kernel(ox_h, oy_h, oz_h, dx_h, dy_h, dz_h, tm_h,
               root, meta_h, blocks_h,
               t_out, prim_out, u_out, v_out,
               rox, roy, roz, rdx, rdy, rdz, rtm, rix, riy, riz,
               bt, bp, bu, bv,
               meta, smem, flags, sem_r, sem_m, sem_b):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _load():
            for src, dst in ((ox_h, rox), (oy_h, roy), (oz_h, roz),
                             (dx_h, rdx), (dy_h, rdy), (dz_h, rdz),
                             (tm_h, rtm)):
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(i * r_sub, r_sub), :], dst, sem_r)
                cp.start()
                cp.wait()
            ix, iy, iz = _inv_dir(rdx[:], rdy[:], rdz[:])
            rix[:] = ix
            riy[:] = iy
            riz[:] = iz
            # root-box exit clamp (pallas_clustered.py kernel, same rule)
            t1x = (root[0, 0] - rox[:]) * ix
            t2x = (root[3, 0] - rox[:]) * ix
            t1y = (root[1, 0] - roy[:]) * iy
            t2y = (root[4, 0] - roy[:]) * iy
            t1z = (root[2, 0] - roz[:]) * iz
            t2z = (root[5, 0] - roz[:]) * iz
            rtn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            rtf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            clamp = jnp.where((rtn <= rtf) & (rtf >= 0.0),
                              rtf * 1.0001 + 1e-4, 0.0)
            bt[:] = jnp.minimum(rtm[:], clamp)
            bp[:] = jnp.full(bt.shape, -1.0, jnp.float32)
            bu[:] = jnp.zeros(bt.shape, jnp.float32)
            bv[:] = jnp.zeros(bt.shape, jnp.float32)

        dma_m = pltpu.make_async_copy(
            meta_h.at[:, pl.ds(j * CHUNK, CHUNK)], meta, sem_m)
        dma_m.start()
        dma_m.wait()

        def page_body(p, _):
            col0 = p * P_CL

            # per-sub-tile page-interest flags in SMEM (NOT packed into an
            # int32 — n_sub is up to 72 and shifts >= 32 silently wrap on
            # hardware; caught by the real-chip probe, round 4)
            def sub_gate(st, n_hit):
                r = pl.ds(st * SUB, SUB)
                tb = bt[r, :]
                alive = rtm[r, :] > 0.0
                phit = alive & _slab(
                    meta[8, col0], meta[9, col0], meta[10, col0],
                    meta[11, col0], meta[12, col0], meta[13, col0],
                    rox[r, :], roy[r, :], roz[r, :],
                    rix[r, :], riy[r, :], riz[r, :], tb,
                )
                if any_hit:
                    phit = phit & (bp[r, :] < 0.0)
                f = jnp.any(phit).astype(jnp.int32)
                flags[0, st] = f
                return n_hit + f

            n_hit = jax.lax.fori_loop(0, n_sub, sub_gate, jnp.int32(0))

            @pl.when(n_hit > 0)
            def _page():
                cid0 = j * CHUNK + col0
                dma_b = pltpu.make_async_copy(
                    blocks_h.at[
                        :, pl.ds(cid0 * CLUSTER_SIZE,
                                 P_CL * CLUSTER_SIZE)],
                    smem, sem_b)
                dma_b.start()
                dma_b.wait()

                def sub_sweep(st, _):
                    @pl.when(flags[0, st] == 1)
                    def _st():
                        r = pl.ds(st * SUB, SUB)
                        ox = rox[r, :]
                        oy = roy[r, :]
                        oz = roz[r, :]
                        dx = rdx[r, :]
                        dy = rdy[r, :]
                        dz = rdz[r, :]
                        inv = (rix[r, :], riy[r, :], riz[r, :])
                        alive = rtm[r, :] > 0.0

                        def cl_body(c, _):
                            chit = alive & _slab(
                                meta[0, col0 + c], meta[1, col0 + c],
                                meta[2, col0 + c], meta[3, col0 + c],
                                meta[4, col0 + c], meta[5, col0 + c],
                                ox, oy, oz, *inv, bt[r, :],
                            )
                            if any_hit:
                                chit = chit & (bp[r, :] < 0.0)

                            @pl.when(jnp.any(chit))
                            def _sweep():
                                cnt = meta[6, col0 + c].astype(jnp.int32)
                                cb = c * CLUSTER_SIZE

                                def grp_sweep(g):
                                    base = cb + g * TRI_GROUP
                                    gt = bt[r, :]
                                    gp = bp[r, :]
                                    if not any_hit:
                                        gu = bu[r, :]
                                        gv = bv[r, :]
                                    for k in range(TRI_GROUP):
                                        kk = base + k
                                        t, u, v, valid = _mt_scalar(
                                            smem, kk, ox, oy, oz,
                                            dx, dy, dz)
                                        improved = (
                                            valid & (t < gt)
                                            & (g * TRI_GROUP + k < cnt)
                                        )
                                        gp = jnp.where(
                                            improved, smem[9, kk], gp)
                                        if not any_hit:
                                            gu = jnp.where(improved, u, gu)
                                            gv = jnp.where(improved, v, gv)
                                            gt = jnp.where(improved, t, gt)
                                    bp[r, :] = gp
                                    if not any_hit:
                                        bu[r, :] = gu
                                        bv[r, :] = gv
                                        bt[r, :] = gt

                                for g in range(N_TRI_GROUPS):
                                    ghit = _slab(
                                        smem[10, cb + g], smem[11, cb + g],
                                        smem[12, cb + g], smem[13, cb + g],
                                        smem[14, cb + g], smem[15, cb + g],
                                        ox, oy, oz, *inv, bt[r, :],
                                    )
                                    if any_hit:
                                        ghit = ghit & (bp[r, :] < 0.0)
                                    pl.when(
                                        jnp.any(ghit)
                                        & (g * TRI_GROUP < cnt)
                                    )(lambda g=g: grp_sweep(g))

                            return 0

                        jax.lax.fori_loop(0, P_CL, cl_body, 0)

                    return 0

                jax.lax.fori_loop(0, n_sub, sub_sweep, 0)

            return 0

        jax.lax.fori_loop(0, PAGES_PER_CHUNK, page_body, 0)

        @pl.when(j == n_chunks - 1)
        def _store():
            for src, dst in ((bt, t_out), (bp, prim_out),
                             (bu, u_out), (bv, v_out)):
                cp = pltpu.make_async_copy(
                    src, dst.at[pl.ds(i * r_sub, r_sub), :], sem_r)
                cp.start()
                cp.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _call(tiles, dev_c, any_hit: bool):
    rows = tiles[0].shape[0]
    r_sub = min(R_SUB, rows)
    n_blocks = -(-rows // r_sub)
    meta = dev_c["res_meta"]
    n_chunks = meta.shape[1] // CHUNK
    kernel = _make_kernel(n_chunks, r_sub // SUB, r_sub, any_hit)
    hbm = pl.BlockSpec(memory_space=_HBM_SPACE)
    out_shapes = [jax.ShapeDtypeStruct((n_blocks * r_sub, LANES),
                                       jnp.float32) for _ in range(4)]
    res = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[hbm] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]  # root_aabb [6, 8]
        + [hbm] * 2,
        out_specs=[hbm] * 4,
        out_shape=out_shapes,
        interpret=jax.default_backend() == "cpu",
        scratch_shapes=(
            [pltpu.VMEM((r_sub, LANES), jnp.float32) for _ in range(14)]
            + [
                pltpu.SMEM((16, CHUNK), jnp.float32),
                pltpu.SMEM((TRI_COMPONENTS, P_CL * CLUSTER_SIZE),
                           jnp.float32),
                pltpu.SMEM((1, r_sub // SUB), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
        ),
    )(*tiles, dev_c["root_aabb"], meta,
      dev_c.get("res_blocks", dev_c["blocks"]))
    return res


def _ray_planes(o, d, t_max, rows):
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    planes = []
    for arr in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                t_max):
        a = jnp.zeros((rows * LANES,), jnp.float32).at[:n].set(arr)
        planes.append(a.reshape(rows, LANES))
    return planes


def _rows_for(n: int) -> int:
    rows = -(-n // LANES)
    if rows >= R_SUB:
        return -(-rows // R_SUB) * R_SUB
    return -(-rows // SUB) * SUB


def intersect_closest_resident(dev_c: Dict, o, d, t_max):
    n = o.shape[0]
    tiles = _ray_planes(o, d, t_max, _rows_for(n))
    t, prim, u, v = _call(tuple(tiles), dev_c, False)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n].astype(jnp.int32)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    miss = prim < 0
    return {
        "t": jnp.where(miss, t_max_b, t),
        "prim": prim,
        "u": u.reshape(-1)[:n],
        "v": v.reshape(-1)[:n],
        "hit": ~miss,
        "inst": jnp.zeros((n,), jnp.int32),
    }


def intersect_any_resident(dev_c: Dict, o, d, t_max):
    n = o.shape[0]
    tiles = _ray_planes(o, d, t_max, _rows_for(n))
    prim = _call(tuple(tiles), dev_c, True)[1]
    return (prim.reshape(-1)[:n]) >= 0.0
