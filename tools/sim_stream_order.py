"""Host-side simulation: does best-t-tightening pruning survive a GLOBAL
geometry stream order?

Motivation (PERF.md round-4): the bounce wall's DMA redundancy could be
removed by a ray-resident kernel that holds many ray tiles in VMEM and
streams each cluster page ONCE per ray super-block (meta DMAs 89 ms ->
~2 ms, block DMAs 71 ms -> ~15 ms). But today's per-tile ORDERED sweep
prunes hard: of ~7.9k gated clusters per incoherent tile only ~280 are
actually swept, because early sweeps tighten best_t and later gates
reject. A global stream order is NOT per-tile front-to-back, so the
pruning could degrade and eat the DMA savings. This sim measures exactly
that, in numpy, on the 1M-tri terrain bounce workload (origins = primary
hit points in pixel-swizzle lane order, cosine directions, sky-miss
lanes dead — the probe_binning.py workload).

Counted per [16,128] ray tile, with exact per-lane best-t tightening
(a lane's t tightens to its TRUE hit t when the cluster containing that
hit is swept):

  today    per-tile dominant-axis sc order (sweep_ordered_regions)
  global0  one fixed sc order for every tile (resident stream, ordered)
  scidx    sc INDEX order (resident stream, memory order)

Reported: sc meta visits + cluster sweeps per tile (today), cluster
sweeps + page DMAs per tile (stream orders), where a page is P_CL
consecutive cids (the resident kernel's HBM->SMEM block transfer unit).

Run: python tools/sim_stream_order.py [n_tiles]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fredholm_tpu.accel.bvh import build_bvh
from fredholm_tpu.accel.cluster import (
    CLUSTER_SIZE,
    SC_GROUP,
    build_tlas,
    extract_hierarchy,
)
from fredholm_tpu.core.swizzle import swizzled_pixel_coords
from fredholm_tpu.scene.procedural import terrain

P_CL = int(os.environ.get("SIM_P_CL", "4"))
TILE = 2048  # [16, 128] lanes


def _slab_many(o, d, lo, hi, t_best):
    """Vectorized slab test: rays [n,3] vs boxes [m,3] -> pass [n,m],
    entry t [n,m]. t_best [n] caps the far test."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    t1 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t2 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t1, t2).max(-1)
    tf = np.maximum(t1, t2).min(-1)
    ok = (tn <= tf) & (tf >= 0.0) & (tn <= t_best[:, None])
    return ok, tn


def _mt(o, d, v0, e1, e2):
    """Moller-Trumbore rays [n,3] x tris [m,3] -> t [n,m], valid [n,m]."""
    p = np.cross(d[:, None, :], e2[None, :, :])
    det = np.einsum("mk,nmk->nm", e1, p)
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = o[:, None, :] - v0[None, :, :]
    u = np.einsum("nmk,nmk->nm", tv, p) * inv_det
    q = np.cross(tv, e1[None, :, :])
    v = np.einsum("nk,nmk->nm", d, q) * inv_det
    t = np.einsum("mk,nmk->nm", e2, q) * inv_det
    valid = (
        (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    )
    return t, valid


def trace_numpy(o, d, tmax, cl_lo, cl_hi, tri_v0, tri_e1, tri_e2,
                tris_of_cl):
    """Exact closest hit via per-cluster candidate MT. Returns t, cid."""
    n = o.shape[0]
    best = np.full(n, tmax, np.float32)
    best_cid = np.full(n, -1, np.int64)
    k = cl_lo.shape[0]
    ok, _ = _slab_many(o, d, cl_lo, cl_hi, best)
    for c in range(k):
        idx = np.where(ok[:, c])[0]
        tris = tris_of_cl[c]
        if idx.size == 0 or tris.size == 0:
            continue
        t, valid = _mt(o[idx], d[idx], tri_v0[tris], tri_e1[tris],
                       tri_e2[tris])
        t = np.where(valid, t, np.inf).min(1)
        upd = t < best[idx]
        best[idx[upd]] = t[upd]
        best_cid[idx[upd]] = c
    return best, best_cid


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    t0 = time.time()
    sc = terrain()
    v = sc.vertices[sc.indices]
    v0 = v[:, 0].astype(np.float32)
    e1 = (v[:, 1] - v[:, 0]).astype(np.float32)
    e2 = (v[:, 2] - v[:, 0]).astype(np.float32)
    b = build_bvh(v.min(1), v.max(1), thread=False)
    hier = extract_hierarchy(b, v0, e1, e2)
    tlas = build_tlas([hier], [(0, np.eye(4))])

    s_total = tlas.sc_aabb.shape[1]
    mcount = tlas.sc_mcount
    # dense per-cid tables from the sc-major cl_meta
    k_total = int(tlas.blocks.shape[1] // CLUSTER_SIZE)
    cl_lo = np.zeros((k_total, 3), np.float32)
    cl_hi = np.zeros((k_total, 3), np.float32)
    members = []
    for s in range(s_total):
        base = s * SC_GROUP
        cids = tlas.cl_meta[7, base:base + mcount[s]].astype(np.int64)
        members.append(cids)
        cl_lo[cids] = tlas.cl_meta[0:3, base:base + mcount[s]].T
        cl_hi[cids] = tlas.cl_meta[3:6, base:base + mcount[s]].T
    # prim -> cid from the block permutation
    perm = hier.perm  # single identity instance: TLAS blocks == BLAS blocks
    cid_of = np.full(v0.shape[0], -1, np.int64)
    live = perm >= 0
    cid_of[perm[live]] = np.arange(perm.shape[0])[live] // CLUSTER_SIZE
    by_cid = np.argsort(cid_of, kind="stable")
    bounds = np.searchsorted(cid_of[by_cid], np.arange(k_total + 1))
    tris_of_cl = [by_cid[bounds[c]:bounds[c + 1]] for c in range(k_total)]
    print(f"scene: {v0.shape[0]} tris, {k_total} clusters, {s_total} scs "
          f"({time.time()-t0:.0f}s)", flush=True)

    # primary rays, pixel-swizzle order (probe_binning.py camera). Tiles
    # are sampled ACROSS the frame (stride over all 72): early-swizzle
    # tiles are the top-left corner, which is all sky on this camera.
    W, H = 512, 288
    n_total = W * H
    all_tiles = n_total // TILE
    pick = np.linspace(0, all_tiles - 1, n_tiles).astype(np.int64)
    sel = np.concatenate(
        [np.arange(t * TILE, (t + 1) * TILE) for t in pick])
    n = sel.size
    px_u, py_u = swizzled_pixel_coords(W, H, 0)
    px = (np.asarray(px_u).astype(np.float32) / W - 0.5) * 1.2
    py = -(np.asarray(py_u).astype(np.float32) / H - 0.5) * 0.7 - 0.25
    d = np.stack([px, py, -np.ones(n_total)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d[sel]
    print(f"tiles sampled: {list(pick)}", flush=True)
    o = np.tile(np.array([[0, 4.5, 11.0]], np.float32), (n, 1))
    t0 = time.time()
    t_p, cid_p = trace_numpy(o, d, 1e9, cl_lo, cl_hi, v0, e1, e2, tris_of_cl)
    hit = cid_p >= 0
    print(f"primary: {hit.sum()}/{n} hit ({time.time()-t0:.0f}s)", flush=True)

    rng = np.random.default_rng(0)
    bo = (o + t_p[:, None] * d + np.array([0, 1e-3, 0], np.float32)).astype(
        np.float32)
    u1, u2 = rng.random(n), rng.random(n)
    st = np.sqrt(u1)
    bd = np.stack([st * np.cos(2 * np.pi * u2), np.sqrt(1 - u1),
                   st * np.sin(2 * np.pi * u2)], -1).astype(np.float32)
    alive = hit
    t0 = time.time()
    t_true, cid_true = trace_numpy(
        bo, bd, 1e9, cl_lo, cl_hi, v0, e1, e2, tris_of_cl)
    print(f"bounce: {(cid_true >= 0).sum()}/{alive.sum()} alive hit "
          f"({time.time()-t0:.0f}s)", flush=True)

    page_of = np.arange(k_total) // P_CL
    n_pages = int(page_of.max()) + 1
    pg_lo = np.full((n_pages, 3), 1e30, np.float32)
    pg_hi = np.full((n_pages, 3), -1e30, np.float32)
    for c in range(k_total):
        p = page_of[c]
        pg_lo[p] = np.minimum(pg_lo[p], cl_lo[c])
        pg_hi[p] = np.maximum(pg_hi[p], cl_hi[c])

    def walk_sc_order(order, to, td, t_tr, c_tr, av):
        """Today's kernel: sc slab gate -> member cluster gates -> sweep."""
        ok_sc, tn_sc = _slab_many(to, td, tlas.sc_aabb[0:3].T,
                                  tlas.sc_aabb[3:6].T, np.full(TILE, 1e9,
                                                               np.float32))
        ok_cl, tn_cl = _slab_many(to, td, cl_lo, cl_hi,
                                  np.full(TILE, 1e9, np.float32))
        best = np.where(av, 1e9, -1.0).astype(np.float32)
        meta = sweeps = 0
        for s in order:
            m = av & ok_sc[:, s] & (tn_sc[:, s] <= best)
            if not m.any():
                continue
            meta += 1
            for c in members[s]:
                mc = av & ok_cl[:, c] & (tn_cl[:, c] <= best)
                if not mc.any():
                    continue
                sweeps += 1
                upd = (c_tr == c) & av
                best[upd] = np.minimum(best[upd], t_tr[upd])
        return meta, sweeps

    def walk_pages(to, td, t_tr, c_tr, av):
        """Resident stream: page gate -> cluster gate -> sweep, cid order."""
        ok_cl, tn_cl = _slab_many(to, td, cl_lo, cl_hi,
                                  np.full(TILE, 1e9, np.float32))
        ok_pg, tn_pg = _slab_many(to, td, pg_lo, pg_hi,
                                  np.full(TILE, 1e9, np.float32))
        best = np.where(av, 1e9, -1.0).astype(np.float32)
        pg_dma = sweeps = 0
        for p in range(n_pages):
            m = av & ok_pg[:, p] & (tn_pg[:, p] <= best)
            if not m.any():
                continue
            pg_dma += 1
            for c in range(p * P_CL, min((p + 1) * P_CL, k_total)):
                mc = av & ok_cl[:, c] & (tn_cl[:, c] <= best)
                if not mc.any():
                    continue
                sweeps += 1
                upd = (c_tr == c) & av
                best[upd] = np.minimum(best[upd], t_tr[upd])
        return pg_dma, sweeps

    tot = {"today_meta": 0, "today_sw": 0, "glob_meta": 0, "glob_sw": 0,
           "page_dma": 0, "page_sw": 0}
    for ti in range(n_tiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        to, td = bo[sl], bd[sl]
        av = alive[sl]
        t_tr, c_tr = t_true[sl], cid_true[sl]
        # per-tile dominant axis -> order id (kernel logic)
        msum = np.where(av[:, None], td, 0).sum(0)
        ax = int(np.argmax(np.abs(msum)))
        o_id = 2 * ax + int(msum[ax] < 0)
        m0, s0 = walk_sc_order(tlas.sc_order[o_id], to, td, t_tr, c_tr, av)
        m1, s1 = walk_sc_order(tlas.sc_order[0], to, td, t_tr, c_tr, av)
        p2, s2 = walk_pages(to, td, t_tr, c_tr, av)
        print(f"tile {ti}: today(o{o_id}) meta={m0} sw={s0} | "
              f"global0 meta={m1} sw={s1} | pages(P={P_CL}) dma={p2} sw={s2}",
              flush=True)
        tot["today_meta"] += m0
        tot["today_sw"] += s0
        tot["glob_meta"] += m1
        tot["glob_sw"] += s1
        tot["page_dma"] += p2
        tot["page_sw"] += s2

    nt = n_tiles
    print(f"\nmean/tile over {nt}: today meta={tot['today_meta']/nt:.0f} "
          f"sw={tot['today_sw']/nt:.0f} | global0 sw={tot['glob_sw']/nt:.0f} "
          f"| pages dma={tot['page_dma']/nt:.0f} sw={tot['page_sw']/nt:.0f} "
          f"(of {n_pages} pages, {k_total} clusters)", flush=True)


if __name__ == "__main__":
    main()
