"""Host-side simulation: how much VPU sweep work would SUB-TILE gating
save in the clustered traversal?

Today a visited cluster costs the full [16,128] ray tile's VPU width
(group gates + 16-tri MT sweeps) even when one lane wants it. Mosaic can
slice 8-aligned sublane windows, so the sweep could be gated per [8,128]
HALF (the block DMA stays per-tile — that is what made SUBLANES=8 lose on
chip: it doubles DMAs). Pixel-swizzled lanes make interest spatially
concentrated, so halves should often be singly interested.

Simulated on the realistic 1M-tri terrain bounce workload (origins =
primary hits in swizzle lane order, cosine directions — the
probe_binning/sim_stream_order workload), with exact per-lane best-t
tightening:

  today16   [16,128] tiles, full-tile sweeps        (current kernel)
  half16    [16,128] tiles, per-[8,128]-half sweeps (proposed)
  quad32    [32,128] tiles, per-[8,128]-quarter     (DMA amortized wider)

Reported per variant: block DMAs (= cluster visits of its tile size) and
swept lane-kilolanes (sum over sweeps of gated sublane window / 1024) —
the VPU-work proxy. Run: python tools/sim_halftile.py [n_tiles16]
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
from tools.sim_stream_order import _slab_many, trace_numpy

TILE = 2048  # [16, 128]
HALF = 1024  # [8, 128]


def walk_subtiled(order, members, sc_aabb, cl_lo, cl_hi,
                  to, td, t_tr, c_tr, av, n_lanes, sub_lanes):
    """Ordered sc walk with exact tightening; sweeps gated per sub-window
    of sub_lanes lanes. Returns (meta_visits, cluster_visits(=DMAs),
    swept_kilolanes)."""
    n_sub = n_lanes // sub_lanes
    big = np.full(n_lanes, 1e9, np.float32)
    ok_sc, tn_sc = _slab_many(to, td, sc_aabb[0:3].T, sc_aabb[3:6].T, big)
    ok_cl, tn_cl = _slab_many(to, td, cl_lo, cl_hi, big)
    best = np.where(av, 1e9, -1.0).astype(np.float32)
    meta = visits = 0
    swept_lanes = 0
    for s in order:
        m = av & ok_sc[:, s] & (tn_sc[:, s] <= best)
        if not m.any():
            continue
        meta += 1
        for c in members[s]:
            mc = av & ok_cl[:, c] & (tn_cl[:, c] <= best)
            if not mc.any():
                continue
            visits += 1
            halves = mc.reshape(n_sub, sub_lanes).any(1)
            swept_lanes += int(halves.sum()) * sub_lanes
            upd = (c_tr == c) & av
            best[upd] = np.minimum(best[upd], t_tr[upd])
    return meta, visits, swept_lanes / 1024.0


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_tiles -= n_tiles % 2  # quad32 merges tile pairs
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
    perm = hier.perm
    cid_of = np.full(v0.shape[0], -1, np.int64)
    live = perm >= 0
    cid_of[perm[live]] = np.arange(perm.shape[0])[live] // CLUSTER_SIZE
    by_cid = np.argsort(cid_of, kind="stable")
    bounds = np.searchsorted(cid_of[by_cid], np.arange(k_total + 1))
    tris_of_cl = [by_cid[bounds[c]:bounds[c + 1]] for c in range(k_total)]
    print(f"scene: {v0.shape[0]} tris, {k_total} clusters, {s_total} scs "
          f"({time.time()-t0:.0f}s)", flush=True)

    W, H = 512, 288
    n_total = W * H
    all_tiles = n_total // TILE
    pick = np.linspace(0, all_tiles - 2, n_tiles // 2).astype(np.int64)
    pick = np.stack([pick, pick + 1], -1).reshape(-1)  # adjacent pairs
    sel = np.concatenate(
        [np.arange(t * TILE, (t + 1) * TILE) for t in pick])
    n = sel.size
    px_u, py_u = swizzled_pixel_coords(W, H, 0)
    px = (np.asarray(px_u).astype(np.float32) / W - 0.5) * 1.2
    py = -(np.asarray(py_u).astype(np.float32) / H - 0.5) * 0.7 - 0.25
    d = np.stack([px, py, -np.ones(n_total)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d[sel]
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

    def o_id_of(td_t, av_t):
        msum = np.where(av_t[:, None], td_t, 0).sum(0)
        ax = int(np.argmax(np.abs(msum)))
        return 2 * ax + int(msum[ax] < 0)

    tot = np.zeros((3, 3))
    for ti in range(n_tiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        to, td, av = bo[sl], bd[sl], alive[sl]
        t_tr, c_tr = t_true[sl], cid_true[sl]
        oid = o_id_of(td, av)
        r16 = walk_subtiled(tlas.sc_order[oid], members, tlas.sc_aabb,
                            cl_lo, cl_hi, to, td, t_tr, c_tr, av,
                            TILE, TILE)
        rh = walk_subtiled(tlas.sc_order[oid], members, tlas.sc_aabb,
                           cl_lo, cl_hi, to, td, t_tr, c_tr, av,
                           TILE, HALF)
        print(f"tile16 {ti}: today meta={r16[0]} dma={r16[1]} "
              f"klanes={r16[2]:.0f} | half klanes={rh[2]:.0f} "
              f"({rh[2]/max(r16[2],1e-9):.2f}x)", flush=True)
        tot[0] += r16
        tot[1] += rh
    for tp in range(n_tiles // 2):
        sl = slice(tp * 2 * TILE, (tp + 1) * 2 * TILE)
        to, td, av = bo[sl], bd[sl], alive[sl]
        t_tr, c_tr = t_true[sl], cid_true[sl]
        oid = o_id_of(td, av)
        rq = walk_subtiled(tlas.sc_order[oid], members, tlas.sc_aabb,
                           cl_lo, cl_hi, to, td, t_tr, c_tr, av,
                           2 * TILE, HALF)
        print(f"tile32 {tp}: meta={rq[0]} dma={rq[1]} klanes={rq[2]:.0f}",
              flush=True)
        tot[2] += rq

    nt = n_tiles
    print(f"\nper-2048-lane means over {nt} tiles "
          f"(klanes = swept [8,128] windows):")
    print(f"  today16: meta={tot[0,0]/nt:.0f} dma={tot[0,1]/nt:.0f} "
          f"klanes={tot[0,2]/nt:.0f}")
    print(f"  half16 : meta={tot[1,0]/nt:.0f} dma={tot[1,1]/nt:.0f} "
          f"klanes={tot[1,2]/nt:.0f} "
          f"({tot[1,2]/max(tot[0,2],1e-9):.2f}x VPU)")
    print(f"  quad32 : meta={tot[2,0]*2/nt:.0f} dma={tot[2,1]*2/nt:.0f} "
          f"klanes={tot[2,2]*2/nt:.0f} "
          f"({tot[2,2]/max(tot[0,2],1e-9):.2f}x VPU, "
          f"{tot[2,1]/max(tot[0,1],1e-9)*2:.2f}x DMA) "
          f"[per-tile32 values halved to compare]", flush=True)


if __name__ == "__main__":
    main()
