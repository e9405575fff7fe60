"""Three-level instanced ray traversal in Pallas.

The large-scene replacement for OptiX GAS/IAS traversal
(/root/reference/fredholm/include/fredholm/renderer.h:434-552 +
optixTrace): a predicated sweep over the cluster hierarchy built in
accel/cluster.py —

  instance (SMEM AABB + world->object transform)
    -> supercluster (SMEM AABB; <= 128 member clusters)
      -> cluster ([8, 128] member-AABB group DMA'd HBM -> SMEM)
        -> 16-triangle sub-group (AABBs in block rows 10-15)
          -> triangles ([16, 128] block DMA'd HBM -> SMEM,
                        scalar-broadcast Moller-Trumbore over the ray tile)

Every level is gated with `@pl.when(any(hit))`, so work descends only where
some ray in the [SUBLANES, 128] tile actually overlaps.

(Tried and rejected: sweeping the 8 direction octants separately to
tighten the gates for diffuse tiles — near-field clusters appear in most
octants' unions, so visits multiply ~8x for the dominant near-field work
while predicated per-visit cost stays full-tile. Measured 1.6x SLOWER on
1M-tri terrain bounce rays.) Ray tiles are
pixel-coherent, which makes the gates highly selective for primary/shadow
rays; dead lanes (tmax < 0) are masked at the top so fully-dead tiles cost
one instance AABB test.

Instancing: rays are transformed into object space per hit instance (12
scalars from SMEM, vector FMAs on the tile). The hit parameter t is
invariant under the affine map (o + t*d maps exactly), so best-t
predication works across instances and the output t is world-scale.
Identity-only scenes (flattened/baked geometry) compile a kernel variant
with no transform code at all.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import (
    CL_META_ROWS,
    CLUSTER_SIZE,
    N_ORDERS,
    N_TRI_GROUPS,
    REG_SIZE,
    SC_GROUP,
    TLAS,
    TRI_COMPONENTS,
    TRI_GROUP,
)

LANES = 128
# 2k rays per program instance: measured on the 1M-tri terrain scene,
# 16-sublane tiles cull ~6x better than 64-sublane ones on primary rays
# (re-confirmed under twopass gating: 8/16/32 probe, 16 still optimal).
# FREDHOLM_TRAV_SUBLANES overrides for probing only.
import os as _os

SUBLANES = int(_os.environ.get("FREDHOLM_TRAV_SUBLANES", "16"))
RAY_TILE = LANES * SUBLANES

# perf-ablation hook (tools/probe_traversal.py): "notri" stubs the
# Moller-Trumbore math, "nogrp" also skips the sub-group sweep, "noblkdma"
# additionally skips the triangle-block DMA — isolates where traversal
# time goes on real hardware. Production value is "".
_ABLATE = _os.environ.get("FREDHOLM_TRAV_ABLATE", "")
# FREDHOLM_TRAV_STATS=1 adds per-tile visit counters (SMEM) to the kernel
# outputs; intersect_*_clustered then return a "stats" vector
# [inst_visits, sc_tests, sc_visits, cl_tests, cl_visits, grp_tests,
#  grp_visits, tri_tests] summed over tiles (tools/probe_traversal.py)
_STATS = _os.environ.get("FREDHOLM_TRAV_STATS", "") == "1"
# sub-window sweep gating (round-5 lever): gate the per-cluster group
# gates + triangle sweeps per SUBROWS-row window of the ray tile (the f32
# vreg height, 8) instead of the full [SUBLANES, 128] tile — the block
# DMA stays per-tile (halving the DMA width is what made SUBLANES=8 lose
# on chip). Pixel-swizzled interest is spatially concentrated, so windows
# are often singly interested and a visited cluster then costs half (or
# 1/n_win) the VPU sweep width. Per-lane results are bit-identical by
# construction (each lane's merges only read its own row). 0 disables.
_SUBROWS = int(_os.environ.get("FREDHOLM_TRAV_SUBROWS", "8"))
_SUBROWS_ANYHIT = (
    _os.environ.get("FREDHOLM_TRAV_SUBROWS_ANYHIT", "0") == "1"
)
# cluster gating strategy: "twopass" (DEFAULT — measured +22% primary /
# +18% bounce on the 1M-tri terrain, round 3) vector-gates ALL clusters of
# the supercluster first (8 slab tests per fori iteration, interested ids
# appended to an SMEM list), then sweeps only the selected ids — amortizes
# the per-cluster loop/branch overhead that dominates incoherent tiles.
# "fused" = the old gate+sweep per cluster (one predicated region each).
_GATE = _os.environ.get("FREDHOLM_TRAV_GATE", "twopass")
if _GATE == "fused":
    _GATE = ""
# supercluster meta fetch strategy. Hypothesis (round-3 stats: incoherent
# tiles visit 349/539 superclusters, so per-sc 4 KB cl_meta DMAs pay the
# ~3.5 us per-transfer issue cost 349x per tile): DMA NSC superclusters'
# meta per transfer in memory order ("stream"), pre-gated by the chunk's
# sc slab tests, selected PER TILE by exit_ok (the condition under which
# front-to-back ordering pays). MEASURED AND REJECTED on the 1M-tri
# terrain (tools/probe_traversal.py, twopass gating): bounce 0.40 ordered
# vs 0.38 stream vs 0.40 auto Mrays/s, primary 1.82 / 1.13 / 1.69 — the
# merged DMA saves less than the lost per-sc gating context costs, and
# the auto variant's double-size kernel taxes primary rays ~7%. Default
# "0" (always ordered); FREDHOLM_TRAV_STREAM=1/auto re-probe.
_STREAM = _os.environ.get("FREDHOLM_TRAV_STREAM", "0")
NSC = int(_os.environ.get("FREDHOLM_TRAV_NSC", "8"))
# SMEM cl_meta buffer width: only the stream path needs NSC groups
_CLM_GROUPS = 1 if _STREAM == "0" else NSC
# NOTE sc_tests semantics under regions (REG_SIZE > 0): counted once per
# order position INSIDE a hit region (clamped tail duplicates included)
# and not at all for region-level slab tests, so values are not comparable
# to REG_SIZE=0 probes; region tests themselves are uncounted.
STAT_NAMES = ("inst_visits", "sc_tests", "sc_visits", "cl_tests",
              "cl_visits", "grp_tests", "grp_visits", "tri_tests")

if hasattr(pltpu, "HBM"):
    _HBM_SPACE = pltpu.HBM
elif hasattr(pl, "ANY"):
    _HBM_SPACE = pl.ANY
else:  # oldest API; touching pltpu.ANY on new jax warns deprecation
    _HBM_SPACE = pltpu.ANY


def prepare_clustered(tlas: TLAS) -> Dict:
    """Device arrays for the kernels (traced pytree — the static
    `inst_identity` bool travels via pt.STATIC_DEV_KEYS instead)."""
    # NSC*SC_GROUP columns of tail padding keep the stream path's merged
    # chunk DMA in-bounds for the last chunk of the last instance
    # (unpadded when the stream path is compiled out)
    cl_meta = jnp.asarray(tlas.cl_meta)
    if _STREAM != "0":
        cl_meta = jnp.pad(cl_meta, ((0, 0), (0, NSC * SC_GROUP)))
    extra = {}
    if (tlas.inst_aabb.shape[1] == 1
            and _os.environ.get("FREDHOLM_TRAV_RESIDENT", "0") == "1"):
        # single-instance scenes additionally carry the dense-by-cid meta
        # for the (experimental, chip-rejected) ray-resident kernel —
        # built only when its env gate is on so the default scene build
        # and per-frame refit pay nothing for it
        from ..experimental.pallas_resident import prepare_resident

        extra = prepare_resident(tlas)
    # world-space union of all instance AABBs: no geometry exists beyond
    # it, so each lane's initial best_t clamps to its root-box EXIT
    # distance — miss rays (sky) and unoccluded shadow rays then tighten
    # every slab gate instead of sweeping against t=1e9 (round-4 lever)
    root = np.zeros((6, 8), np.float32)
    root[0:3, 0] = np.asarray(tlas.inst_aabb[0:3]).min(axis=1)
    root[3:6, 0] = np.asarray(tlas.inst_aabb[3:6]).max(axis=1)
    return {
        **extra,
        "root_aabb": jnp.asarray(root),                # [6, 8] SMEM
        "reg_aabb": jnp.asarray(tlas.reg_aabb),        # [6, 6*R] SMEM
        "sc_aabb": jnp.asarray(tlas.sc_aabb),          # [6, S] SMEM
        "sc_mcount": jnp.asarray(tlas.sc_mcount),      # [S] SMEM
        "sc_order": jnp.asarray(tlas.sc_order),        # [6, S] SMEM
        "sc_key": jnp.asarray(tlas.sc_key),            # [6, S] SMEM
        "cl_meta": cl_meta,                            # [8, (S+NSC)*128] HBM
        "blocks": jnp.asarray(tlas.blocks),            # [16, K*256] HBM
        "inst_aabb": jnp.asarray(tlas.inst_aabb),      # [6, I] SMEM
        "inst_minv": jnp.asarray(tlas.inst_minv),      # [12, I] SMEM
        "inst_sc": jnp.asarray(tlas.inst_sc),          # [3, I] SMEM
    }


def _inv_dir(dx, dy, dz):
    eps = 1e-12
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    return inv_dx, inv_dy, inv_dz


def _slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z,
          ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best):
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


def _slab_cols(ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best):
    """Slab test against AABB column c of a [>=6, N] scalar table."""
    return _slab(
        ref[0, c], ref[1, c], ref[2, c], ref[3, c], ref[4, c], ref[5, c],
        ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
    )


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


def _make_kernel(n_inst: int, identity: bool, any_hit: bool,
                 stats: bool = False, sub: int = SUBLANES):
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               inst_aabb, inst_minv, inst_sc, sc_aabb, sc_mcount,
               sc_order, sc_key, reg_aabb, root_aabb,
               cl_meta_hbm, blocks_hbm,
               t_out, prim_out, u_out, v_out, inst_out,
               *rest):
        if not any_hit:
            # hit SLOT (global cid*CLUSTER_SIZE + in-cluster index): the
            # cheap key for the cluster-block attribute fetch
            # (fused/slot_fetch.py) — per-lane attr gathers from [F]-row
            # tables are the measured large-scene wall (PERF.md round 5)
            slot_out = rest[0]
            rest = rest[1:]
        if stats:
            stats_out = rest[0]
            rest = rest[1:]
        if not any_hit:
            best_slot = rest[0]
            rest = rest[1:]
        (best_t, best_prim, best_u, best_v, best_inst,
         clm, smem, sel, sem_m, sem_b) = rest

        def bump(k):
            if stats:
                stats_out[0, k] = stats_out[0, k] + 1

        if stats:
            for _k in range(8):
                stats_out[0, _k] = 0

        tmax = tmax_ref[:]
        alive = tmax > 0.0
        neg_big = jnp.float32(-1e30)

        best_t[:] = tmax
        best_prim[:] = jnp.full(tmax.shape, -1.0, jnp.float32)
        best_u[:] = jnp.zeros(tmax.shape, jnp.float32)
        best_v[:] = jnp.zeros(tmax.shape, jnp.float32)
        best_inst[:] = jnp.zeros(tmax.shape, jnp.float32)
        if not any_hit:
            best_slot[:] = jnp.full(tmax.shape, -1.0, jnp.float32)

        # fully-dead tiles (pixel-coherent RR kills / misses) cost nothing
        @pl.when(jnp.any(alive))
        def _sweep():
            wox = ox_ref[:]
            woy = oy_ref[:]
            woz = oz_ref[:]
            wdx = dx_ref[:]
            wdy = dy_ref[:]
            wdz = dz_ref[:]
            winv = _inv_dir(wdx, wdy, wdz)

            # clamp best_t to the root-box exit distance: geometry cannot
            # lie beyond the union of instance AABBs, so miss/unoccluded
            # lanes (t stays at tmax forever otherwise) tighten every
            # slab gate below. Exact — any real hit satisfies
            # t <= root exit along the ray. Lanes that miss the root box
            # entirely get best_t = 0 (origin is then outside every child
            # box, so every gate's tn > 0 fails). Output t for misses is
            # restored to tmax by the wrapper (prim < 0).
            t1x = (root_aabb[0, 0] - wox) * winv[0]
            t2x = (root_aabb[3, 0] - wox) * winv[0]
            t1y = (root_aabb[1, 0] - woy) * winv[1]
            t2y = (root_aabb[4, 0] - woy) * winv[1]
            t1z = (root_aabb[2, 0] - woz) * winv[2]
            t2z = (root_aabb[5, 0] - woz) * winv[2]
            rtn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            rtf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hit_root = (rtn <= rtf) & (rtf >= 0.0)
            clamp = jnp.where(hit_root, rtf * 1.0001 + 1e-4, 0.0)
            best_t[:] = jnp.where(
                alive, jnp.minimum(best_t[:], clamp), best_t[:]
            )

            def _sweep_instances(alive):
                def inst_body(i, _):
                    ihit = alive & _slab_cols(
                        inst_aabb, i, wox, woy, woz, *winv, best_t[:]
                    )
                    if any_hit:
                        ihit = ihit & (best_prim[:] < 0.0)

                    @pl.when(jnp.any(ihit))
                    def _():
                        bump(0)
                        if identity:
                            ox, oy, oz = wox, woy, woz
                            dx, dy, dz = wdx, wdy, wdz
                            inv = winv
                        else:
                            m = [inst_minv[r, i] for r in range(12)]
                            ox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                            oy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                            oz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                            dx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                            dy = m[4] * wdx + m[5] * wdy + m[6] * wdz
                            dz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                            inv = _inv_dir(dx, dy, dz)

                        sc_lo = inst_sc[0, i]
                        sc_n = inst_sc[1, i]
                        reg_lo = inst_sc[2, i]

                        def cluster_sweep(j, bhit):
                            """Sweep member cluster at clm COLUMN j (the
                            caller adds any chunk offset). bhit: the
                            caller's full-tile cluster slab mask — its
                            per-window any() gates the sub-window sweeps
                            (round-5 lever; see _SUBROWS)."""
                            bump(4)
                            if _ABLATE == "noblkdma":
                                best_u[:] = best_u[:] + 1e-30
                                return
                            cid = clm[7, j].astype(jnp.int32)
                            dma_b = pltpu.make_async_copy(
                                blocks_hbm.at[
                                    :,
                                    pl.ds(cid * CLUSTER_SIZE, CLUSTER_SIZE),
                                ],
                                smem,
                                sem_b,
                            )
                            dma_b.start()
                            dma_b.wait()
                            cnt = clm[6, j].astype(jnp.int32)
                            slot0 = (cid * CLUSTER_SIZE).astype(jnp.float32)

                            def sweep_rows(r0, nr):
                                """Group gates + unrolled 16-tri sweeps
                                over tile rows [r0, r0+nr) — one f32 vreg
                                tall under sub-window gating. The static
                                unroll with ONE ref merge per group
                                removes the ~150 ns/iter fori overhead
                                that dominated the MT math (round 3)."""
                                rs = (slice(None)
                                      if r0 == 0 and nr == sub
                                      else slice(r0, r0 + nr))
                                oxw, oyw, ozw = ox[rs], oy[rs], oz[rs]
                                dxw, dyw, dzw = dx[rs], dy[rs], dz[rs]
                                invw = (inv[0][rs], inv[1][rs], inv[2][rs])

                                def grp_sweep(g):
                                    bump(6)
                                    base = g * TRI_GROUP
                                    gt = best_t[rs]
                                    gp = best_prim[rs]
                                    if not any_hit:
                                        gu = best_u[rs]
                                        gv = best_v[rs]
                                        gs = best_slot[rs]
                                    for k in range(TRI_GROUP):
                                        bump(7)
                                        kk = base + k
                                        if _ABLATE == "notri":
                                            continue
                                        t, u, v, valid = _mt_scalar(
                                            smem, kk,
                                            oxw, oyw, ozw, dxw, dyw, dzw,
                                        )
                                        improved = (
                                            valid & (t < gt)
                                            & (kk < cnt)
                                        )
                                        gp = jnp.where(
                                            improved, smem[9, kk], gp
                                        )
                                        if not any_hit:
                                            gu = jnp.where(improved, u, gu)
                                            gv = jnp.where(improved, v, gv)
                                            gs = jnp.where(
                                                improved,
                                                slot0 + jnp.float32(kk),
                                                gs,
                                            )
                                            gt = jnp.where(improved, t, gt)
                                    if not any_hit and n_inst > 1:
                                        best_inst[rs] = jnp.where(
                                            gt < best_t[rs],
                                            i.astype(jnp.float32),
                                            best_inst[rs],
                                        )
                                    best_prim[rs] = gp
                                    if not any_hit:
                                        best_u[rs] = gu
                                        best_v[rs] = gv
                                        best_slot[rs] = gs
                                        best_t[rs] = gt

                                # 16-tri sub-groups, each gated by its own
                                # AABB (block rows 10-15): a window grazed
                                # by few rays skips most of the triangle
                                # sweep. Static loop: group AABB offsets
                                # are compile-time constants; empty tail
                                # groups are gated by the scalar cnt test
                                for g in range(N_TRI_GROUPS):
                                    bump(5)
                                    if _ABLATE == "nogrp":
                                        best_u[rs] = (
                                            best_u[rs] + smem[10, g] * 1e-30
                                        )
                                        continue
                                    ghit = _slab(
                                        smem[10, g], smem[11, g],
                                        smem[12, g], smem[13, g],
                                        smem[14, g], smem[15, g],
                                        oxw, oyw, ozw, *invw, best_t[rs],
                                    )
                                    if any_hit:
                                        ghit = ghit & (
                                            best_prim[rs] < 0.0
                                        )

                                    pl.when(
                                        jnp.any(ghit)
                                        & (g * TRI_GROUP < cnt)
                                    )(lambda g=g: grp_sweep(g))

                            # any-hit defaults to full-tile sweeps: its
                            # occluded-lane masking + all-occluded early
                            # exit already prune, and the chip A/B
                            # measured the per-window overhead as a 12%
                            # LOSS on the generic bounce workload
                            # (closest: +51-56% win; PERF.md round 5).
                            # FREDHOLM_TRAV_SUBROWS_ANYHIT=1 re-enables
                            # for A/B on NEE-shadow-heavy renders (the
                            # terrain decomposition puts 67% of the
                            # render in the anyhit dispatches).
                            win_ok = not any_hit or _SUBROWS_ANYHIT
                            n_win = (
                                sub // _SUBROWS
                                if (_SUBROWS > 0 and sub % _SUBROWS == 0
                                    and win_ok)
                                else 1
                            )
                            if n_win <= 1:
                                sweep_rows(0, sub)
                            else:
                                # NOTE stats: grp_tests/tri_tests count
                                # per-window under sub-window gating
                                for w in range(n_win):
                                    r0 = w * _SUBROWS
                                    whit = jnp.any(bhit[r0:r0 + _SUBROWS])
                                    pl.when(whit)(
                                        lambda r0=r0: sweep_rows(
                                            r0, _SUBROWS
                                        )
                                    )

                        def sweep_clusters(mcount, koff):
                            """Gate + sweep mcount member clusters whose
                            meta sits at clm columns [koff, koff+mcount)."""
                            if _GATE == "twopass":
                                # pass 1: slab-gate every cluster, 8 per
                                # fori iteration (amortizes loop/branch
                                # overhead), appending interested COLUMN
                                # ids to the SMEM list
                                def gate8(c, cnt):
                                    base = koff + c * 8
                                    for k in range(8):
                                        bump(3)
                                        j = base + k
                                        bhit = _slab_cols(
                                            clm, j, ox, oy, oz, *inv,
                                            best_t[:],
                                        )
                                        if any_hit:
                                            bhit = bhit & (
                                                best_prim[:] < 0.0
                                            )
                                        ok = (
                                            jnp.any(bhit)
                                            & (c * 8 + k < mcount)
                                        ).astype(jnp.int32)
                                        # write-then-advance: stale writes
                                        # are overwritten by the next
                                        # candidate
                                        sel[0, cnt] = j
                                        cnt = cnt + ok
                                    return cnt

                                n_sel = jax.lax.fori_loop(
                                    0, (mcount + 7) // 8, gate8,
                                    jnp.int32(0),
                                )

                                def sweep_sel(k, _):
                                    j = sel[0, k]
                                    # re-gate with the tightened best_t
                                    # (earlier sweeps may have occluded
                                    # this cluster since pass 1)
                                    bhit = _slab_cols(
                                        clm, j, ox, oy, oz, *inv,
                                        best_t[:],
                                    )
                                    if any_hit:
                                        bhit = bhit & (best_prim[:] < 0.0)
                                    pl.when(jnp.any(bhit))(
                                        lambda: cluster_sweep(j, bhit)
                                    )
                                    return 0

                                jax.lax.fori_loop(0, n_sel, sweep_sel, 0)
                            else:
                                def cl_body(j0, _):
                                    bump(3)
                                    j = koff + j0
                                    bhit = _slab_cols(
                                        clm, j, ox, oy, oz, *inv,
                                        best_t[:],
                                    )
                                    if any_hit:
                                        bhit = bhit & (best_prim[:] < 0.0)
                                    pl.when(jnp.any(bhit))(
                                        lambda: cluster_sweep(j, bhit)
                                    )
                                    return 0

                                jax.lax.fori_loop(0, mcount, cl_body, 0)

                        # front-to-back ordering: dominant direction class of
                        # the tile's ALIVE rays picks one of the 6 precomputed
                        # visit orders (the skip-link 6-threading idea applied
                        # to the supercluster sweep)
                        a0 = jnp.where(alive, dx, 0.0)
                        a1 = jnp.where(alive, dy, 0.0)
                        a2 = jnp.where(alive, dz, 0.0)
                        m0 = jnp.sum(a0)
                        m1 = jnp.sum(a1)
                        m2 = jnp.sum(a2)
                        ax = jnp.where(
                            jnp.abs(m0) >= jnp.maximum(jnp.abs(m1), jnp.abs(m2)),
                            0,
                            jnp.where(jnp.abs(m1) >= jnp.abs(m2), 1, 2),
                        )
                        msel = jnp.where(
                            ax == 0, m0, jnp.where(ax == 1, m1, m2)
                        )
                        o_id = 2 * ax + (msel < 0.0).astype(jnp.int32)

                        # sign-flipped axis coords for the early-exit bound:
                        # every later box in the order has key >= current key,
                        # and entry distance >= (key - max o') / max d' for all
                        # alive lanes (sound only if no alive lane moves
                        # backwards along the axis)
                        sgn = jnp.where(msel < 0.0, -1.0, 1.0)
                        oax = sgn * jnp.where(
                            ax == 0, ox, jnp.where(ax == 1, oy, oz)
                        )
                        dax = sgn * jnp.where(
                            ax == 0, dx, jnp.where(ax == 1, dy, dz)
                        )
                        o_hi = jnp.max(jnp.where(alive, oax, neg_big))
                        d_hi = jnp.max(jnp.where(alive, dax, neg_big))
                        exit_ok = ~jnp.any(alive & (dax <= 1e-7))

                        def _sc_visit(s):
                            """DMA supercluster s's member meta and sweep."""
                            bump(2)
                            dma_m = pltpu.make_async_copy(
                                cl_meta_hbm.at[
                                    :, pl.ds(s * SC_GROUP, SC_GROUP)
                                ],
                                clm.at[:, pl.ds(0, SC_GROUP)],
                                sem_m,
                            )
                            dma_m.start()
                            dma_m.wait()
                            sweep_clusters(sc_mcount[s], 0)

                        def _exit_state(k1_pos):
                            """Early-exit flag after order position k1_pos:
                            remaining (front-to-back) boxes are provably
                            beyond every alive lane's best t, or (any_hit)
                            every alive lane is already occluded."""
                            if any_hit:
                                all_occ = ~jnp.any(
                                    alive & (best_prim[:] < 0.0)
                                )
                            else:
                                all_occ = False
                            t_cap = jnp.max(
                                jnp.where(alive, best_t[:], neg_big)
                            )
                            key_n = sc_key[o_id, sc_lo + jnp.minimum(
                                k1_pos, sc_n - 1
                            )]
                            t_lb = (key_n - o_hi) / jnp.maximum(
                                d_hi, 1e-30
                            )
                            return (exit_ok & (t_lb > t_cap)) | all_occ

                        def sweep_ordered():
                            def sc_cond(carry):
                                k, done = carry
                                return (k < sc_n) & (done == 0)

                            def sc_body(carry):
                                k, done = carry
                                bump(1)
                                s = sc_order[o_id, sc_lo + k]
                                shit = alive & _slab_cols(
                                    sc_aabb, s, ox, oy, oz, *inv, best_t[:]
                                )
                                if any_hit:
                                    shit = shit & (best_prim[:] < 0.0)

                                pl.when(jnp.any(shit))(lambda: _sc_visit(s))

                                k1 = k + 1
                                done_n = _exit_state(k1)
                                return k1, done_n.astype(jnp.int32)

                            jax.lax.while_loop(
                                sc_cond, sc_body, (jnp.int32(0), jnp.int32(0))
                            )

                        def sweep_ordered_regions():
                            """Ordered sweep gated by the 4th level: REG_SIZE
                            consecutive order positions share one union AABB
                            (cluster.py _region_tables), so a far-field
                            stretch of the order costs ONE slab test for the
                            tile instead of REG_SIZE. Inside a hit region the
                            per-sc tests run unrolled with pass bits packed
                            into a scalar; the fori sweep below keeps ONE
                            copy of the cluster-sweep body (the stream
                            path's code-size trick)."""
                            r_total = reg_aabb.shape[1] // N_ORDERS
                            n_reg = (sc_n + REG_SIZE - 1) // REG_SIZE

                            def rg_cond(carry):
                                kr, done = carry
                                return (kr < n_reg) & (done == 0)

                            def rg_body(carry):
                                kr, done = carry
                                rcol = o_id * r_total + reg_lo + kr
                                rhit = alive & _slab_cols(
                                    reg_aabb, rcol, ox, oy, oz, *inv,
                                    best_t[:],
                                )
                                if any_hit:
                                    rhit = rhit & (best_prim[:] < 0.0)

                                @pl.when(jnp.any(rhit))
                                def _():
                                    hitbits = jnp.int32(0)
                                    for k in range(REG_SIZE):
                                        bump(1)
                                        idx = kr * REG_SIZE + k
                                        s = sc_order[
                                            o_id,
                                            sc_lo + jnp.minimum(
                                                idx, sc_n - 1
                                            ),
                                        ]
                                        shit = alive & _slab_cols(
                                            sc_aabb, s, ox, oy, oz, *inv,
                                            best_t[:],
                                        )
                                        if any_hit:
                                            shit = shit & (
                                                best_prim[:] < 0.0
                                            )
                                        bit = (
                                            jnp.any(shit) & (idx < sc_n)
                                        ).astype(jnp.int32)
                                        hitbits = hitbits | (bit << k)

                                    @pl.when(hitbits != 0)
                                    def _():
                                        def sweep_k(k, _):
                                            def do_k():
                                                _sc_visit(sc_order[
                                                    o_id,
                                                    sc_lo + kr * REG_SIZE + k,
                                                ])
                                            pl.when(
                                                ((hitbits >> k) & 1) == 1
                                            )(do_k)
                                            return 0

                                        jax.lax.fori_loop(
                                            0, REG_SIZE, sweep_k, 0
                                        )

                                k1 = kr + 1
                                done_n = _exit_state(k1 * REG_SIZE)
                                return k1, done_n.astype(jnp.int32)

                            jax.lax.while_loop(
                                rg_cond, rg_body, (jnp.int32(0), jnp.int32(0))
                            )

                        if REG_SIZE > 0:
                            sweep_ordered = sweep_ordered_regions

                        def sweep_stream():
                            """Memory-order sweep with merged NSC-super-
                            cluster meta DMAs, for tiles where the ordered
                            early exit can't fire (incoherent directions —
                            they visit ~65% of all superclusters, so fewer,
                            bigger transfers beat ordering)."""
                            n_chunks = (sc_n + NSC - 1) // NSC

                            def ch_cond(carry):
                                c, done = carry
                                return (c < n_chunks) & (done == 0)

                            def ch_body(carry):
                                c, done = carry
                                base = sc_lo + c * NSC
                                # per-sc pass bits packed into one scalar
                                # so the sweep below can be a fori_loop —
                                # unrolling it would inline the whole
                                # cluster sweep (128 MT evals) NSC times
                                hitbits = jnp.int32(0)
                                n_sc_total = sc_aabb.shape[1]
                                for k in range(NSC):
                                    bump(1)
                                    # tail candidates are gated off below
                                    # but their slab test still executes —
                                    # clamp the SMEM column
                                    s = jnp.minimum(base + k, n_sc_total - 1)
                                    shit = alive & _slab_cols(
                                        sc_aabb, s, ox, oy, oz, *inv,
                                        best_t[:],
                                    )
                                    if any_hit:
                                        shit = shit & (best_prim[:] < 0.0)
                                    bit = (
                                        jnp.any(shit) & (c * NSC + k < sc_n)
                                    ).astype(jnp.int32)
                                    hitbits = hitbits | (bit << k)

                                @pl.when(hitbits != 0)
                                def _():
                                    dma_m = pltpu.make_async_copy(
                                        cl_meta_hbm.at[
                                            :,
                                            pl.ds(
                                                base * SC_GROUP,
                                                NSC * SC_GROUP,
                                            ),
                                        ],
                                        clm,
                                        sem_m,
                                    )
                                    dma_m.start()
                                    dma_m.wait()

                                    def sweep_k(k, _):
                                        def do_k():
                                            bump(2)
                                            sweep_clusters(
                                                sc_mcount[base + k],
                                                k * SC_GROUP,
                                            )
                                        # chunk gates used the best_t from
                                        # BEFORE this chunk's sweeps —
                                        # conservative; gate8 re-gates per
                                        # cluster with the tightened t
                                        pl.when(
                                            ((hitbits >> k) & 1) == 1
                                        )(do_k)
                                        return 0

                                    jax.lax.fori_loop(0, NSC, sweep_k, 0)

                                if any_hit:
                                    done_n = ~jnp.any(
                                        alive & (best_prim[:] < 0.0)
                                    )
                                else:
                                    done_n = done != 0
                                return c + 1, done_n.astype(jnp.int32)

                            jax.lax.while_loop(
                                ch_cond, ch_body, (jnp.int32(0), jnp.int32(0))
                            )

                        if _STREAM == "0":
                            sweep_ordered()
                        elif _STREAM == "1":
                            sweep_stream()
                        else:
                            pl.when(exit_ok)(sweep_ordered)
                            pl.when(~exit_ok)(sweep_stream)

                    return 0

                jax.lax.fori_loop(0, n_inst, inst_body, 0)

            _sweep_instances(alive)

        t_out[:] = best_t[:]
        prim_out[:] = best_prim[:].astype(jnp.int32)
        u_out[:] = best_u[:]
        v_out[:] = best_v[:]
        inst_out[:] = best_inst[:].astype(jnp.int32)
        if not any_hit:
            slot_out[:] = best_slot[:].astype(jnp.int32)

    return kernel


def _ray_tiles(o, d, t_max, n_pad):
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tiles = []
    for arr in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max):
        a = jnp.zeros((n_pad,), jnp.float32).at[:n].set(arr)
        tiles.append(a.reshape(-1, LANES))
    return tiles


@functools.partial(
    jax.jit, static_argnames=("n_inst", "identity", "any_hit")
)
def _call(tiles, dev_c, n_inst: int, identity: bool, any_hit: bool):
    n_pad = tiles[0].shape[0] * LANES
    rows = n_pad // LANES
    sub = min(SUBLANES, rows)
    grid = (rows // sub,)
    ray_spec = pl.BlockSpec(
        (sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_kernel(n_inst, identity, any_hit, stats=_STATS, sub=sub)
    out_shapes = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]
    out_specs = [ray_spec] * 5
    if not any_hit:  # hit slot (see _make_kernel)
        out_shapes.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
        out_specs.append(ray_spec)
    if _STATS:
        # mosaic wants 8-divisible sublane blocks even in SMEM: each
        # program gets an (8, 8) block and writes row 0; the host slices
        # [::8]
        out_shapes.append(
            jax.ShapeDtypeStruct((grid[0] * 8, 8), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((8, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM)
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_aabb [6, I]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_minv [12, I]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_sc [3, I]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sc_aabb [6, S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sc_mcount [S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sc_order [6, S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sc_key [6, S]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # reg_aabb [6, 6*R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # root_aabb [6, 8]
            pl.BlockSpec(memory_space=_HBM_SPACE),  # cl_meta [8, S*128]
            pl.BlockSpec(memory_space=_HBM_SPACE),  # blocks [16, K*256]
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        # CPU (tests) runs the kernel in the pallas interpreter
        interpret=jax.default_backend() == "cpu",
        scratch_shapes=([pltpu.VMEM((sub, LANES), jnp.float32)]
                        if not any_hit else [])  # best_slot
        + [
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            pltpu.VMEM((sub, LANES), jnp.float32),
            # _CLM_GROUPS supercluster meta groups (stream path needs NSC;
            # the ordered path uses columns [0, SC_GROUP) only)
            pltpu.SMEM((CL_META_ROWS, _CLM_GROUPS * SC_GROUP), jnp.float32),
            pltpu.SMEM((TRI_COMPONENTS, CLUSTER_SIZE), jnp.float32),
            pltpu.SMEM((8, SC_GROUP), jnp.int32),  # twopass sel list (row 0)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(
        *tiles,
        dev_c["inst_aabb"],
        dev_c["inst_minv"],
        dev_c["inst_sc"],
        dev_c["sc_aabb"],
        dev_c["sc_mcount"],
        dev_c["sc_order"],
        dev_c["sc_key"],
        dev_c["reg_aabb"],
        dev_c["root_aabb"],
        dev_c["cl_meta"],
        dev_c["blocks"],
    )


def _pad_size(n: int) -> int:
    if n >= RAY_TILE:
        return -(-n // RAY_TILE) * RAY_TILE
    return -(-n // LANES) * LANES


def intersect_closest_clustered(dev_c: Dict, o, d, t_max,
                                identity: bool = True):
    n = o.shape[0]
    tiles = _ray_tiles(o, d, t_max, _pad_size(n))
    n_inst = dev_c["inst_aabb"].shape[1]
    res = _call(tiles, dev_c, n_inst, identity, False)
    t, prim, u, v, inst, slot = res[:6]
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    miss = prim < 0
    out = {
        "t": jnp.where(miss, t_max_b, t),
        "prim": prim,
        "u": u.reshape(-1)[:n],
        "v": v.reshape(-1)[:n],
        "hit": ~miss,
        "inst": inst.reshape(-1)[:n],
        # global hit slot (cid*CLUSTER_SIZE + in-cluster index), -1 on
        # miss: keys the cluster-block attribute fetch (slot_fetch.py)
        "slot": slot.reshape(-1)[:n],
    }
    if _STATS:
        out["stats"] = jnp.sum(res[6][::8], axis=0)
    return out


def intersect_any_clustered(dev_c: Dict, o, d, t_max,
                            identity: bool = True):
    n = o.shape[0]
    tiles = _ray_tiles(o, d, t_max, _pad_size(n))
    n_inst = dev_c["inst_aabb"].shape[1]
    prim = _call(tiles, dev_c, n_inst, identity, True)[1]
    return (prim.reshape(-1)[:n]) >= 0
