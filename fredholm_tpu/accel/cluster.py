"""Triangle cluster hierarchy for the Pallas traversal.

TPU-native analog of OptiX's two-level GAS/IAS acceleration structures
(/root/reference/fredholm/include/fredholm/renderer.h:434-552): the SAH BVH
is cut into three predicated levels instead of a per-ray tree walk —

  instance  ->  supercluster (<= 128 clusters)  ->  cluster (<= 256 tris)

The Pallas kernel (accel/pallas_clustered.py) sweeps each ray tile down the
levels: instance AABBs and supercluster AABBs live in SMEM as scalars;
member-cluster AABB groups ([8, 128]) and triangle blocks ([16, 256]) are
DMA'd from HBM only when the tile's rays actually overlap them. Ray
coherence within a tile makes most tests fail, so the expensive inner
sweeps run only for the handful of treelets a tile overlaps — the same
work-saving a per-ray tree walk gives, but with zero per-lane control flow
and only sequential, aligned DMA.

A BLAS (one per unique submesh, object space) is the GAS analog; instances
reference a BLAS plus a world transform, so device memory is O(unique
geometry) however many instances exist (the reference's IAS contract,
renderer.h:498-552).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .bvh import BVH

CLUSTER_SIZE = 128
# v0.xyz, e1.xyz, e2.xyz, prim_id, then rows 10-15 hold the 16-triangle
# SUB-GROUP AABBs (component c of group g at [10+c, g]) — a third gating
# level inside the cluster so a tile grazed by few rays skips most of the
# triangle sweep. (DMA slices must be 8-row aligned on TPU.)
TRI_COMPONENTS = 16
TRI_GROUP = 16
N_TRI_GROUPS = CLUSTER_SIZE // TRI_GROUP
# member-cluster groups are padded to one 128-lane DMA slice
SC_GROUP = 128
# supercluster cut target: small groups keep the unordered member sweep
# bounded once the supercluster loop itself is front-to-back ordered
SC_TARGET_MEMBERS = 32
# cl_meta rows: lo.xyz(0-2), hi.xyz(3-5), tri_count(6), block_id(7)
CL_META_ROWS = 8
# six iteration orders: axis*2 + sign (ascending along +axis / -axis)
N_ORDERS = 6
# 4th gating level: REG_SIZE consecutive superclusters of a visit order
# share one union AABB ("region"), so a tile that misses a far-field
# stretch of the front-to-back order pays one slab test instead of
# REG_SIZE. Round-3 stats motivated it: the per-tile gate floor was 539
# supercluster slab tests on the 1M-tri terrain. Measured on the chip
# (1M-tri terrain, same-day A/B): REG 0/2/4/8/16 -> primary 1.10 / 1.17 /
# ~1.55 / 1.46 / 1.30 Mrays/s, bounce flat 0.37-0.40; default 4.
# FREDHOLM_TRAV_REG=0 compiles the kernel without the level (tables are
# still built).
import os as _os

REG_SIZE = int(_os.environ.get("FREDHOLM_TRAV_REG", "4"))
# REG_SIZE >= 32 would overflow the int32 hitbits packing in the kernel's
# sweep_ordered_regions (bit << k) and silently drop supercluster visits
assert 0 <= REG_SIZE < 32, "FREDHOLM_TRAV_REG must be in [0, 32)"
_REG_BUILD = REG_SIZE if REG_SIZE > 0 else 8


@dataclasses.dataclass
class Hierarchy:
    """One BLAS: superclusters over clusters over a contiguous tri order.

    sc_aabb:   [6, S] float32 (lo.xyz, hi.xyz), SMEM-resident at trace
    sc_mcount: [S] int32 member-cluster counts (<= SC_GROUP)
    sc_order:  [6, S] int32 — supercluster visit order per direction class
               (axis*2+sign), sorted front-to-back so the kernel's best-t
               cap can terminate the sweep early
    sc_key:    [6, S] float32 — the (sign-flipped) sorted slab coordinate
               lo/hi[axis] driving the kernel's sound early-exit bound
    cl_meta:   [CL_META_ROWS, S * SC_GROUP] float32 member AABBs + counts +
               global block ids (HBM; one [8, 128] DMA per hit supercluster)
    blocks:    [TRI_COMPONENTS, K * CLUSTER_SIZE] float32 triangle SoA
               (HBM; one [16, 256] DMA per hit cluster)
    root_lo/hi: [3] float32 object-space bounds (instance AABB source)
    """

    sc_aabb: np.ndarray
    sc_mcount: np.ndarray
    sc_order: np.ndarray
    sc_key: np.ndarray
    cl_meta: np.ndarray
    blocks: np.ndarray
    root_lo: np.ndarray
    root_hi: np.ndarray
    # reg_aabb: [6, N_ORDERS * R] float32, R = ceil(S / REG_SIZE): region
    # r of visit order o (union AABB over order positions [r*REG,
    # (r+1)*REG)) at column o * R + r — the kernel's 4th gating level
    reg_aabb: np.ndarray = None
    # refit cache (animation path): the cut topology, so per-frame updates
    # only rewrite bounds + triangle data instead of re-cutting
    sc_nodes: np.ndarray = None       # [S] BVH node of each supercluster
    cluster_nodes: np.ndarray = None  # [K] BVH node of each cluster
    mem_slots: np.ndarray = None      # [K] cl_meta column per cluster
    perm: np.ndarray = None           # [K*CLUSTER_SIZE] prim ids, -1 pads

    @property
    def n_superclusters(self) -> int:
        return int(self.sc_mcount.shape[0])

    @property
    def n_clusters(self) -> int:
        return int(self.blocks.shape[1] // CLUSTER_SIZE)


def _subtree_ranges(bvh: BVH) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-node (prim count, prim range start, cluster count). Children have
    larger ids than parents in both builders, so one reverse sweep fills
    all three bottom-up."""
    n = bvh.n_nodes
    counts = np.zeros(n, np.int64)
    starts = np.zeros(n, np.int64)
    n_cl = np.zeros(n, np.int64)
    left = bvh.left
    right = bvh.right
    for i in range(n - 1, -1, -1):
        if left[i] < 0:
            counts[i] = bvh.leaf_count[i]
            starts[i] = bvh.leaf_start[i]
            n_cl[i] = 1
        else:
            l, r = left[i], right[i]
            counts[i] = counts[l] + counts[r]
            starts[i] = min(starts[l], starts[r])
            n_cl[i] = 1 if counts[i] <= CLUSTER_SIZE else n_cl[l] + n_cl[r]
    return counts, starts, n_cl


def _cut_clusters(bvh: BVH, counts, root: int, max_size: int) -> List[int]:
    """DFS cut of `root`'s subtree at subtrees of <= max_size prims."""
    out: List[int] = []
    stack = [root]
    while stack:
        node = stack.pop()
        if counts[node] <= max_size or bvh.left[node] < 0:
            out.append(node)
        else:
            stack.append(int(bvh.right[node]))
            stack.append(int(bvh.left[node]))
    return out


def extract_hierarchy(
    bvh: BVH,
    tri_v0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    prim_ids: np.ndarray | None = None,
) -> Hierarchy:
    """Cut the BVH into the two on-device levels.

    prim_ids maps BLAS-local triangle index -> the id recorded in blocks
    row 9 (global face id for shared/instanced geometry); defaults to the
    local index.
    """
    counts, starts, n_cl = _subtree_ranges(bvh)

    # supercluster cut: subtrees yielding <= SC_TARGET_MEMBERS clusters
    sc_nodes: List[int] = []
    stack = [0]
    while stack:
        node = stack.pop()
        if n_cl[node] <= SC_TARGET_MEMBERS or bvh.left[node] < 0:
            sc_nodes.append(node)
        else:
            stack.append(int(bvh.right[node]))
            stack.append(int(bvh.left[node]))

    s = len(sc_nodes)
    sc_aabb = np.zeros((6, s), np.float32)
    sc_mcount = np.zeros((s,), np.int32)
    cl_meta = np.zeros((CL_META_ROWS, s * SC_GROUP), np.float32)
    # empty member slots must fail every slab test
    cl_meta[0:3, :] = 1e30
    cl_meta[3:6, :] = -1e30

    cluster_nodes: List[int] = []
    mem_slots: List[int] = []
    for si, node in enumerate(sc_nodes):
        sc_aabb[0:3, si] = bvh.bounds_min[node]
        sc_aabb[3:6, si] = bvh.bounds_max[node]
        members = _cut_clusters(bvh, counts, node, CLUSTER_SIZE)
        assert len(members) <= SC_GROUP
        sc_mcount[si] = len(members)
        base = si * SC_GROUP
        for j, m in enumerate(members):
            cl_meta[0:3, base + j] = bvh.bounds_min[m]
            cl_meta[3:6, base + j] = bvh.bounds_max[m]
            cl_meta[6, base + j] = counts[m]
            cl_meta[7, base + j] = len(cluster_nodes)
            cluster_nodes.append(m)
            mem_slots.append(base + j)

    k = len(cluster_nodes)
    # per-slot prim permutation (the refit cache + the vectorized fill)
    perm = np.full((k * CLUSTER_SIZE,), -1, np.int64)
    for ci, node in enumerate(cluster_nodes):
        st = int(starts[node])
        c = int(counts[node])
        base = ci * CLUSTER_SIZE
        perm[base : base + c] = bvh.prim_order[st : st + c]

    blocks = _fill_blocks(perm, tri_v0, tri_e1, tri_e2, prim_ids)
    sc_order, sc_key = _direction_orders(sc_aabb)
    return Hierarchy(
        sc_aabb=sc_aabb,
        sc_mcount=sc_mcount,
        sc_order=sc_order,
        sc_key=sc_key,
        reg_aabb=_region_tables(sc_aabb, sc_order),
        cl_meta=cl_meta,
        blocks=blocks,
        root_lo=bvh.bounds_min[0].astype(np.float32).copy(),
        root_hi=bvh.bounds_max[0].astype(np.float32).copy(),
        sc_nodes=np.asarray(sc_nodes, np.int64),
        cluster_nodes=np.asarray(cluster_nodes, np.int64),
        mem_slots=np.asarray(mem_slots, np.int64),
        perm=perm,
    )


def _fill_blocks(perm, tri_v0, tri_e1, tri_e2, prim_ids=None):
    """Triangle-block SoA fill from the slot->prim permutation (shared by
    the initial build and per-frame refits): one C++ memory pass when the
    native lib is available, vectorized numpy otherwise."""
    if prim_ids is None:
        prim_ids = np.arange(tri_v0.shape[0], dtype=np.int64)
    from .native import blocks_fill_native

    nb = blocks_fill_native(
        perm, tri_v0, tri_e1, tri_e2, prim_ids, CLUSTER_SIZE, TRI_GROUP
    )
    if nb is not None:
        return nb
    n_slots = perm.shape[0]
    blocks = np.zeros((TRI_COMPONENTS, n_slots), np.float32)
    filled = perm >= 0
    p = np.where(filled, perm, 0)
    v0 = tri_v0[p].astype(np.float32)
    e1c = tri_e1[p].astype(np.float32)
    e2c = tri_e2[p].astype(np.float32)
    m = filled[None, :]
    blocks[0:3] = np.where(m, v0.T, 0.0)
    blocks[3:6] = np.where(m, e1c.T, 0.0)
    blocks[6:9] = np.where(m, e2c.T, 0.0)
    blocks[9] = np.where(filled, prim_ids[p].astype(np.float32), -1.0)
    # 16-triangle sub-group AABBs (BVH leaf order keeps groups tight);
    # padded slots contribute (+inf, -inf) so empty groups fail every slab
    lo3 = np.minimum(np.minimum(v0, v0 + e1c), v0 + e2c)
    hi3 = np.maximum(np.maximum(v0, v0 + e1c), v0 + e2c)
    lo3 = np.where(filled[:, None], lo3, 1e30)
    hi3 = np.where(filled[:, None], hi3, -1e30)
    n_groups = n_slots // TRI_GROUP
    glo = lo3.reshape(n_groups, TRI_GROUP, 3).min(axis=1)
    ghi = hi3.reshape(n_groups, TRI_GROUP, 3).max(axis=1)
    # group g of cluster ci lives in column ci*CLUSTER_SIZE + g
    k = n_slots // CLUSTER_SIZE
    cols = (
        np.arange(k)[:, None] * CLUSTER_SIZE + np.arange(N_TRI_GROUPS)
    ).ravel()
    blocks[10:13, :] = 1e30
    blocks[13:16, :] = -1e30
    blocks[10:13, cols] = glo.reshape(k * N_TRI_GROUPS, 3).T
    blocks[13:16, cols] = ghi.reshape(k * N_TRI_GROUPS, 3).T
    return blocks


def refit_hierarchy(
    h: Hierarchy,
    bvh: BVH,
    tri_v0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    prim_ids: np.ndarray | None = None,
) -> Hierarchy:
    """Per-frame hierarchy update with FIXED cut topology: rewrite
    supercluster/cluster bounds from the refit BVH and re-fill triangle
    blocks through the cached permutation — the animation-step analog of
    OptiX's IAS/GAS refit (renderer.h:614-640) without re-cutting. The
    BVH must already be refit (accel.bvh.refit_bvh); topology (prim_order,
    tree shape) must be unchanged."""
    assert h.perm is not None, "hierarchy was built without a refit cache"
    sc_aabb = np.concatenate(
        [bvh.bounds_min[h.sc_nodes].T, bvh.bounds_max[h.sc_nodes].T]
    ).astype(np.float32)
    cl_meta = h.cl_meta.copy()
    cl_meta[0:3, h.mem_slots] = bvh.bounds_min[h.cluster_nodes].T
    cl_meta[3:6, h.mem_slots] = bvh.bounds_max[h.cluster_nodes].T
    blocks = _fill_blocks(h.perm, tri_v0, tri_e1, tri_e2, prim_ids)
    sc_order, sc_key = _direction_orders(sc_aabb)
    return dataclasses.replace(
        h,
        sc_aabb=sc_aabb,
        cl_meta=cl_meta,
        blocks=blocks,
        sc_order=sc_order,
        sc_key=sc_key,
        reg_aabb=_region_tables(sc_aabb, sc_order),
        root_lo=bvh.bounds_min[0].astype(np.float32).copy(),
        root_hi=bvh.bounds_max[0].astype(np.float32).copy(),
    )


def _direction_orders(sc_aabb: np.ndarray):
    """Front-to-back visit orders per direction class.

    For ordering o = axis*2 + sign the kernel walks superclusters with
    ascending slab coordinate in SIGN-FLIPPED space: key = lo[axis] for
    rays with d[axis] > 0, key = -hi[axis] for d[axis] < 0. Sorting by this
    key makes "every later box has key >= current key" true, which is what
    the kernel's early-exit lower bound (t_lb = (key - max o)/max d) needs
    to be sound.
    """
    s = sc_aabb.shape[1]
    sc_order = np.zeros((N_ORDERS, s), np.int32)
    sc_key = np.zeros((N_ORDERS, s), np.float32)
    for axis in range(3):
        for sign in range(2):
            o = axis * 2 + sign
            key = sc_aabb[axis] if sign == 0 else -sc_aabb[3 + axis]
            order = np.argsort(key, kind="stable").astype(np.int32)
            sc_order[o] = order
            sc_key[o] = key[order]
    return sc_order, sc_key


def _region_tables(sc_aabb: np.ndarray, sc_order: np.ndarray) -> np.ndarray:
    """Union AABBs over REG_SIZE-runs of each visit order (4th gate level).

    Region r of order o covers order positions [r*REG, (r+1)*REG); the
    tail region unions only the existing members. Layout [6, N_ORDERS*R]
    with (o, r) at column o*R + r."""
    s = sc_aabb.shape[1]
    r = -(-s // _REG_BUILD)
    reg = np.zeros((6, N_ORDERS * r), np.float32)
    # pad order positions with a sentinel that contributes an empty AABB
    lo = sc_aabb[0:3]
    hi = sc_aabb[3:6]
    for o in range(N_ORDERS):
        ids = sc_order[o]
        pad = r * _REG_BUILD - s
        plo = np.concatenate(
            [lo[:, ids], np.full((3, pad), 1e30, np.float32)], axis=1
        ).reshape(3, r, _REG_BUILD)
        phi = np.concatenate(
            [hi[:, ids], np.full((3, pad), -1e30, np.float32)], axis=1
        ).reshape(3, r, _REG_BUILD)
        reg[0:3, o * r : (o + 1) * r] = plo.min(axis=2)
        reg[3:6, o * r : (o + 1) * r] = phi.max(axis=2)
    return reg


def n_regions(n_sc: int) -> int:
    return -(-n_sc // _REG_BUILD)


# ---------------------------------------------------------------------------
# TLAS: instances over BLAS hierarchies


def _transform_aabb(lo: np.ndarray, hi: np.ndarray, m4: np.ndarray):
    """World AABB of an object-space AABB under an affine transform."""
    pts = np.array(
        [
            [x, y, z]
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ],
        np.float32,
    )
    w = pts @ np.asarray(m4, np.float32)[:3, :3].T + np.asarray(
        m4, np.float32
    )[:3, 3]
    return w.min(axis=0), w.max(axis=0)


@dataclasses.dataclass
class TLAS:
    """Flat concatenation of BLAS levels plus the instance table.

    inst_aabb: [6, I] world AABBs; inst_minv: [12, I] world->object affine
    rows; inst_sc: [3, I] int32 (supercluster base, count, region base)
    into the concatenated sc/region tables; inst_identity: True when every
    instance is the identity (the kernel then skips the per-instance ray
    transform). reg_aabb: per-order region unions, [6, N_ORDERS*R_total]
    with (order o, global region g) at column o*R_total + g.
    """

    sc_aabb: np.ndarray
    sc_mcount: np.ndarray
    sc_order: np.ndarray
    sc_key: np.ndarray
    cl_meta: np.ndarray
    blocks: np.ndarray
    inst_aabb: np.ndarray
    inst_minv: np.ndarray
    inst_sc: np.ndarray
    inst_identity: bool
    reg_aabb: np.ndarray = None

    @property
    def n_instances(self) -> int:
        return int(self.inst_aabb.shape[1])

    @property
    def n_superclusters(self) -> int:
        return int(self.sc_mcount.shape[0])


def build_tlas(
    blas_list: Sequence[Hierarchy],
    instances: Sequence[Tuple[int, np.ndarray]],
) -> TLAS:
    """instances: (blas index, object-to-world 4x4) pairs."""
    assert blas_list and instances
    sc_base = np.zeros(len(blas_list), np.int64)
    cl_base = np.zeros(len(blas_list), np.int64)
    reg_base = np.zeros(len(blas_list), np.int64)
    for b in range(1, len(blas_list)):
        sc_base[b] = sc_base[b - 1] + blas_list[b - 1].n_superclusters
        cl_base[b] = cl_base[b - 1] + blas_list[b - 1].n_clusters
        reg_base[b] = reg_base[b - 1] + n_regions(
            blas_list[b - 1].n_superclusters
        )

    sc_aabb = np.concatenate([h.sc_aabb for h in blas_list], axis=1)
    sc_mcount = np.concatenate([h.sc_mcount for h in blas_list])
    # per-BLAS segments of the order tables keep their local sort; entries
    # become global supercluster ids (the kernel walks one segment per
    # instance: sc_order[o, sc_base + k])
    sc_order = np.concatenate(
        [h.sc_order + np.int32(sc_base[b]) for b, h in enumerate(blas_list)],
        axis=1,
    )
    sc_key = np.concatenate([h.sc_key for h in blas_list], axis=1)
    metas = []
    for b, h in enumerate(blas_list):
        m = h.cl_meta.copy()
        m[7, :] += np.float32(cl_base[b])
        metas.append(m)
    cl_meta = np.concatenate(metas, axis=1)
    blocks = np.concatenate([h.blocks for h in blas_list], axis=1)
    # per-order region blocks: concat the order-o slice of every BLAS, then
    # stack the orders, so (o, reg_base[b] + r) sits at o*R_total + ...
    r_total = int(reg_base[-1]) + n_regions(blas_list[-1].n_superclusters)
    reg_aabb = np.zeros((6, N_ORDERS * r_total), np.float32)
    for o in range(N_ORDERS):
        off = 0
        for h in blas_list:
            rb = n_regions(h.n_superclusters)
            reg_aabb[:, o * r_total + off : o * r_total + off + rb] = (
                h.reg_aabb[:, o * rb : (o + 1) * rb]
            )
            off += rb

    n_i = len(instances)
    inst_aabb = np.zeros((6, n_i), np.float32)
    inst_minv = np.zeros((12, n_i), np.float32)
    inst_sc = np.zeros((3, n_i), np.int32)
    identity = True
    for i, (b, m4) in enumerate(instances):
        h = blas_list[b]
        m4 = np.asarray(m4, np.float32)
        lo, hi = _transform_aabb(h.root_lo, h.root_hi, m4)
        inst_aabb[0:3, i] = lo
        inst_aabb[3:6, i] = hi
        minv = np.linalg.inv(m4)
        inst_minv[:, i] = minv[:3, :].reshape(-1)
        inst_sc[0, i] = sc_base[b]
        inst_sc[1, i] = h.n_superclusters
        inst_sc[2, i] = reg_base[b]
        if not np.allclose(m4, np.eye(4), atol=1e-7):
            identity = False
    return TLAS(
        reg_aabb=reg_aabb,
        sc_aabb=sc_aabb,
        sc_mcount=sc_mcount,
        sc_order=sc_order,
        sc_key=sc_key,
        cl_meta=cl_meta,
        blocks=blocks,
        inst_aabb=inst_aabb,
        inst_minv=inst_minv,
        inst_sc=inst_sc,
        inst_identity=identity,
    )


def update_tlas_instances(
    dev_c, blas_list: Sequence[Hierarchy],
    instances: Sequence[Tuple[int, np.ndarray]],
):
    """O(I) instance-motion update: recompute ONLY the per-instance arrays
    of an already-uploaded clustered device dict (geometry blocks, cluster
    metadata, and supercluster tables are untouched and stay on device).

    The set_time analog for instanced scenes — contrast with rebuilding
    the whole TLAS (renderer.h:614-640 rebuilds the IAS the same way:
    new OptixInstance transforms over unchanged GASes)."""
    import jax.numpy as jnp

    sc_base = np.zeros(len(blas_list), np.int64)
    reg_base = np.zeros(len(blas_list), np.int64)
    for b in range(1, len(blas_list)):
        sc_base[b] = sc_base[b - 1] + blas_list[b - 1].n_superclusters
        reg_base[b] = reg_base[b - 1] + n_regions(
            blas_list[b - 1].n_superclusters
        )

    n_i = len(instances)
    inst_aabb = np.zeros((6, n_i), np.float32)
    inst_minv = np.zeros((12, n_i), np.float32)
    inst_sc = np.zeros((3, n_i), np.int32)
    for i, (b, m4) in enumerate(instances):
        h = blas_list[b]
        m4 = np.asarray(m4, np.float32)
        lo, hi = _transform_aabb(h.root_lo, h.root_hi, m4)
        inst_aabb[0:3, i] = lo
        inst_aabb[3:6, i] = hi
        inst_minv[:, i] = np.linalg.inv(m4)[:3, :].reshape(-1)
        inst_sc[0, i] = sc_base[b]
        inst_sc[1, i] = h.n_superclusters
        inst_sc[2, i] = reg_base[b]
    new = dict(dev_c)
    new["inst_aabb"] = jnp.asarray(inst_aabb)
    new["inst_minv"] = jnp.asarray(inst_minv)
    new["inst_sc"] = jnp.asarray(inst_sc)
    # the kernels clamp best_t to the root-box exit distance — it must
    # track the moved instances or hits beyond the stale box are dropped
    root = np.zeros((6, 8), np.float32)
    root[0:3, 0] = inst_aabb[0:3].min(axis=1)
    root[3:6, 0] = inst_aabb[3:6].max(axis=1)
    new["root_aabb"] = jnp.asarray(root)
    return new


def extract_clusters(bvh: BVH, tri_v0, tri_e1, tri_e2) -> Hierarchy:
    """Backwards-compatible name: single-BLAS hierarchy extraction."""
    return extract_hierarchy(bvh, tri_v0, tri_e1, tri_e2)
