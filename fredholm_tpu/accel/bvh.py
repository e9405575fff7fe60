"""Binned-SAH BVH builder with direction-ordered skip links.

TPU-native replacement for the reference's OptiX GAS/IAS hardware
acceleration structures (/root/reference/fredholm/include/fredholm/
renderer.h:434-552). TPUs have no RT cores and no per-lane stacks that map
well onto the vector unit, so traversal is *stackless*: every node stores a
"hit" link (enter my subtree) and a "miss" link (skip my subtree), and a
wavefront of rays walks the threaded tree with pure gathers
(see traverse.py).

Ordered (near-child-first) traversal matters for closest-hit performance,
but a skip-pointer threading bakes in one child order. We therefore
precompute SIX threadings — children ordered by centroid along each axis,
both signs — and each ray picks the threading matching the dominant sign
pattern of its direction. That recovers most of front-to-back ordering with
zero per-step control flow.

The builder itself is host-side numpy (binned SAH, vectorized per node);
an optional C++ builder (native/) can replace it for very large scenes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

N_BINS = 16
LEAF_SIZE = 4
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.0


@dataclasses.dataclass
class BVH:
    """Flattened BVH in SoA layout.

    nodes: n
    bounds_min/max: [n, 3] float32
    left/right: [n] int32 child node ids (-1 for leaves)
    leaf_start/leaf_count: [n] int32 ranges into the reordered tri list
    axis: [n] int32 split axis
    links: [6, n, 2] int32 — per direction-ordering (axis*2+sign):
        links[o, i, 0] = hit link (first child in order o; for leaves, the
        miss link), links[o, i, 1] = miss link. n is the end sentinel.
    prim_order: [F] int32 — tri index permutation (leaf ranges are
        contiguous in this order)
    """

    bounds_min: np.ndarray
    bounds_max: np.ndarray
    left: np.ndarray
    right: np.ndarray
    leaf_start: np.ndarray
    leaf_count: np.ndarray
    axis: np.ndarray
    links: np.ndarray
    prim_order: np.ndarray

    @property
    def n_nodes(self) -> int:
        return int(self.bounds_min.shape[0])


def build_bvh(
    tri_lo: np.ndarray,
    tri_hi: np.ndarray,
    leaf_size: int = LEAF_SIZE,
    prefer_native: bool = True,
    thread: bool = True,
) -> BVH:
    """Build from per-triangle AABBs [F, 3].

    Uses the C++ builder (native/bvh_builder.cpp via ctypes) when available;
    the numpy path below is the portable fallback with identical output.
    thread=False skips the six skip-link threadings (a Python preorder walk
    per ordering — 13 s at 1M tris); million-tri scenes traverse through the
    cluster hierarchy and never read the links.
    """
    f = tri_lo.shape[0]
    assert f > 0

    if prefer_native and f >= 256:
        from .native import build_bvh_native

        out = build_bvh_native(
            np.asarray(tri_lo, np.float32), np.asarray(tri_hi, np.float32),
            leaf_size,
        )
        if out is not None:
            (bmin, bmax, left, right, leaf_start, leaf_count, axis,
             prim_order) = out
            bvh = BVH(
                bounds_min=bmin,
                bounds_max=bmax,
                left=left,
                right=right,
                leaf_start=leaf_start,
                leaf_count=leaf_count,
                axis=axis,
                links=np.zeros((6, bmin.shape[0], 2), np.int32),
                prim_order=prim_order,
            )
            if thread:
                _thread_links(bvh)
            return bvh

    centroid = 0.5 * (tri_lo + tri_hi)

    order = np.arange(f, dtype=np.int64)

    bounds_min, bounds_max = [], []
    lefts, rights, leaf_starts, leaf_counts, axes = [], [], [], [], []

    def new_node():
        bounds_min.append(None)
        bounds_max.append(None)
        lefts.append(-1)
        rights.append(-1)
        leaf_starts.append(0)
        leaf_counts.append(0)
        axes.append(0)
        return len(lefts) - 1

    root = new_node()
    # explicit stack of (node_id, start, end) over `order`
    stack = [(root, 0, f)]
    while stack:
        node, start, end = stack.pop()
        idx = order[start:end]
        lo = tri_lo[idx]
        hi = tri_hi[idx]
        nb_min = lo.min(axis=0)
        nb_max = hi.max(axis=0)
        bounds_min[node] = nb_min
        bounds_max[node] = nb_max
        count = end - start

        if count <= leaf_size:
            leaf_starts[node] = start
            leaf_counts[node] = count
            continue

        c = centroid[idx]
        c_min = c.min(axis=0)
        c_max = c.max(axis=0)
        extent = c_max - c_min

        # binned SAH over all 3 axes at once
        best_cost = np.inf
        best_axis = -1
        best_split = -1
        scale = np.where(extent > 0.0, N_BINS / np.maximum(extent, 1e-30), 0.0)
        bin_idx_all = np.minimum(
            ((c - c_min) * scale).astype(np.int32), N_BINS - 1
        )  # [count, 3]
        for ax in range(3):
            if extent[ax] <= 0.0:
                continue
            b = bin_idx_all[:, ax]
            # per-bin counts and bounds
            counts = np.bincount(b, minlength=N_BINS)
            bl = np.full((N_BINS, 3), np.inf, np.float32)
            bh = np.full((N_BINS, 3), -np.inf, np.float32)
            np.minimum.at(bl, b, lo)
            np.maximum.at(bh, b, hi)
            # prefix/suffix sweeps
            cl = np.minimum.accumulate(bl, axis=0)
            ch = np.maximum.accumulate(bh, axis=0)
            cr_l = np.minimum.accumulate(bl[::-1], axis=0)[::-1]
            cr_h = np.maximum.accumulate(bh[::-1], axis=0)[::-1]
            n_l = np.cumsum(counts)
            n_r = count - n_l

            def area(lo_, hi_):
                d = np.maximum(hi_ - lo_, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            # split after bin s (s in [0, N_BINS-2])
            a_l = area(cl[:-1], ch[:-1])
            a_r = area(cr_l[1:], cr_h[1:])
            cost = a_l * n_l[:-1] + a_r * n_r[:-1]
            cost = np.where((n_l[:-1] == 0) | (n_r[:-1] == 0), np.inf, cost)
            s = int(np.argmin(cost))
            if cost[s] < best_cost:
                best_cost = cost[s]
                best_axis = ax
                best_split = s

        if best_axis < 0:
            # all centroids coincide: median split on the index order
            mid = start + count // 2
        else:
            b = bin_idx_all[:, best_axis]
            go_left = b <= best_split
            n_left = int(go_left.sum())
            if n_left == 0 or n_left == count:
                mid = start + count // 2
            else:
                # stable partition of the order slice
                order[start:end] = np.concatenate(
                    [idx[go_left], idx[~go_left]]
                )
                mid = start + n_left

        axes[node] = best_axis if best_axis >= 0 else 0
        l = new_node()
        r = new_node()
        lefts[node] = l
        rights[node] = r
        stack.append((r, mid, end))
        stack.append((l, start, mid))

    n = len(lefts)
    bvh = BVH(
        bounds_min=np.stack(bounds_min).astype(np.float32),
        bounds_max=np.stack(bounds_max).astype(np.float32),
        left=np.asarray(lefts, np.int32),
        right=np.asarray(rights, np.int32),
        leaf_start=np.asarray(leaf_starts, np.int32),
        leaf_count=np.asarray(leaf_counts, np.int32),
        axis=np.asarray(axes, np.int32),
        links=np.zeros((6, n, 2), np.int32),
        prim_order=order.astype(np.int32),
    )
    if thread:
        _thread_links(bvh)
    return bvh


def _thread_links(bvh: BVH) -> None:
    """Fill links[o] for the six child orderings.

    Ordering o = axis*2 + sign: children visited smaller-centroid-first when
    sign=0, larger-first when sign=1, along `axis`. For simplicity and
    robustness we order by the children's bounds centers along the axis.
    """
    n = bvh.n_nodes
    sentinel = n
    centers = 0.5 * (bvh.bounds_min + bvh.bounds_max)
    is_leaf = bvh.left < 0

    for axis in range(3):
        for sign in range(2):
            o = axis * 2 + sign
            hit = np.full(n, sentinel, np.int32)
            miss = np.full(n, sentinel, np.int32)
            # iterative preorder with explicit (node, escape) stack
            stack = [(0, sentinel)]
            while stack:
                node, escape = stack.pop()
                miss[node] = escape
                if is_leaf[node]:
                    hit[node] = escape
                    continue
                l, r = int(bvh.left[node]), int(bvh.right[node])
                cl = centers[l, axis]
                cr = centers[r, axis]
                # sign=0: smaller-centroid child first; sign=1: larger first
                if (cr < cl) == bool(sign):
                    first, second = l, r
                else:
                    first, second = r, l
                hit[node] = first
                stack.append((second, escape))
                stack.append((first, second))
            bvh.links[o, :, 0] = hit
            bvh.links[o, :, 1] = miss


def refit_bvh(bvh: BVH, tri_lo: np.ndarray, tri_hi: np.ndarray) -> None:
    """Refit node bounds bottom-up for animated geometry (keeps topology).

    Host-side analog of rebuilding the IAS per animation frame
    (renderer.h:614-640).
    """
    from .native import refit_bvh_native

    if bvh.n_nodes >= 512 and refit_bvh_native(bvh, tri_lo, tri_hi):
        return
    n = bvh.n_nodes
    # process nodes in reverse creation order: children always have larger ids
    lo = bvh.bounds_min
    hi = bvh.bounds_max
    for node in range(n - 1, -1, -1):
        if bvh.left[node] < 0:
            s, c = bvh.leaf_start[node], bvh.leaf_count[node]
            prim = bvh.prim_order[s : s + c]
            lo[node] = tri_lo[prim].min(axis=0)
            hi[node] = tri_hi[prim].max(axis=0)
        else:
            l, r = bvh.left[node], bvh.right[node]
            lo[node] = np.minimum(lo[l], lo[r])
            hi[node] = np.maximum(hi[l], hi[r])


def flatten_leaf_prims(bvh: BVH, pad: int = LEAF_SIZE):
    """Return (leaf_prim_ids [n_nodes, pad] int32, valid mask) so traversal
    fetches a leaf's triangles with one static-shape gather. Non-leaf rows
    and padding are -1."""
    n = bvh.n_nodes
    out = np.full((n, pad), -1, np.int32)
    for node in range(n):
        c = int(bvh.leaf_count[node])
        if bvh.left[node] < 0 and c > 0:
            s = int(bvh.leaf_start[node])
            c = min(c, pad)
            out[node, :c] = bvh.prim_order[s : s + c]
    return out
