"""Triangle clustering for the two-level Pallas traversal.

Cuts the SAH BVH at subtrees of <= CLUSTER_SIZE triangles, yielding K
spatially-coherent clusters with tight AABBs whose triangles are contiguous
in the BVH's reordered primitive list. The Pallas kernel
(accel/pallas_clustered.py) tests each ray tile against the K cluster boxes
(SMEM scalars, real branches) and DMAs only the HIT clusters' triangle
blocks into SMEM — the TPU analog of BVH traversal's node culling, with the
tree walk replaced by a predicated linear sweep over treelets.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .bvh import BVH

CLUSTER_SIZE = 256
# v0.xyz, e1.xyz, e2.xyz, prim_id (+ padding rows: DMA slices must be
# 8-row aligned on TPU)
TRI_COMPONENTS = 16


@dataclasses.dataclass
class Clusters:
    aabb_lo: np.ndarray  # [K, 3]
    aabb_hi: np.ndarray  # [K, 3]
    counts: np.ndarray  # [K] int32 (<= CLUSTER_SIZE)
    blocks: np.ndarray  # [TRI_COMPONENTS, K * CLUSTER_SIZE] float32

    @property
    def n_clusters(self) -> int:
        return int(self.counts.shape[0])


def extract_clusters(
    bvh: BVH, tri_v0, tri_e1, tri_e2, max_size: int = CLUSTER_SIZE
) -> Clusters:
    n = bvh.n_nodes
    # subtree prim counts and range starts (leaf ranges are contiguous per
    # subtree by construction of the partitioning builder)
    counts = np.zeros(n, np.int64)
    starts = np.zeros(n, np.int64)
    # children have larger ids than parents in both builders
    for i in range(n - 1, -1, -1):
        if bvh.left[i] < 0:
            counts[i] = bvh.leaf_count[i]
            starts[i] = bvh.leaf_start[i]
        else:
            l, r = bvh.left[i], bvh.right[i]
            counts[i] = counts[l] + counts[r]
            starts[i] = min(starts[l], starts[r])

    clusters = []
    stack = [0]
    while stack:
        node = stack.pop()
        if counts[node] <= max_size or bvh.left[node] < 0:
            clusters.append(node)
        else:
            stack.append(int(bvh.right[node]))
            stack.append(int(bvh.left[node]))

    k = len(clusters)
    aabb_lo = np.stack([bvh.bounds_min[c] for c in clusters])
    aabb_hi = np.stack([bvh.bounds_max[c] for c in clusters])
    ccounts = np.asarray([counts[c] for c in clusters], np.int32)

    blocks = np.zeros((TRI_COMPONENTS, k * max_size), np.float32)
    for ci, node in enumerate(clusters):
        s = int(starts[node])
        c = int(counts[node])
        prim = bvh.prim_order[s : s + c]
        base = ci * max_size
        blocks[0:3, base : base + c] = tri_v0[prim].T
        blocks[3:6, base : base + c] = tri_e1[prim].T
        blocks[6:9, base : base + c] = tri_e2[prim].T
        blocks[9, base : base + c] = prim.astype(np.float32)
        blocks[9, base + c : base + max_size] = -1.0

    return Clusters(
        aabb_lo=aabb_lo.astype(np.float32),
        aabb_hi=aabb_hi.astype(np.float32),
        counts=ccounts,
        blocks=blocks,
    )
