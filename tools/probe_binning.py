"""Ray-ordering coherence probe for the clustered traversal (real chip).

The bounce-ray wall (PERF.md round-4: 0.38 Mrays/s vs 1.7-1.9 coherent)
is tile direction-spread: tile gates are any-lane unions, so a [16,128]
tile of incoherent rays visits ~2/3 of all superclusters. This probe
measures how much of the coherent rate different lane ORDERINGS recover
on a REALISTIC bounce workload (origins = primary-ray hit points in
pixel-swizzle order, cosine-ish hemisphere directions), with the
permutation applied host-side so the number isolates coherence from
permute cost (the permute itself measured ~free on terrain-class
dispatches, PERF.md round-4 compaction table).

Orderings:
  asis       pixel-swizzle order (what the fused pipeline dispatches now)
  octant     stable 8-bin partition by direction-sign octant
  mort_oct   sort by morton(origin) * 8 + octant  (position-major)
  oct_mort   sort by octant << 18 | morton(origin) (direction-major)
  oct_cone   sort by octant, then 4x4 quantized direction, then morton
             (direction cone-major; tests whether finer direction
             coherence beats position coherence)

Run: python tools/probe_binning.py [n_rep]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np

import fredholm_tpu.accel.pallas_clustered as pc
from fredholm_tpu.accel.bvh import build_bvh
from fredholm_tpu.accel.cluster import build_tlas, extract_hierarchy
from fredholm_tpu.core.swizzle import swizzled_pixel_coords
from fredholm_tpu.scene.procedural import terrain


def morton18(p, lo, hi):
    """6-bit-per-axis morton code of points p in box [lo, hi] -> [N]."""
    q = np.clip((p - lo) / np.maximum(hi - lo, 1e-9) * 64, 0, 63).astype(
        np.uint32
    )

    def spread(x):
        x = (x | (x << 8)) & 0x0300F
        x = (x | (x << 4)) & 0x030C3
        x = (x | (x << 2)) & 0x09249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sc = terrain()
    v = sc.vertices[sc.indices]
    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    b = build_bvh(v.min(1), v.max(1), thread=False)
    tlas = build_tlas([extract_hierarchy(b, v0, e1, e2)], [(0, np.eye(4))])
    clusters = pc.prepare_clustered(tlas)

    W, H = 512, 288
    N = W * H
    # primary rays in PIXEL-SWIZZLE lane order — exactly the order the
    # fused pipeline dispatches (pt_fused.py render loop)
    px_u, py_u = swizzled_pixel_coords(W, H, 0)
    px = (np.asarray(px_u).astype(np.float32) / W - 0.5) * 1.2
    py = -(np.asarray(py_u).astype(np.float32) / H - 0.5) * 0.7 - 0.25
    d = np.stack([px, py, -np.ones(N)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0, 4.5, 11.0]], np.float32), (N, 1))

    r = pc.intersect_closest_clustered(
        clusters, jnp.asarray(o), jnp.asarray(d), 1e9
    )
    hit = np.asarray(r["hit"])
    t = np.asarray(r["t"])
    print(f"primary hits: {hit.sum()}/{N}", flush=True)

    # realistic bounce workload: origins at hit points (miss lanes dead),
    # cosine-sampled directions about +y (terrain normals are up-ish)
    rng = np.random.default_rng(0)
    bo = (o + t[:, None] * d + np.array([0, 1e-3, 0], np.float32)).astype(
        np.float32
    )
    u1, u2 = rng.random(N), rng.random(N)
    st = np.sqrt(u1)
    bd = np.stack(
        [st * np.cos(2 * np.pi * u2), np.sqrt(1 - u1),
         st * np.sin(2 * np.pi * u2)], -1
    ).astype(np.float32)
    alive = hit  # sky misses are dead lanes, as in the real wavefront
    frac = alive.mean()
    print(f"bounce alive fraction: {frac:.3f}", flush=True)

    oct3 = (
        (bd[:, 0] < 0).astype(np.uint32)
        | ((bd[:, 1] < 0).astype(np.uint32) << 1)
        | ((bd[:, 2] < 0).astype(np.uint32) << 2)
    )
    lo, hi = v0.min(0), v0.max(0)
    mort = morton18(bo, lo, hi)
    # 4x4 az/el quantization within the octant for finer direction bins
    az = np.clip(
        (np.arctan2(bd[:, 2], bd[:, 0]) / np.pi * 0.5 + 0.5) * 16, 0, 15
    ).astype(np.uint32)
    el = np.clip((bd[:, 1] * 0.5 + 0.5) * 16, 0, 15).astype(np.uint32)

    dead_key = np.uint64(1) << np.uint64(40)  # dead lanes to the tail

    def order(key):
        k = key.astype(np.uint64) + np.where(alive, 0, dead_key)
        return np.argsort(k, kind="stable")

    perms = {
        "asis": np.arange(N),
        "octant": order(oct3),
        "mort_oct": order(mort.astype(np.uint64) * 8 + oct3),
        "oct_mort": order((oct3.astype(np.uint64) << 18) | mort),
        "oct_cone": order(
            (az.astype(np.uint64) << 26) | (el.astype(np.uint64) << 22)
            | mort
        ),
    }

    tm = np.where(alive, 1e9, -1.0).astype(np.float32)
    base_hits = None
    for name, p in perms.items():
        oj = jnp.asarray(bo[p])
        dj = jnp.asarray(bd[p])
        tj = jnp.asarray(tm[p])
        rr = pc.intersect_closest_clustered(clusters, oj, dj, tj)
        float(jnp.sum(rr["t"] * 0))
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            rr = pc.intersect_closest_clustered(clusters, oj, dj, tj)
            s = float(jnp.sum(jnp.where(rr["hit"], 1.0, 0.0)))
            dt = min(dt, time.time() - t0)
        if base_hits is None:
            base_hits = s
        assert s == base_hits, f"{name}: hits {s} != {base_hits}"
        print(
            f"{name:9s}: {dt*1e3:7.1f} ms ({N/dt/1e6:5.2f} Mrays/s, "
            f"alive {N*frac/dt/1e6:5.2f}) hits={s:.0f}", flush=True,
        )


if __name__ == "__main__":
    main()
