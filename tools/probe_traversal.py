"""Traversal cost-breakdown probe (real chip).

Times the clustered traversal on the 1M-tri terrain with parts of the
kernel ablated (FREDHOLM_TRAV_ABLATE env var, accel/pallas_clustered.py):

  full      everything
  notri     Moller-Trumbore math stubbed -> gates + DMA + loop overhead
  nogrp     sub-group sweep skipped      -> cluster gates + block DMA
  noblkdma  triangle-block DMA skipped   -> instance/sc/cluster gates only

Run: for a in "" notri nogrp noblkdma; do
       FREDHOLM_TRAV_ABLATE=$a python tools/probe_traversal.py; done
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
from fredholm_tpu.scene.procedural import terrain


def main():
    print(f"ablate={pc._ABLATE!r}", flush=True)
    sc = terrain()
    v = sc.vertices[sc.indices]
    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    b = build_bvh(v.min(1), v.max(1), thread=False)
    tlas = build_tlas(
        [extract_hierarchy(b, v0, e1, e2)], [(0, np.eye(4))]
    )
    clusters = pc.prepare_clustered(tlas)

    W, H = 512, 288
    N = W * H
    rng = np.random.default_rng(0)
    px = (np.arange(N) % W / W - 0.5) * 1.2
    py = -((np.arange(N) // W) / H - 0.5) * 0.7 - 0.25
    d = np.stack([px, py, -np.ones(N)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0, 4.5, 11.0]], np.float32), (N, 1))
    bo = np.stack(
        [rng.uniform(-10, 10, N), rng.uniform(0, 2, N),
         rng.uniform(-10, 10, N)], -1
    ).astype(np.float32)
    bd = rng.normal(size=(N, 3)).astype(np.float32)
    bd[:, 1] = np.abs(bd[:, 1])
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)

    def timed(name, o, d, reps=3):
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        r = pc.intersect_closest_clustered(clusters, oj, dj, 1e9)
        float(jnp.sum(r["t"] * 0))
        # min over reps: single-shot timings on the tunneled chip vary ~2x
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r = pc.intersect_closest_clustered(clusters, oj, dj, 1e9)
            s = float(jnp.sum(jnp.where(r["hit"], 1.0, 0.0)))
            dt = min(dt, time.time() - t0)
        print(
            f"{name}: {dt*1e3:7.1f} ms ({N/dt/1e6:5.2f} Mrays/s) "
            f"hits={s:.0f}", flush=True,
        )
        if "stats" in r:
            st = np.asarray(r["stats"])
            n_tiles = -(-N // pc.RAY_TILE)
            per = ", ".join(
                f"{k}={v/n_tiles:.0f}"
                for k, v in zip(pc.STAT_NAMES, st)
            )
            print(f"  per-tile: {per}", flush=True)

    timed("primary", o, d)
    timed("bounce ", bo, bd)


if __name__ == "__main__":
    main()
