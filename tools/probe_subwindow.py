"""Real-chip A/B: sub-window sweep gating (FREDHOLM_TRAV_SUBROWS).

Times the ordered clustered kernel on the realistic terrain workload
(probe_binning/probe_resident set: primary = coherent camera rays;
bounce = origins at primary hits in pixel-swizzle order, cosine
directions, sky-miss lanes dead) with whatever FREDHOLM_TRAV_SUBROWS /
FREDHOLM_TRAV_SUBLANES the env sets. min-over-reps timing.

Run the A/B as:
  FREDHOLM_TRAV_SUBROWS=0 python tools/probe_subwindow.py   # full-tile
  FREDHOLM_TRAV_SUBROWS=8 python tools/probe_subwindow.py   # gated
  FREDHOLM_TRAV_SUBLANES=32 FREDHOLM_TRAV_SUBROWS=8 ...     # quad32 sim
Hit counts are asserted equal across variants by the caller comparing
output lines (per-lane results are bit-identical by construction).
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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"SUBROWS={pc._SUBROWS} SUBLANES={pc.SUBLANES} "
          f"GATE={pc._GATE or 'fused'} REG on" , flush=True)
    sc = terrain()
    v = sc.vertices[sc.indices]
    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    b = build_bvh(v.min(1), v.max(1), thread=False)
    tlas = build_tlas([extract_hierarchy(b, v0, e1, e2)], [(0, np.eye(4))])
    dev_c = pc.prepare_clustered(tlas)

    W, H = 512, 288
    N = W * H
    px_u, py_u = swizzled_pixel_coords(W, H, 0)
    px = (np.asarray(px_u).astype(np.float32) / W - 0.5) * 1.2
    py = -(np.asarray(py_u).astype(np.float32) / H - 0.5) * 0.7 - 0.25
    d = np.stack([px, py, -np.ones(N)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0, 4.5, 11.0]], np.float32), (N, 1))

    r = pc.intersect_closest_clustered(dev_c, jnp.asarray(o),
                                       jnp.asarray(d), 1e9)
    hit = np.asarray(r["hit"])
    t = np.asarray(r["t"])
    print(f"primary hits: {hit.sum()}/{N}", flush=True)

    rng = np.random.default_rng(0)
    bo = (o + t[:, None] * d + np.array([0, 1e-3, 0], np.float32)).astype(
        np.float32)
    u1, u2 = rng.random(N), rng.random(N)
    st = np.sqrt(u1)
    bd = np.stack([st * np.cos(2 * np.pi * u2), np.sqrt(1 - u1),
                   st * np.sin(2 * np.pi * u2)], -1).astype(np.float32)
    tm = np.where(hit, 1e9, -1.0).astype(np.float32)

    def timed(name, fn, *args):
        out = fn(dev_c, *args)
        get = (lambda rr: jnp.sum(jnp.where(rr["hit"], 1.0, 0.0))) \
            if isinstance(out, dict) else (
                lambda rr: jnp.sum(rr.astype(jnp.float32)))
        float(get(out))
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(dev_c, *args)
            s = float(get(out))
            dt = min(dt, time.time() - t0)
        print(f"{name:24s}: {dt*1e3:7.1f} ms ({N/dt/1e6:5.2f} Mrays/s) "
              f"hits={s:.0f}", flush=True)

    oj, dj = jnp.asarray(o), jnp.asarray(d)
    boj, bdj, tmj = jnp.asarray(bo), jnp.asarray(bd), jnp.asarray(tm)
    timed("primary", pc.intersect_closest_clustered, oj, dj, 1e9)
    timed("bounce", pc.intersect_closest_clustered, boj, bdj, tmj)
    timed("bounce anyhit", pc.intersect_any_clustered, boj, bdj, tmj)


if __name__ == "__main__":
    main()
