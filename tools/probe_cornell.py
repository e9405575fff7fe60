"""Decompose the cornell-box (primary bench metric) step cost on chip.

Flop/HBM accounting says one 512^2 @1spp depth-5 step should cost
~40 ms (35 ms dense traces + ~2 ms fused-stage HBM + dispatch overhead),
but the bench measures ~144 ms/spp — ~70% unattributed. This probe
separates: per-bounce slope (max_depth sweep), raygen+final intercept,
isolated dense-trace cost at the real concatenated block size, and
per-render-call fixed cost (1 vs 4 spp).

Run: python tools/probe_cornell.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box

    r = Renderer(width=512, height=512)
    r.set_scene(cornell_box())
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()

    def sync():
        return float(np.asarray(r.layers["n_path_vertices"]))

    def timed_render(spp, depth):
        r.render(n_samples=spp, max_depth=depth)
        r.render(n_samples=spp, max_depth=depth)
        sync()
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r.render(n_samples=spp, max_depth=depth)
            sync()
            dt = min(dt, time.time() - t0)
        return dt

    for depth in (1, 2, 3, 5):
        dt = timed_render(1, depth)
        print(f"render 1spp depth{depth}: {dt*1e3:7.1f} ms", flush=True)
    for spp in (2, 4):
        dt = timed_render(spp, 5)
        print(f"render {spp}spp depth5: {dt*1e3:7.1f} ms "
              f"({dt*1e3/spp:.1f}/spp)", flush=True)

    # isolated dense closest trace at the real per-bounce size:
    # cblocks = [sky, area, light, rad] -> 4 x 262144 lanes
    dev, _, _ = r.sharding_inputs(max_depth=5)
    from fredholm_tpu.accel.pallas_dense import (
        intersect_any_pallas_c,
        intersect_closest_pallas_c,
    )

    n = 4 * 512 * 512
    rng = np.random.default_rng(0)
    o = (rng.random((n, 3), np.float32) * [2.0, 1.8, 2.0]
         + [-1.0, 0.1, -1.0]).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oc = (jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dc = (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    tm = jnp.full((n,), 1e9, jnp.float32)

    hit = intersect_closest_pallas_c(dev["tri_soa"], oc, dc, tm)
    float(jnp.sum(hit["t"] * 0))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        hit = intersect_closest_pallas_c(dev["tri_soa"], oc, dc, tm)
        s = float(jnp.sum(jnp.where(hit["hit"], 1.0, 0.0)))
        dt = min(dt, time.time() - t0)
    print(f"isolated closest {n} lanes x {dev['n_faces']} tris: "
          f"{dt*1e3:7.1f} ms (hits={s:.0f})", flush=True)

    occ = intersect_any_pallas_c(dev["tri_soa"], oc, dc, tm)
    float(jnp.sum(occ.astype(jnp.float32)))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        occ = intersect_any_pallas_c(dev["tri_soa"], oc, dc, tm)
        s = float(jnp.sum(occ.astype(jnp.float32)))
        dt = min(dt, time.time() - t0)
    print(f"isolated anyhit  {n} lanes: {dt*1e3:7.1f} ms (occ={s:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
