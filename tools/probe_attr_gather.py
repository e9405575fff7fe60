"""Where does the large-scene fused render time go? (real chip)

Hypothesis (round 5): NOT the traversal — sub-window gating made the
isolated clustered trace 1.5x faster yet end-to-end terrain stayed at
0.098 Mpv/s and hosek-sweep gained 3%. The suspect is the per-bounce
attribute fetch: for tables over ONEHOT_MAX_ROWS (2048) gather_rows
falls back to `table[idx]` — the irregular per-lane HBM gather this
hardware is worst at (CLAUDE.md ~13 ms per 262k lanes, measured round 1
on SMALL tables; the fused geometry table is [1.05M, 32] f32).

Times, on the terrain scene's real fused_table:
  - [N] row gather with pixel-coherent ids (primary-hit pattern)
  - [N] row gather with random ids (bounce pattern)
  - full _gather_attrs (geom row gather + one-hot material fetch)
  - one isolated closest bounce trace, for scale

Run: python tools/probe_attr_gather.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np

from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import terrain


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    r = Renderer(width=512, height=288)
    r.set_scene(terrain())
    dev = r._arrays()
    dev.update({"use_dense": False, "use_pallas": True,
                "use_clustered": True, "inst_identity": True,
                "has_alpha": False, "any_textures": False,
                "n_lights": 0, "lobes_on": ("diffuse_r", "specular"),
                "any_heightmap": False, "any_normalmap": False,
                "tex_kinds": (), "compact": "0"})
    table = dev["fused_table"]
    f = table.shape[0]
    n = 2 * 512 * 288  # the light+rad resolve block size
    print(f"fused_table {table.shape}  n_lanes {n}", flush=True)

    rng = np.random.default_rng(0)
    # coherent: runs of equal ids (pixel-swizzled primaries hit the same
    # face in runs); random: bounce pattern
    base = np.repeat(rng.integers(0, f, size=n // 64), 64)[:n]
    coh = jnp.asarray(np.sort(base).astype(np.int32))
    rnd = jnp.asarray(rng.integers(0, f, size=n).astype(np.int32))

    @jax.jit
    def row_gather(ix):
        return table[ix]

    def timed(name, fn, *args):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else
                      (out if hasattr(out, "dtype") else list(out.values())[0])))
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            o = out[0] if isinstance(out, tuple) else (
                out if hasattr(out, "dtype") else list(out.values())[0])
            float(jnp.sum(o if o.dtype != jnp.int32 else o.astype(jnp.float32)))
            dt = min(dt, time.time() - t0)
        print(f"{name:32s}: {dt*1e3:8.1f} ms", flush=True)
        return dt

    timed("row gather [N,32] coherent", row_gather, coh)
    timed("row gather [N,32] random", row_gather, rnd)

    from fredholm_tpu.fused.pt_fused import _gather_attrs

    @jax.jit
    def full_attrs(ix):
        return _gather_attrs(dev, ix)

    timed("_gather_attrs coherent", full_attrs, coh)
    timed("_gather_attrs random", full_attrs, rnd)

    # scale reference: one isolated bounce trace on the same lane count
    import fredholm_tpu.accel.pallas_clustered as pc

    o = jnp.asarray(rng.uniform(-10, 10, size=(n, 3)).astype(np.float32))
    o = o.at[:, 1].set(jnp.abs(o[:, 1]) * 0.2)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    def trace(o_, d_):
        return pc.intersect_closest_clustered(dev["clusters"], o_, d_, 1e9)

    out = trace(o, d)
    float(jnp.sum(out["t"]))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = trace(o, d)
        float(jnp.sum(out["t"]))
        dt = min(dt, time.time() - t0)
    print(f"{'closest trace (random rays)':32s}: {dt*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
