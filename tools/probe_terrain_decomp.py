"""Terrain render-time decomposition via pipeline ablations (real chip).

Renders the bench terrain configuration under FREDHOLM_FUSED_ABLATE
variants and reports warm per-spp wall time. Caveats (documented per
variant): only `noocc` preserves the wavefront aliveness structure
exactly; `noclosest`/`nogather` kill paths early, so their deltas are
UPPER bounds on the ablated stage's cost.

Run: python tools/probe_terrain_decomp.py [spp] [scene]
scene: terrain (default) | hero
Ablation is read at import, so each variant runs as a subprocess.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r'''
import os, sys, time
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import numpy as np
from fredholm_tpu.renderer import Renderer

spp = {spp}
scene = {scene!r}
r = Renderer(width=512, height=288)
if scene == "hero":
    from fredholm_tpu.scene.procedural import hero

    r.set_scene(hero())
    r.camera.origin = np.asarray([0.0, 6.5, 19.0], np.float32)
    r.camera.look_around(0.0, -0.245)
    r.camera.f_number = 8.0
    r.camera.focus = 16.0
else:
    from fredholm_tpu.scene.procedural import terrain

    r.set_scene(terrain())
    r.camera.origin = np.asarray([0.0, 4.5, 11.0], np.float32)
    r.camera.look_around(0.0, -0.25)
r.camera._update_transform()
r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5)
r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
r.render(n_samples=1, max_depth=5)
r.render(n_samples=1, max_depth=5)
float(np.asarray(r.layers["n_path_vertices"]))
best = 1e30
for _ in range(2):
    t0 = time.time()
    r.render(n_samples=spp, max_depth=5)
    float(np.asarray(r.layers["n_path_vertices"]))
    best = min(best, (time.time() - t0) / spp)
print("RESULT %.0f ms/spp" % (best * 1e3), flush=True)
'''


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scene = sys.argv[2] if len(sys.argv) > 2 else "terrain"
    root = os.path.dirname(HERE)
    variants = [
        ("full", ""),
        ("noocc", "noocc"),                    # aliveness-exact
        ("noocc+noclosest", "noocc,noclosest"),  # upper bound
        ("nogather", "nogather"),                # upper bound
    ]
    results = {}
    for name, abl in variants:
        env = dict(os.environ)
        env["FREDHOLM_FUSED_ABLATE"] = abl
        p = subprocess.run(
            [sys.executable, "-c", CHILD.format(root=root, spp=spp, scene=scene)],
            env=env, capture_output=True, text=True, timeout=2400,
        )
        line = [ln for ln in p.stdout.splitlines() if "RESULT" in ln]
        ms = float(line[0].split()[1]) if line else float("nan")
        results[name] = ms
        print(f"{name:18s}: {ms:7.0f} ms/spp", flush=True)
        if not line:
            print(p.stderr[-500:], flush=True)
    if "full" in results and "noocc" in results:
        print(f"anyhit (exact)     : {results['full']-results['noocc']:.0f} ms/spp",
              flush=True)
    if "noocc" in results and "noocc+noclosest" in results:
        print("closest+downstream : "
              f"{results['noocc']-results['noocc+noclosest']:.0f} ms/spp "
              "(upper bound)", flush=True)


if __name__ == "__main__":
    main()
