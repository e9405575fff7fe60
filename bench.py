"""Benchmarks: progressive path tracing on one chip (+ optional sharded).

Prints one JSON line PER metric (primary LAST — the driver parses the
final line as the headline):
  {"metric": ..., "value": N, "unit": "Mpath-vertices/s", "vs_baseline": N}

1. cornell-box 512x512 @16spp depth5 — the primary metric, counts shaded
   path vertices per second against BASELINE.json's north star
   (100 Mpath-vertices/s/chip).
2. hosek-sweep ~100k-tri metalness sweep under Hosek sky + sun — the
   larger-scene operating point (clustered traversal path).
3. cornell-box 1920x1080 @16spp depth5 — the reference contest operating
   point (rtcamp8.cpp:49-64).
4. terrain ~1.05M tris — the million-triangle scene class (San
   Miguel/Rungholt analog, controller.h:31-43), supercluster traversal.
5. instanced-tiles 10.4M tris — San Miguel-scale shared-BLAS instancing.
6. hero everything-on ~320k tris — instanced + alpha foliage +
   normal-mapped textures + emissive + Hosek + DOF through the fused
   pipeline (rtcamp8 composite analog).

The default invocation is an ORCHESTRATOR: each metric runs in its own
subprocess (`--only N`) under a HARD per-metric timeout, inside a global
budget (FREDHOLM_BENCH_BUDGET seconds, default 420). Outage resilience
(rounds 3 AND 4 lost their driver bench record to tunnel downtime):

- Phase 1 WAITS for the tunnel: a tiny-op ping subprocess behind a
  backoff loop that spans the whole budget — doomed metric launches no
  longer burn the budget while the backend is down.
- Phase 2 runs the SMOKE metric first (cheapest real measurement, ~s
  warm): something lands early, and it is the headline fallback if the
  tunnel dies before the full primary completes.
- The full cornell primary runs next; its JSON line is buffered and
  printed LAST (the driver parses the final stdout line as headline).
- Secondaries each re-ping before launching; a mid-run outage re-enters
  the wait loop instead of eating per-metric timeouts.
- Every completed line is flushed immediately to stdout AND (with
  --jsonl PATH / FREDHOLM_BENCH_JSONL) appended to a file, so a kill at
  ANY point preserves all completed measurements.

A hung XLA compile cannot be interrupted in-process (the hang is inside
a C++ call, signals don't land), hence subprocesses throughout.

`--smoke` runs a tiny config; `--sharded` runs the pixel-sharded
shard_map path on a real-device mesh (proves collectives compile on the
TPU backend, VERDICT.md round-1 item 4); `--only N` runs one metric
in-process. FREDHOLM_BENCH_INPROC=1 restores the single-process run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPVS = 100.0  # north star from BASELINE.json (v5p-8 per chip)


def _sweep_scene(n_tris_target=100_000):
    """Metalness sweep under Hosek sky: ~100k triangles (showcase scene)."""
    import numpy as np

    from fredholm_tpu.scene.procedural import sphere_array_test
    from fredholm_tpu.scene.types import Material

    base = Material(base_color=(0.9, 0.6, 0.3), specular_roughness=0.25)
    # 12 spheres x 64x64 sphere grid x 2 tris + floor ~= 98k tris
    import fredholm_tpu.scene.procedural as proc

    values = list(np.linspace(0.0, 1.0, 12))
    import dataclasses as dc

    materials = []
    parts = []
    n = len(values)
    spacing = 1.1
    for i, val in enumerate(values):
        m = dc.replace(base)
        m.metalness = val
        materials.append(m)
        cx = (i - (n - 1) / 2.0) * spacing
        v, nn, t, f = proc.uv_sphere([cx, 0.45, 0.0], 0.45, n_theta=64,
                                     n_phi=64)
        parts.append((v, nn, t, f, np.full((len(f),), i, np.int32)))
    materials.append(Material(base_color=(0.5, 0.5, 0.5), specular=0.0))
    s = n * spacing
    v, nn, t, f = proc._quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    parts.append((v, nn, t, f, np.full((len(f),), n, np.int32)))
    verts, norms, uvs, idxs, mids = proc._merge_mesh(
        [p[0] for p in parts], [p[1] for p in parts], [p[2] for p in parts],
        [p[3] for p in parts], [p[4] for p in parts],
    )
    from fredholm_tpu.scene.types import Scene

    n_faces = len(idxs)
    return Scene(
        vertices=verts, normals=norms, texcoords=uvs, indices=idxs,
        material_ids=mids,
        instance_ids=np.zeros((n_faces,), np.int32),
        materials=materials,
        transforms=np.eye(4, dtype=np.float32)[None],
        submesh_offsets=[0], submesh_n_faces=[n_faces],
    )


def _timed_render(r, spp, max_depth, reps=1):
    import numpy as np

    # warmup: 2 spp so the regeneration chunk (n_samples >= 2 gate)
    # compiles outside the timed section. TWO warmups: on the axon tunnel
    # the first dispatch after a compile still carries ~10x overhead
    # (measured round 3, tools/probe_traversal.py methodology note)
    r.render(n_samples=2, max_depth=max_depth)
    r.render(n_samples=2, max_depth=max_depth)
    # best-of-reps on cheap metrics: the tunnel adds multi-second
    # per-dispatch jitter on bad days (r2 vs r3 headline spread); the best
    # rep is the honest steady-state throughput
    best = 0.0
    for _ in range(max(1, reps)):
        v0 = float(np.asarray(r.layers["n_path_vertices"]))
        t0 = time.time()
        r.render(n_samples=spp, max_depth=max_depth)
        v1 = float(np.asarray(r.layers["n_path_vertices"]))  # forces sync
        dt = time.time() - t0
        best = max(best, (v1 - v0) / dt / 1e6)
    beauty = np.asarray(r.layers["beauty"])
    assert np.isfinite(beauty).all(), "non-finite radiance"
    return best


def _emit(name, mpvs):
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(mpvs, 3),
                "unit": "Mpath-vertices/s",
                "vs_baseline": round(mpvs / BASELINE_MPVS, 4),
            }
        ),
        flush=True,
    )


def _bench_cornell(width, height, spp, max_depth, out=""):
    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box

    r = Renderer(width=width, height=height)
    r.set_scene(cornell_box())
    # the effective eye sits f~1 behind the origin (camera.cu:14-16), so
    # origin z=0.6 puts the eye just inside the opening cone: every primary
    # ray hits geometry
    r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    # 512^2 reps are ~2.5s each; 1080p ~20s — keep reps inside the
    # orchestrator's per-metric estimates
    mpvs = _timed_render(r, spp, max_depth,
                         reps=3 if width <= 512 else 2)
    if out:
        from fredholm_tpu.utils.image import write_png

        write_png(out, np.clip(r.get_layer("beauty"), 0, 1) ** (1 / 2.2))
    return mpvs


def _bench_sweep(width, height, spp, max_depth):
    import numpy as np

    from fredholm_tpu.renderer import Renderer

    r = Renderer(width=width, height=height)
    r.set_scene(_sweep_scene())
    r.camera.origin = np.asarray([0.0, 2.0, 8.0], np.float32)
    r.camera.look_around(0.0, 0.0)
    r.camera._update_transform()
    r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5)
    r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    return _timed_render(r, spp, max_depth)


def _bench_terrain(width, height, spp, max_depth):
    """~1.05M-triangle displaced terrain under Hosek sky + sun: the
    million-triangle scene class (San Miguel/Rungholt analog,
    controller.h:31-43) through the supercluster traversal."""
    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import terrain

    r = Renderer(width=width, height=height)
    r.set_scene(terrain())
    r.camera.origin = np.asarray([0.0, 4.5, 11.0], np.float32)
    r.camera.look_around(0.0, -0.25)
    r.camera._update_transform()
    r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5)
    r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    return _timed_render(r, spp, max_depth)


def _bench_sharded(width, height, spp, max_depth, scene="cornell"):
    """Pixel-sharded render over all visible real devices (1-device mesh on
    the single dev chip — proves shard_map+psum compile/run on the TPU).
    scene="terrain" drives the PRODUCTION clustered traversal under
    shard_map (not just the dense demo intersector)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fredholm_tpu.parallel.sharding import (
        make_mesh,
        render_progressive_sharded,
    )
    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import cornell_box, terrain

    n_dev = len(jax.devices())
    while height % n_dev:
        n_dev -= 1
    mesh = make_mesh(n_dev)

    r = Renderer(width=width, height=height)
    if scene == "terrain":
        r.set_scene(terrain())
        r.camera.origin = np.asarray([0.0, 4.5, 11.0], np.float32)
        r.camera.look_around(0.0, -0.25)
        r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3],
                                angle=0.5)
        r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    else:
        r.set_scene(cornell_box())
        r.camera.origin = np.asarray([0.0, 1.0, 0.6], np.float32)
    r.camera._update_transform()
    dev, static_params, dynamic = r.sharding_inputs(max_depth=max_depth)

    def shard_leaf(leaf):
        spec = P("tiles") if getattr(leaf, "ndim", 0) > 0 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    layers = jax.tree.map(shard_leaf, r.layers)
    count = jax.device_put(r.sample_count, NamedSharding(mesh, P("tiles")))

    # two warmups: first post-compile dispatch carries ~10x overhead on
    # the axon tunnel (see _timed_render). Warm with FULL spp-chunk calls
    # (4 spp each) — a 1-spp warmup compiles the chunk=1 step while the
    # timed loop runs the chunk=4 step, putting its compile inside the
    # timed region (the round-3 0.033 Mpv/s artifact)
    layers, count = render_progressive_sharded(
        mesh, dev, static_params, dynamic, layers, count, 4
    )
    float(np.asarray(layers["n_path_vertices"]))
    layers, count = render_progressive_sharded(
        mesh, dev, static_params, dynamic, layers, count, 4
    )
    v0 = float(np.asarray(layers["n_path_vertices"]))
    t0 = time.time()
    layers, count = render_progressive_sharded(
        mesh, dev, static_params, dynamic, layers, count, spp
    )
    v1 = float(np.asarray(layers["n_path_vertices"]))
    dt = time.time() - t0
    beauty = np.asarray(layers["beauty"])
    assert np.isfinite(beauty).all(), "non-finite radiance (sharded)"
    return (v1 - v0) / dt / 1e6, n_dev


def _bench_tiles(width, height, spp, max_depth):
    """10.4M-triangle instanced tile sheet (San Miguel 10M-tri analog,
    controller.h:39): 16 instances x 650k-tri shared BLAS through the
    two-level supercluster traversal."""
    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import instanced_tiles

    r = Renderer(width=width, height=height)
    r.set_scene(instanced_tiles())
    r.camera.origin = np.asarray([0.0, 9.0, 38.0], np.float32)
    r.camera.look_around(0.0, -0.22)
    r.camera._update_transform()
    r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5)
    r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    return _timed_render(r, spp, max_depth)


def _bench_hero(width, height, spp, max_depth):
    """The everything-on composite (rtcamp8.cpp:47-303 analog): instanced
    trees/rocks + alpha-cutout foliage + normal-mapped textured terrain +
    emissive lanterns + Hosek sun + thin-lens DOF, all through the fused
    pipeline."""
    import numpy as np

    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import hero

    r = Renderer(width=width, height=height)
    r.set_scene(hero())
    r.camera.origin = np.asarray([0.0, 4.0, 14.0], np.float32)
    r.camera.look_around(0.0, -0.18)
    r.camera.f_number = 8.0
    r.camera.focus = 12.0
    r.camera._update_transform()
    r.set_directional_light([2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5)
    r.load_arhosek_sky(turbidity=3.0, albedo=0.3)
    return _timed_render(r, spp, max_depth)


def _metric_table(args):
    """(n, est_s, name, runner) for every metric. est_s = warm-cache wall
    estimate used for budget planning; hard subprocess timeouts are looser."""
    d = args.max_depth
    return [
        (1, 60,
         f"cornell-box 512x512 @{args.spp}spp depth{d} "
         f"single-chip path tracing",
         lambda: _bench_cornell(512, 512, args.spp, d, out=args.out)),
        (2, 90,
         f"hosek-sweep ~100k-tris 512x288 @8spp depth{d} "
         f"single-chip path tracing",
         lambda: _bench_sweep(512, 288, 8, d)),
        (3, 100,
         f"cornell-box 1920x1080 @{args.spp}spp depth{d} "
         f"single-chip path tracing (contest operating point)",
         lambda: _bench_cornell(1920, 1080, args.spp, d)),
        (4, 120,
         f"terrain ~1.05M-tris 512x288 @4spp depth{d} "
         f"single-chip path tracing (supercluster traversal)",
         lambda: _bench_terrain(512, 288, 4, d)),
        (5, 150,
         f"instanced-tiles 10.4M-tris 512x288 @2spp depth{d} "
         f"single-chip path tracing (shared-BLAS TLAS)",
         lambda: _bench_tiles(512, 288, 2, d)),
        (6, 150,
         f"hero everything-on ~320k-tris 512x288 @4spp depth{d} "
         f"single-chip path tracing (instanced+alpha+normalmap+DOF)",
         lambda: _bench_hero(512, 288, 4, d)),
    ]


def _run_subprocess(n, timeout_s, extra=()):
    """Run `bench.py --only n` in a child; return its last JSON line or
    None. A hung XLA compile dies with the child — the orchestrator's
    clock keeps running regardless."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--only", str(n),
           *extra]
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"bench: metric {n} subprocess timed out after "
              f"{timeout_s:.0f}s (killed)", file=sys.stderr, flush=True)
        return None
    for ln in (p.stderr or "").splitlines():
        if ln.strip():
            print(f"bench[{n}]: {ln}", file=sys.stderr, flush=True)
    line = None
    for ln in (p.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    return line


def _tunnel_up(timeout_s: float = 150.0) -> bool:
    """One tiny-op ping of the TPU backend in a subprocess (backend init
    hangs, not errors, when the axon tunnel is down — only a subprocess
    timeout bounds it)."""
    import subprocess

    cache = os.path.expanduser("~/.cache/jax_comp")
    code = (
        "import jax\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache!r})\n"
        "import jax.numpy as jnp\n"
        "assert jax.devices()[0].platform != 'cpu'\n"
        "print('PING', float(jnp.sum(jnp.ones((8, 128)))))\n"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        return p.returncode == 0 and "PING" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_tunnel(_left, reserve: float = 45.0) -> bool:
    """Ping behind a backoff loop spanning the remaining budget. Returns
    True as soon as a ping lands; False once less than `reserve` seconds
    remain (so the final headline print can never be cut off). The ping
    timeout must cover a slow-but-alive backend init (~140 s observed) —
    a short timeout reads busy as down and skips good metrics."""
    backoff = 10.0
    first = True
    while _left() > reserve:
        if _tunnel_up(min(150.0, max(60.0, _left() - reserve))):
            if not first:
                print("bench: tunnel is back", file=sys.stderr, flush=True)
            return True
        first = False
        wait = min(backoff, max(0.0, _left() - reserve))
        print(f"bench: tunnel down, retrying in {wait:.0f}s "
              f"({_left():.0f}s budget left)", file=sys.stderr, flush=True)
        time.sleep(wait)
        backoff = min(backoff * 1.7, 60.0)
    return False


def _orchestrate(args) -> None:
    """Subprocess-per-metric with hard timeouts and tunnel-outage
    resilience (see module docstring). Headline is PRINTED last."""
    budget = float(os.environ.get("FREDHOLM_BENCH_BUDGET", "420"))
    t_start = time.time()

    def _left():
        return budget - (time.time() - t_start)

    jsonl = None
    if args.jsonl:
        jsonl = open(args.jsonl, "a", buffering=1)

    def out_line(line):
        print(line, flush=True)
        if jsonl:
            jsonl.write(line + "\n")

    metrics = {n: (est, name) for n, est, name, _ in _metric_table(args)}
    fwd = ["--spp", str(args.spp), "--max-depth", str(args.max_depth)]

    # 1. wait for the tunnel (backoff ping spanning the whole budget)
    up = _wait_tunnel(_left)

    # 2. smoke first: the cheapest real measurement lands while the
    #    tunnel is known-alive — the headline fallback from here on
    smoke = None
    if up:
        smoke = _run_subprocess(1, min(240.0, max(60.0, _left() - 30)),
                                extra=["--smoke"])
        if smoke and jsonl:
            jsonl.write(smoke + "\n")

    # 3. full primary: generous timeout (cold compile can take minutes),
    #    one retry; line buffered, printed last
    primary = None
    if up and _left() > 60:
        primary = _run_subprocess(
            1, min(max(150.0, _left() * 0.5), _left() - 30),
            extra=fwd + (["--out", args.out] if args.out else []))
        if primary is None and _left() > 90 and _wait_tunnel(_left):
            print("bench: primary retry", file=sys.stderr, flush=True)
            primary = _run_subprocess(1, _left() * 0.6, extra=fwd)
    if primary and jsonl:
        jsonl.write(primary + "\n")

    # 4. secondaries, cheap/valuable first; re-ping before each so a
    #    mid-run outage re-enters the wait loop instead of burning
    #    per-metric timeouts — but skip the ping while metrics are
    #    landing (a fresh success IS the liveness signal; a short ping
    #    against a busy backend reads as down and skips good metrics);
    #    always leave 20s for the final print
    last_ok = time.time() if (primary or smoke) else 0.0
    for n in (2, 3, 4, 5, 6):
        est, name = metrics[n]
        if _left() - 20 < est:
            print(f"bench: skipping metric {n} ({name}): "
                  f"{_left():.0f}s left < est {est}s",
                  file=sys.stderr, flush=True)
            continue
        if time.time() - last_ok > 120 and not _tunnel_up(
                min(150.0, max(60.0, _left() - est - 20))):
            if not _wait_tunnel(_left, reserve=est + 20):
                print(f"bench: tunnel down, no budget for metric {n}",
                      file=sys.stderr, flush=True)
                break
        line = _run_subprocess(n, min(est * 2.5, _left() - 20), extra=fwd)
        if line:
            out_line(line)
            last_ok = time.time()

    # 5. headline last: full primary, else the smoke line (a real
    #    measurement beats a zero), else the explicit failure record
    headline = primary or smoke
    if headline is None and _left() > 30 and _wait_tunnel(_left):
        headline = _run_subprocess(1, _left() - 5, extra=["--smoke"])
        if headline and jsonl:
            jsonl.write(headline + "\n")
    if headline:
        print(headline, flush=True)
    else:
        out_line(json.dumps({
            "metric": "cornell-box 512x512 single-chip path tracing "
                      "(FAILED: TPU tunnel unavailable for entire budget)",
            "value": 0.0, "unit": "Mpath-vertices/s", "vs_baseline": 0.0,
        }))
    if jsonl:
        jsonl.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--sharded-scene", choices=["cornell", "terrain"],
                    default="cornell")
    ap.add_argument(
        "--only", type=int, default=0,
        help="run just metric N in-process (1=cornell, 2=sweep, 3=1080p, "
             "4=terrain, 5=10M-tri instanced tiles, 6=hero everything-on)",
    )
    ap.add_argument("--out", type=str, default="")
    ap.add_argument(
        "--jsonl", type=str,
        default=os.environ.get("FREDHOLM_BENCH_JSONL", ""),
        help="append each completed metric's JSON line to this file as it "
             "lands (survives a kill at any point)",
    )
    args = ap.parse_args()

    if (args.only == 0 and not args.smoke and not args.sharded
            and os.environ.get("FREDHOLM_BENCH_INPROC", "0") != "1"):
        _orchestrate(args)
        return

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    if args.smoke:
        mpvs = _bench_cornell(64, 64, 2, 3, out=args.out)
        _emit("cornell-box 64x64 @2spp depth3 single-chip path tracing",
              mpvs)
        return

    if args.sharded:
        if args.sharded_scene == "terrain":
            mpvs, n_dev = _bench_sharded(
                512, 288, 4, args.max_depth, scene="terrain"
            )
            _emit(
                f"terrain ~1.05M-tris 512x288 @4spp depth{args.max_depth} "
                f"pixel-sharded over {n_dev}-device mesh "
                f"(clustered traversal)",
                mpvs,
            )
        else:
            mpvs, n_dev = _bench_sharded(512, 512, args.spp, args.max_depth)
            _emit(
                f"cornell-box 512x512 @{args.spp}spp depth{args.max_depth} "
                f"pixel-sharded over {n_dev}-device mesh",
                mpvs,
            )
        return

    # --only N / FREDHOLM_BENCH_INPROC=1: run in this process
    table = {t[0]: t for t in _metric_table(args)}
    order = [args.only] if args.only else [2, 3, 4, 5, 6, 1]  # primary last
    budget = float(os.environ.get("FREDHOLM_BENCH_BUDGET", "420"))
    t_start = time.time()
    for n in order:
        _, est, name, fn = table[n]
        if args.only == 0 and n != 1 and (
                budget - (time.time() - t_start)) - 60 < est:
            print(f"bench: skipping metric {n} ({name})",
                  file=sys.stderr, flush=True)
            continue
        try:
            _emit(name, fn())
        except Exception as e:  # tunnel outage on one scene: keep going
            print(f"bench: metric {n} ({name}) FAILED: {e!r}",
                  file=sys.stderr, flush=True)
            if args.only:  # orchestrator uses the exit code
                sys.exit(3)


if __name__ == "__main__":
    main()
