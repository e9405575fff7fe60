"""Headless animation/still renderer CLI.

TPU-native analog of the reference's contest binary
(/root/reference/app/rtcamp8.cpp:47-303): renders an animation (or a single
still) with progressive accumulation, denoising, and the bloom+tonemap
post-process chain, writing numbered PNGs. The reference's two-thread
render/save pipeline (rtcamp8.cpp:155-300) maps naturally here: the render
loop dispatches async device work while a writer thread drains a frame
queue; a hard kill timer bounds total wall-clock (rtcamp8.cpp:64,166-170).

The reference hard-codes its configuration (rtcamp8.cpp:49-64) and vendors
argparse without using it; we expose everything as flags.

Usage:
  python -m fredholm_tpu.apps.render_cli --scene scene.obj --out-dir out \
      --width 1920 --height 1080 --spp 16 --max-depth 5 \
      --animation --fps 24 --max-time 9.5 --kill-time 590
"""

from __future__ import annotations

import argparse
import logging
import os
import queue
import threading
import time

import numpy as np

log = logging.getLogger("fredholm_tpu")


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", required=True, help=".obj/.gltf path or a builtin scene name")
    ap.add_argument(
        "--extra-scene",
        default=None,
        help="additional scene merged without clearing (e.g. camera track "
        "glTF, rtcamp8.cpp:120-121)",
    )
    ap.add_argument("--out-dir", default="output")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--fov", type=float, default=60.0, help="degrees")
    ap.add_argument("--f-number", type=float, default=100.0)
    ap.add_argument("--focus", type=float, default=8.0)
    ap.add_argument("--camera-origin", type=float, nargs=3, default=None)
    ap.add_argument("--camera-yaw", type=float, default=0.0,
                    help="degrees, applied after --camera-origin")
    ap.add_argument("--camera-pitch", type=float, default=0.0,
                    help="degrees (negative looks down)")
    # lights / sky
    ap.add_argument("--sun-le", type=float, nargs=3, default=None)
    ap.add_argument("--sun-dir", type=float, nargs=3, default=(-0.1, 1.0, 0.1))
    ap.add_argument("--sun-angle", type=float, default=1.0)
    ap.add_argument("--sky", choices=["constant", "hosek", "ibl"], default="constant")
    ap.add_argument("--bg-color", type=float, nargs=3, default=(0, 0, 0))
    ap.add_argument("--sky-intensity", type=float, default=1.0)
    ap.add_argument("--ibl", default=None, help=".hdr environment map")
    ap.add_argument("--turbidity", type=float, default=3.0)
    ap.add_argument("--albedo", type=float, default=0.3)
    # animation
    ap.add_argument("--animation", action="store_true")
    ap.add_argument("--fps", type=float, default=24.0)
    ap.add_argument("--max-time", type=float, default=9.5)
    ap.add_argument("--kill-time", type=float, default=590.0)
    # post
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--denoiser", choices=["auto", "unet", "atrous"],
                    default="auto",
                    help="denoiser model (auto = U-Net when weights + "
                    "guides exist, else A-Trous)")
    ap.add_argument(
        "--temporal", action="store_true",
        help="reprojection-validated temporal blend across animation "
        "frames (denoise/temporal.py; exceeds the reference's per-frame "
        "denoise, rtcamp8.cpp:159-246)",
    )
    ap.add_argument("--temporal-alpha", type=float, default=0.85)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--bloom-threshold", type=float, default=2.0)
    ap.add_argument("--bloom-sigma", type=float, default=5.0)
    ap.add_argument("--iso", type=float, default=80.0)
    ap.add_argument("--chromatic-aberration", type=float, default=1.0)
    ap.add_argument("--tonemap", choices=["uchimura", "aces"], default="uchimura")
    ap.add_argument("--raw", action="store_true", help="skip post-processing")
    ap.add_argument(
        "--checkpoint", default=None,
        help="progressive-state snapshot (.npz) for still renders: resumed "
        "if present, written between spp chunks and on the kill timer — "
        "a long render survives preemption (exceeds the reference, whose "
        "state lives only in device memory, renderer.h:650-655)",
    )
    ap.add_argument("--aov", default="beauty",
                    choices=["beauty", "denoised", "position", "normal",
                             "depth", "texcoord", "albedo"])
    ap.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force a JAX backend (this host's sitecustomize ignores the "
        "JAX_PLATFORMS env var; 'cpu' renders without the TPU tunnel)",
    )
    return ap


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s] [%(levelname)s] %(message)s"
    )
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update(
            "jax_platforms", "cpu" if args.platform == "cpu" else "axon"
        )
    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from ..denoise.atrous import Denoiser
    from ..post.post_process import PostProcessParams, post_process
    from ..renderer import Renderer
    from ..utils.image import layer_to_image, write_png
    from ..utils.timer import StageTimer

    global_t0 = time.time()
    os.makedirs(args.out_dir, exist_ok=True)

    timer = StageTimer()
    r = Renderer(width=args.width, height=args.height)
    with timer.stage("load_scene"):
        from .controller import BUILTIN_SCENES

        if args.scene in BUILTIN_SCENES:
            # builtin procedural scene names work like file paths (the
            # reference CLI renders its resource list; we ship no assets)
            r.set_scene(BUILTIN_SCENES[args.scene]())
        else:
            r.load_scene(args.scene)
        if args.extra_scene:
            r.load_scene(args.extra_scene, clear=False)

    r.camera.fov = np.deg2rad(args.fov)
    r.camera.f_number = args.f_number
    r.camera.focus = args.focus
    if args.camera_origin is not None:
        r.camera.origin = np.asarray(args.camera_origin, np.float32)
        r.camera._update_transform()
    if args.camera_yaw or args.camera_pitch:
        r.camera.look_around(np.deg2rad(args.camera_yaw),
                             np.deg2rad(args.camera_pitch))
        r.camera._update_transform()

    if args.sun_le is not None:
        r.set_directional_light(args.sun_le, args.sun_dir, args.sun_angle)
    if args.sky == "hosek":
        if args.sun_le is None:
            r.set_directional_light((20, 20, 20), args.sun_dir, args.sun_angle)
        r.load_arhosek_sky(args.turbidity, args.albedo)
        r.set_sky_intensity(args.sky_intensity)
    elif args.sky == "ibl":
        assert args.ibl, "--ibl required for --sky ibl"
        r.load_ibl(args.ibl)
        r.set_sky_intensity(args.sky_intensity)
    else:
        r.set_bg_color(args.bg_color)

    denoiser = Denoiser(args.width, args.height, mode=args.denoiser) if (
        args.denoise or args.aov == "denoised"
    ) else None
    pp = PostProcessParams(
        use_bloom=args.bloom,
        bloom_threshold=args.bloom_threshold,
        bloom_sigma=args.bloom_sigma,
        iso=args.iso,
        chromatic_aberration=args.chromatic_aberration,
    )

    temporal = None
    if args.temporal:
        from ..denoise.temporal import TemporalAccumulator

        temporal = TemporalAccumulator(alpha=args.temporal_alpha)

    # writer thread (save_thread analog, rtcamp8.cpp:248-297)
    frame_queue: "queue.Queue" = queue.Queue(maxsize=4)

    def writer():
        while True:
            item = frame_queue.get()
            if item is None:
                return
            idx, img = item
            with timer.stage("save"):
                path = os.path.join(args.out_dir, f"{idx:04d}.png")
                write_png(path, img)
                log.info("wrote %s", path)

    save_thread = threading.Thread(target=writer, daemon=True)
    save_thread.start()

    n_frames = (
        max(int(args.max_time * args.fps), 1) if args.animation else 1
    )
    time_step = 1.0 / args.fps

    resume_spp = 0
    if args.checkpoint and not args.animation and os.path.exists(
        args.checkpoint if args.checkpoint.endswith(".npz")
        else args.checkpoint + ".npz"
    ):
        r.load_checkpoint(args.checkpoint)
        resume_spp = int(np.asarray(r.sample_count).min())
        log.info("resumed checkpoint at %d spp", resume_spp)

    for frame in range(n_frames):
        if time.time() - global_t0 > args.kill_time:
            log.warning("kill timer reached, stopping early at frame %d", frame)
            break
        if args.animation:
            with timer.stage("set_time"):
                r.set_time(frame * time_step)
            r.init_render_states()
        elif resume_spp == 0:
            r.init_render_states()
        with timer.stage("render"):
            if args.checkpoint and not args.animation:
                # chunked progressive render with durable snapshots: the
                # kill timer can fire mid-still and a later run resumes
                todo = max(args.spp - resume_spp, 0)
                chunk = max(min(todo, max(args.spp // 8, 1)), 1)
                while todo > 0:
                    n = min(chunk, todo)
                    r.render(n_samples=n, max_depth=args.max_depth)
                    r.wait_for_completion()
                    r.save_checkpoint(args.checkpoint)
                    todo -= n
                    if time.time() - global_t0 > args.kill_time:
                        log.warning(
                            "kill timer mid-still; checkpoint saved at "
                            "%d spp", args.spp - todo,
                        )
                        break
            else:
                r.render(n_samples=args.spp, max_depth=args.max_depth)
                r.wait_for_completion()

        with timer.stage("transfer"):
            if args.aov == "denoised":
                layers = r.layers
                beauty = denoiser.denoise(
                    layers["beauty"],
                    normal=layers["normal"],
                    albedo=layers["albedo"],
                )
                img = layer_to_image(
                    np.asarray(beauty), args.width, args.height
                )
            else:
                img = r.get_layer(args.aov)
                if args.aov == "beauty" and args.denoise:
                    layers = r.layers
                    with timer.stage("denoise"):
                        d = denoiser.denoise(
                            layers["beauty"],
                            normal=layers["normal"],
                            albedo=layers["albedo"],
                        )
                    img = layer_to_image(np.asarray(d), args.width, args.height)

        if temporal is not None and args.aov in ("beauty", "denoised"):
            with timer.stage("temporal"):
                img = temporal(
                    np.asarray(img),
                    layer_to_image(
                        np.asarray(r.layers["position"]),
                        args.width, args.height,
                    ),
                    r.camera.device_params(),
                )

        with timer.stage("post_process"):
            if args.raw or args.aov not in ("beauty", "denoised"):
                out = np.clip(img, 0.0, 1.0)
            else:
                import jax.numpy as jnp

                out = np.asarray(post_process(jnp.asarray(img), pp))
        frame_queue.put((frame, out))

    frame_queue.put(None)
    save_thread.join()
    timer.log_report()
    log.info("total wall-clock: %.1f s", time.time() - global_t0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
