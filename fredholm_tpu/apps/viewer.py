"""Interactive progressive viewer (terminal).

TPU-native analog of the reference's GLFW/ImGui viewer
(/root/reference/app/gui.cpp:62-368). TPU hosts have no OpenGL interop, so
the display is an ANSI truecolor half-block preview in the terminal plus
PNG snapshots; the interaction model is the same: WASD+QE camera movement
with render restart, look-around, AOV selection, sky switching, progressive
accumulation up to max_samples, denoise toggle and save.

Run:  python -m fredholm_tpu.apps.viewer [--scene path|name] [--width N]

Commands at the prompt:
  w/a/s/d/q/e [dist]   move camera (restarts accumulation)
  look <dphi> <dtheta> look around
  render [spp]         accumulate more samples
  aov <name>           beauty|denoised|position|normal|texcoord|depth|albedo
  sky <constant|arhosek>   switch sky model
  ibl <path.hdr>       load an environment map
  scene <name|path>    load scene (builtin name or file)
  scenes               list builtin scenes
  save [file.png]      write current AOV
  show                 print terminal preview
  state                dump controller state
  quit
"""

from __future__ import annotations

import argparse
import shlex

import numpy as np

from ..camera import CameraMovement
from .controller import AOVType, BUILTIN_SCENES, Controller, SkyType

_MOVES = {
    "w": CameraMovement.FORWARD,
    "s": CameraMovement.BACKWARD,
    "a": CameraMovement.LEFT,
    "d": CameraMovement.RIGHT,
    "q": CameraMovement.DOWN,
    "e": CameraMovement.UP,
}


def terminal_preview(img: np.ndarray, max_cols: int = 100) -> str:
    """ANSI truecolor half-block rendering of an sRGB image."""
    h, w = img.shape[:2]
    step = max(1, w // max_cols)
    small = img[::step, ::step]
    if small.shape[0] % 2 == 1:
        small = small[:-1]
    rgb = np.clip(small * 255.0, 0, 255).astype(np.uint8)
    lines = []
    for y in range(0, rgb.shape[0], 2):
        row = []
        for x in range(rgb.shape[1]):
            t = rgb[y, x]
            b = rgb[y + 1, x]
            row.append(
                f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            )
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_box")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp-per-tick", type=int, default=1)
    ap.add_argument("--no-preview", action="store_true")
    args = ap.parse_args(argv)

    import os

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    ctl = Controller(width=args.width, height=args.height)
    if args.scene in BUILTIN_SCENES:
        ctl.load_builtin_scene(args.scene)
    else:
        ctl.load_scene(args.scene)
    ctl.state.camera_origin = (0.0, 1.0, 3.0)
    ctl.renderer.camera.origin = np.asarray([0.0, 1.0, 3.0], np.float32)
    ctl.renderer.camera._update_transform()

    print(f"loaded {args.scene}; 'render 8' to accumulate, 'help' for help")
    while True:
        try:
            line = input(f"[{ctl.state.n_samples} spp] > ").strip()
        except EOFError:
            return 0
        if not line:
            ctl.render_tick(args.spp_per_tick)
            continue
        tokens = shlex.split(line)
        cmd = tokens[0].lower()
        try:
            if cmd in _MOVES:
                dist = float(tokens[1]) if len(tokens) > 1 else 0.5
                ctl.move_camera(_MOVES[cmd], dist)
            elif cmd == "look":
                ctl.rotate_camera(float(tokens[1]), float(tokens[2]))
            elif cmd == "render":
                spp = int(tokens[1]) if len(tokens) > 1 else args.spp_per_tick
                ctl.render_tick(spp)
                print(f"{ctl.state.n_samples} spp accumulated")
            elif cmd == "aov":
                ctl.state.aov_type = AOVType[tokens[1].upper()]
            elif cmd == "sky":
                ctl.state.sky_type = SkyType[tokens[1].upper()]
                if ctl.state.sky_type == SkyType.ARHOSEK:
                    ctl.state.directional_light_le = (20, 20, 20)
                    ctl.state.directional_light_dir = (0.3, 1.0, 0.2)
                    ctl.state.directional_light_angle = 0.53
                ctl.update_sky_type()
            elif cmd == "ibl":
                ctl.load_ibl(tokens[1])
            elif cmd == "scene":
                name = tokens[1]
                if name in BUILTIN_SCENES:
                    ctl.load_builtin_scene(name)
                else:
                    ctl.load_scene(name)
            elif cmd == "scenes":
                print("\n".join(ctl.scene_names()))
            elif cmd == "save":
                path = ctl.save_image(tokens[1] if len(tokens) > 1 else None)
                print(f"wrote {path}")
            elif cmd == "show":
                if not args.no_preview:
                    print(terminal_preview(ctl.get_display_image()))
            elif cmd == "state":
                print(ctl.state)
            elif cmd in ("quit", "exit"):
                return 0
            elif cmd == "help":
                print(__doc__)
            else:
                print(f"unknown command: {cmd}")
        except (IndexError, ValueError, KeyError) as e:
            print(f"error: {e}")


if __name__ == "__main__":
    raise SystemExit(main())
