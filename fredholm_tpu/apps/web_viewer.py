"""Live browser viewer: watch the render converge and drive the camera.

True capability-parity analog of the reference's windowed GLFW/ImGui viewer
(/root/reference/app/gui.cpp:62-368): the render loop accumulates samples
continuously in a background thread while the browser polls a progressive
PNG stream; WASD/QE + mouse-drag orbit restart accumulation exactly like
the GL viewer's camera widgets (gui.cpp:23-54). TPU hosts have no display
or GL interop, so the "window" is an HTTP page served from the render host
— everything else (progressive accumulation, AOV selector, sky/scene
switching, denoise toggle, save) matches the reference's GUI controls.

Run:  python -m fredholm_tpu.apps.web_viewer [--scene name] [--port 8000]
then open http://localhost:8000/.

Endpoints (all JSON unless noted):
  GET  /            viewer page (self-contained HTML/JS)
  GET  /frame.png   current display image (PNG)
  GET  /state       {spp, max_samples, aov, scene, scenes, camera, busy}
  POST /cmd         {"op": "move"|"look"|"aov"|"sky"|"scene"|"denoise"
                     |"max_samples"|"save"|"clear", ...}
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..camera import CameraMovement
from ..utils.image import png_bytes
from .controller import AOVType, BUILTIN_SCENES, Controller, SkyType

_MOVES = {
    "w": CameraMovement.FORWARD,
    "s": CameraMovement.BACKWARD,
    "a": CameraMovement.LEFT,
    "d": CameraMovement.RIGHT,
    "q": CameraMovement.DOWN,
    "e": CameraMovement.UP,
}

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>fredholm-tpu viewer</title>
<style>
 body{background:#15151a;color:#cfcfd6;font:14px system-ui;margin:0}
 #bar{padding:8px 12px;display:flex;gap:10px;align-items:center;
      flex-wrap:wrap;background:#1d1d24}
 #img{display:block;margin:12px auto;image-rendering:pixelated;
      outline:1px solid #333;cursor:grab;max-width:95vw}
 select,button{background:#2a2a33;color:#cfcfd6;border:1px solid #444;
      border-radius:4px;padding:3px 8px}
 #spp{min-width:90px;font-variant-numeric:tabular-nums}
 kbd{background:#2a2a33;border-radius:3px;padding:0 4px}
</style></head><body>
<div id="bar">
 <span id="spp">0 spp</span>
 <label>AOV <select id="aov"></select></label>
 <label>scene <select id="scene"></select></label>
 <label>sky <select id="sky">
   <option>constant</option><option>arhosek</option></select></label>
 <label>fov <input id="fov" type="number" value="90" min="10" max="160"
   style="width:4em"></label>
 <label>f/ <input id="fn" type="number" value="100" min="0.7" max="100"
   step="0.1" style="width:4em"></label>
 <label>focus <input id="fc" type="number" value="8" min="0.1" step="0.1"
   style="width:4em"></label>
 <button id="denoise">denoise</button>
 <button id="save">save png</button>
 <span>move <kbd>WASD</kbd><kbd>Q</kbd><kbd>E</kbd>, drag to look</span>
</div>
<img id="img" src="/frame.png">
<script>
const aovs=["beauty","denoised","position","normal","texcoord","depth",
            "albedo"];
const $=id=>document.getElementById(id);
aovs.forEach(a=>$("aov").add(new Option(a,a)));
const post=o=>fetch("/cmd",{method:"POST",body:JSON.stringify(o)});
async function refresh(){
 try{
  const s=await (await fetch("/state")).json();
  $("spp").textContent=s.spp+" spp";
  if(!$("scene").length)
    s.scenes.forEach(n=>$("scene").add(new Option(n,n)));
  $("scene").value=s.scene; $("aov").value=s.aov; $("sky").value=s.sky;
  const im=new Image();
  im.onload=()=>{$("img").src=im.src;setTimeout(refresh,300)};
  im.onerror=()=>setTimeout(refresh,1000);
  im.src="/frame.png?t="+Date.now();
 }catch(e){setTimeout(refresh,1000)}
}
refresh();
$("aov").onchange=e=>post({op:"aov",name:e.target.value});
$("scene").onchange=e=>post({op:"scene",name:e.target.value});
$("sky").onchange=e=>post({op:"sky",name:e.target.value});
const camPost=()=>post({op:"camera_params",fov:+$("fov").value,
  f_number:+$("fn").value,focus:+$("fc").value});
$("fov").onchange=camPost;$("fn").onchange=camPost;$("fc").onchange=camPost;
$("denoise").onclick=()=>post({op:"denoise"});
$("save").onclick=()=>post({op:"save"});
window.onkeydown=e=>{
 const k=e.key.toLowerCase();
 if("wasdqe".includes(k)&&!e.repeat) post({op:"move",key:k,dist:0.5});
};
let drag=null;
$("img").onmousedown=e=>{drag=[e.clientX,e.clientY];e.preventDefault()};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{
 if(!drag)return;
 const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
 if(Math.abs(dx)+Math.abs(dy)<6)return;
 drag=[e.clientX,e.clientY];
 post({op:"look",dphi:dx*0.5,dtheta:-dy*0.5});
};
</script></body></html>
"""


class ViewerServer:
    """Controller + lock + background accumulation loop behind HTTP.

    The render thread mirrors the reference's per-frame loop
    (app/main.cpp render-then-present): accumulate `spp_per_tick` whenever
    n_samples < max_samples, under a lock shared with command handling so
    camera edits and scene swaps serialize with rendering (the GL viewer
    gets this for free from its single thread)."""

    def __init__(self, width: int = 256, height: int = 256,
                 scene: str = "cornell_box", spp_per_tick: int = 1):
        self.ctl = Controller(width=width, height=height)
        if scene in BUILTIN_SCENES:
            self.ctl.load_builtin_scene(scene)
        else:
            self.ctl.load_scene(scene)
        self.ctl.state.camera_origin = (0.0, 1.0, 3.0)
        self.ctl.renderer.camera.origin = np.asarray(
            [0.0, 1.0, 3.0], np.float32
        )
        self.ctl.renderer.camera._update_transform()
        self.scene_name = scene
        self.spp_per_tick = spp_per_tick
        self.lock = threading.Lock()
        self._stop = threading.Event()
        self._render_thread = None
        # snapshots served while the render thread holds the lock (the
        # first jit compile takes 30-300 s on TPU; the page must stay
        # responsive through it)
        self._png_cache: bytes = b""
        self._state_cache: bytes = json.dumps(
            {"spp": 0, "max_samples": 0, "aov": "beauty", "sky": "constant",
             "scene": scene, "scenes": [scene], "camera": [0.0, 0.0, 0.0],
             "busy": True}
        ).encode()

    # -- render loop --------------------------------------------------------

    def tick_once(self) -> bool:
        """One accumulation step if below the sample budget."""
        with self.lock:
            if self.ctl.state.n_samples >= self.ctl.state.max_samples:
                return False
            self.ctl.render_tick(self.spp_per_tick)
            return True

    def _loop(self):
        while not self._stop.is_set():
            if not self.tick_once():
                self._stop.wait(0.1)

    def start_render_thread(self):
        self._render_thread = threading.Thread(target=self._loop, daemon=True)
        self._render_thread.start()

    def stop(self):
        self._stop.set()
        if self._render_thread is not None:
            self._render_thread.join(timeout=5.0)

    # -- state + commands ----------------------------------------------------

    def _snapshot_locked(self):
        """Refresh the cached state/frame; caller must hold the lock."""
        st = self.ctl.state
        cam = self.ctl.renderer.camera
        self._state_cache = json.dumps({
            "spp": st.n_samples,
            "max_samples": st.max_samples,
            "aov": st.aov_type.name.lower(),
            "sky": st.sky_type.name.lower(),
            "scene": self.scene_name,
            "scenes": self.ctl.scene_names(),
            "camera": [float(v) for v in np.asarray(cam.origin)],
            "busy": False,
        }).encode()
        self._png_cache = png_bytes(self.ctl.get_display_image())

    def state_json(self) -> bytes:
        # non-blocking: a tick (or first compile) in flight serves the last
        # snapshot instead of stalling the page
        if self.lock.acquire(timeout=0.2):
            try:
                self._snapshot_locked()
            finally:
                self.lock.release()
        return self._state_cache

    def frame_png(self) -> bytes:
        if self.lock.acquire(timeout=0.2):
            try:
                self._png_cache = png_bytes(self.ctl.get_display_image())
            finally:
                self.lock.release()
        if self._png_cache:
            return self._png_cache
        # 1x1 placeholder before the first frame exists
        return png_bytes(np.zeros((1, 1, 3), np.float32))

    def handle_cmd(self, cmd: dict) -> dict:
        op = cmd.get("op")
        with self.lock:
            if op == "move" and cmd.get("key") in _MOVES:
                self.ctl.move_camera(
                    _MOVES[cmd["key"]], float(cmd.get("dist", 0.5))
                )
            elif op == "look":
                self.ctl.rotate_camera(
                    float(cmd.get("dphi", 0.0)), float(cmd.get("dtheta", 0.0))
                )
            elif op == "aov":
                self.ctl.state.aov_type = AOVType[cmd["name"].upper()]
            elif op == "sky":
                self.ctl.state.sky_type = SkyType[cmd["name"].upper()]
                if self.ctl.state.sky_type == SkyType.ARHOSEK:
                    self.ctl.state.directional_light_le = (20, 20, 20)
                    self.ctl.state.directional_light_dir = (0.3, 1.0, 0.2)
                    self.ctl.state.directional_light_angle = 0.53
                self.ctl.update_sky_type()
            elif op == "scene":
                name = cmd["name"]
                if name in BUILTIN_SCENES:
                    self.ctl.load_builtin_scene(name)
                else:
                    self.ctl.load_scene(name)
                self.scene_name = name
            elif op == "denoise":
                self.ctl.denoise()
                self.ctl.state.aov_type = AOVType.DENOISED
            elif op == "max_samples":
                self.ctl.state.max_samples = int(cmd["value"])
            elif op == "camera_params":
                # fov/F-number/focus sliders (gui.cpp:136-315 camera pane)
                st = self.ctl.state
                st.fov_deg = float(cmd.get("fov", st.fov_deg))
                st.f_number = float(cmd.get("f_number", st.f_number))
                st.focus = float(cmd.get("focus", st.focus))
                self.ctl.update_camera_params()
            elif op == "clear":
                self.ctl.clear_render()
            elif op == "save":
                path = self.ctl.save_image(cmd.get("path"))
                return {"ok": True, "path": path}
            else:
                return {"ok": False, "error": f"unknown op {op!r}"}
        return {"ok": True}


def make_handler(server: ViewerServer):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif path == "/frame.png":
                self._send(200, server.frame_png(), "image/png")
            elif path == "/state":
                self._send(200, server.state_json(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/cmd":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                cmd = json.loads(self.rfile.read(n) or b"{}")
                out = server.handle_cmd(cmd)
            except (ValueError, KeyError) as e:
                out = {"ok": False, "error": str(e)}
            self._send(200, json.dumps(out).encode(), "application/json")

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(server: ViewerServer, port: int = 8000, host: str = "127.0.0.1"):
    """Create (not run) the HTTP server — tests drive it from a thread."""
    return ThreadingHTTPServer((host, port), make_handler(server))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_box")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--spp-per-tick", type=int, default=1)
    ap.add_argument("--max-samples", type=int, default=256)
    args = ap.parse_args(argv)

    import os

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    vs = ViewerServer(width=args.width, height=args.height,
                      scene=args.scene, spp_per_tick=args.spp_per_tick)
    vs.ctl.state.max_samples = args.max_samples
    vs.start_render_thread()
    httpd = serve(vs, port=args.port, host=args.host)
    print(f"viewing {args.scene} at http://{args.host}:{args.port}/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        vs.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
