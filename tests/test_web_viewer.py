"""Web viewer: the live windowed-viewer analog (gui.cpp:62-368).

Drives the real HTTP server end-to-end: page, progressive PNG frames,
state JSON, and camera/AOV commands (which must restart accumulation,
matching the GL viewer's camera widgets gui.cpp:23-54)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from fredholm_tpu.apps.web_viewer import ViewerServer, serve


@pytest.fixture(scope="module")
def viewer():
    vs = ViewerServer(width=32, height=32, scene="cornell_box")
    httpd = serve(vs, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield vs, f"http://127.0.0.1:{port}"
    httpd.shutdown()
    vs.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def _post(url, obj):
    req = urllib.request.Request(
        url + "/cmd", data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


class TestWebViewer:
    def test_page_and_state(self, viewer):
        vs, url = viewer
        page = _get(url + "/")
        assert b"fredholm-tpu viewer" in page
        st = json.loads(_get(url + "/state"))
        assert st["scene"] == "cornell_box"
        assert "cornell_box" in st["scenes"]
        assert st["spp"] == 0

    def test_progressive_frames(self, viewer):
        vs, url = viewer
        assert vs.tick_once()  # one accumulation step
        st = json.loads(_get(url + "/state"))
        assert st["spp"] >= 1
        png = _get(url + "/frame.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # decodable and the right size
        import io

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape[:2] == (32, 32)
        assert img.max() > 0  # the lit cornell box is not black

    def test_camera_command_restarts_accumulation(self, viewer):
        vs, url = viewer
        vs.tick_once()
        before = np.asarray(vs.ctl.renderer.camera.origin).copy()
        out = _post(url, {"op": "move", "key": "w", "dist": 0.25})
        assert out["ok"]
        st = json.loads(_get(url + "/state"))
        assert st["spp"] == 0  # accumulation restarted (gui.cpp:23-54)
        after = np.asarray(vs.ctl.renderer.camera.origin)
        assert not np.allclose(before, after)

    def test_look_and_aov(self, viewer):
        vs, url = viewer
        assert _post(url, {"op": "look", "dphi": 10.0, "dtheta": -5.0})["ok"]
        assert _post(url, {"op": "aov", "name": "normal"})["ok"]
        st = json.loads(_get(url + "/state"))
        assert st["aov"] == "normal"
        vs.tick_once()
        png = _get(url + "/frame.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        _post(url, {"op": "aov", "name": "beauty"})

    def test_unknown_op_is_reported(self, viewer):
        vs, url = viewer
        out = _post(url, {"op": "fly"})
        assert not out["ok"]

    def test_camera_params_command(self, viewer):
        """fov/F/focus sliders (gui.cpp camera pane analog) apply to the
        renderer camera and restart accumulation."""
        vs, url = viewer
        vs.tick_once()
        out = _post(url, {"op": "camera_params", "fov": 45.0,
                          "f_number": 2.0, "focus": 3.5})
        assert out["ok"]
        cam = vs.ctl.renderer.camera
        assert abs(float(cam.fov) - np.deg2rad(45.0)) < 1e-6
        assert float(cam.f_number) == 2.0 and float(cam.focus) == 3.5
        st = json.loads(_get(url + "/state"))
        assert st["spp"] == 0
