"""Interactive browser viewer: the reference's GLFW window, over HTTP.

The reference app is interactive — WASD/space/shift move, arrows rotate,
ESC quits, C triggers the CPU render (``main.cpp:52-89``,
``Camera::getInput``, ``Camera.cpp:77-119``). A TPU host has no display, so
this serves the same loop to a browser: an HTML page captures key presses
and fetches re-rendered PNG frames; the server applies the reference's exact
movement steps (0.1 units, 1 degree) to the same Camera.

Usage:
    python -m openglgaussiansplattingrenderer_tpu.viewer.interactive scene.ply
then open http://localhost:8000/.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

PAGE = b"""<!doctype html>
<html><head><title>gsplat-tpu viewer</title><style>
body { background:#111; color:#ccc; font-family:monospace; text-align:center }
img { image-rendering:pixelated; border:1px solid #333 }
</style></head><body>
<h3>gsplat-tpu interactive viewer</h3>
<div>WASD move &middot; space/shift up/down &middot; arrows rotate &middot;
C = golden render &middot; stats below</div>
<img id="v" width="75%">
<pre id="s"></pre>
<script>
let busy = false;
async function frame(key) {
  if (busy) return; busy = true;
  const r = await fetch('/frame' + (key ? '?key=' + key : ''));
  const meta = JSON.parse(r.headers.get('x-stats') || '{}');
  document.getElementById('s').textContent = JSON.stringify(meta);
  const blob = await r.blob();
  document.getElementById('v').src = URL.createObjectURL(blob);
  busy = false;
}
document.addEventListener('keydown', (e) => {
  const map = {'w':'w','a':'a','s':'s','d':'d',' ':'space','Shift':'shift',
               'ArrowLeft':'left','ArrowRight':'right','ArrowUp':'up',
               'ArrowDown':'down','c':'c'};
  if (map[e.key] !== undefined) { e.preventDefault(); frame(map[e.key]); }
});
frame();
</script></body></html>"""


class ViewerState:
    def __init__(self, splats, camera):
        self.splats = splats
        self.camera = camera
        self.lock = threading.Lock()

    def apply_key(self, key: Optional[str]) -> None:
        """Reference key handling (Camera::getInput, Camera.cpp:77-119)."""
        cam = self.camera
        if key == "w":
            cam.move_forward(0.1)
        elif key == "s":
            cam.move_backward(0.1)
        elif key == "a":
            cam.move_left(0.1)
        elif key == "d":
            cam.move_right(0.1)
        elif key == "space":
            cam.move_up(0.1)
        elif key == "shift":
            cam.move_down(0.1)
        elif key == "left":
            cam.rotate_left(1.0)
        elif key == "right":
            cam.rotate_right(1.0)
        elif key == "up":
            cam.rotate_up(1.0)
        elif key == "down":
            cam.rotate_down(1.0)

    def render_png(self, key: Optional[str]):
        from openglgaussiansplattingrenderer_tpu.io.png import to_uint8
        from openglgaussiansplattingrenderer_tpu.render import camera_args

        with self.lock:
            self.apply_key(key)
            if key == "c":
                # the reference's C key: run the CPU/golden render
                a = camera_args(self.camera)
                img = self.splats.cpu_render(
                    a["view"], self.camera.width, self.camera.height,
                    a["focal_x"], a["focal_y"], a["tan_fovx"], a["tan_fovy"],
                    a["vp"], save_path=None)
                stats = {"path": "golden"}
            else:
                img = self.splats.render_camera(self.camera)
                stats = {k: np.asarray(v).tolist()
                         for k, v in (self.splats.last_stats or {}).items()}
            stats["pos"] = [round(float(v), 3) for v in self.camera.position]
            stats["rot"] = [round(float(v), 1) for v in self.camera.rotation]

        try:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(to_uint8(np.asarray(img)[..., :3])).save(buf, "PNG")
            return buf.getvalue(), stats
        except ImportError:  # pragma: no cover
            import tempfile

            from openglgaussiansplattingrenderer_tpu.io.png import save_png

            with tempfile.NamedTemporaryFile(suffix=".png") as f:
                save_png(f.name, np.asarray(img)[..., :3])
                return open(f.name, "rb").read(), stats


def make_server(splats, camera, port: int = 8000) -> ThreadingHTTPServer:
    state = ViewerState(splats, camera)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(PAGE)
            elif url.path == "/frame":
                key = parse_qs(url.query).get("key", [None])[0]
                png, stats = state.render_png(key)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Stats", json.dumps(stats))
                self.end_headers()
                self.wfile.write(png)
            else:
                self.send_response(404)
                self.end_headers()

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.state = state
    return server


def main():  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"])
    args = ap.parse_args()
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)

    from openglgaussiansplattingrenderer_tpu import Splats
    from openglgaussiansplattingrenderer_tpu.camera import default_camera

    splats = Splats(args.scene, args.width, args.height)
    cam = default_camera(args.width, args.height)
    server = make_server(splats, cam, args.port)
    print(f"viewing {args.scene} at http://localhost:{args.port}/ "
          "(WASD/space/shift move, arrows rotate, C = golden render)")
    server.serve_forever()


if __name__ == "__main__":
    main()
