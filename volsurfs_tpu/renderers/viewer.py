"""Viewer: orbit camera + turntable / interactive rendering of baked scenes.

Re-implements the reference viewer layer (volsurfs_py/viewer/viewer.py:11-363
dearpygui window, viewer/orbit_camera.py, visualizer.py entry). This
environment is headless, so the primary mode renders turntable frames to
PNGs with per-frame timing (the HUD numbers the reference displays,
viewer.py:185-214); an interactive window is attempted only if a GUI
toolkit + display are present.
"""

from __future__ import annotations

import os
import time

import numpy as np

from volsurfs_tpu.datasets.cameras import Camera, look_at_pose


class OrbitCamera:
    """Azimuth/elevation/radius orbit around a center
    (reference viewer/orbit_camera.py)."""

    def __init__(self, width=800, height=800, radius=2.0, fovy_deg=45.0,
                 center=(0.0, 0.0, 0.0)):
        self.width = width
        self.height = height
        self.radius = radius
        self.azimuth = 0.0
        self.elevation = 0.3
        self.center = np.asarray(center, np.float32)
        f = 0.5 * height / np.tan(np.deg2rad(fovy_deg) / 2)
        self.intrinsics = np.asarray(
            [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32
        )

    def rotate(self, d_azimuth: float, d_elevation: float):
        self.azimuth += d_azimuth
        self.elevation = float(
            np.clip(self.elevation + d_elevation, -1.45, 1.45)
        )

    def zoom(self, factor: float):
        self.radius = float(np.clip(self.radius * factor, 0.2, 20.0))

    def pan(self, dx: float, dy: float):
        self.center = self.center + np.asarray([dx, dy, 0.0], np.float32)

    def camera(self) -> Camera:
        eye = self.center + self.radius * np.asarray(
            [
                np.cos(self.azimuth) * np.cos(self.elevation),
                np.sin(self.azimuth) * np.cos(self.elevation),
                np.sin(self.elevation),
            ],
            np.float32,
        )
        return Camera(
            intrinsics=self.intrinsics,
            pose=look_at_pose(eye, self.center),
            width=self.width,
            height=self.height,
        )


def render_turntable(
    renderer,
    out_dir: str,
    nr_frames: int = 60,
    resolution: int = 512,
    radius: float = 2.0,
):
    """Render an orbit around the scene; returns per-frame times (the FPS
    figure the reference viewer shows)."""
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    cam = OrbitCamera(resolution, resolution, radius)
    cameras = []
    for i in range(nr_frames):
        cam.azimuth = 2.0 * np.pi * i / nr_frames
        cameras.append(cam.camera())

    use_raster = hasattr(renderer, "render_frame")
    if use_raster:
        # rasterized fast path with candidate/block/shade-tile budgets sized
        # once for the whole orbit (renderers/mesh_renderer.suggest_budgets)
        nr_cand, nr_blocks, nr_shade = renderer.suggest_budgets(cameras)
        _, ovf = renderer.render_frame_device(
            cameras[0], nr_cand, nr_blocks, nr_shade
        )
        if int(np.sum(np.asarray(ovf))) != 0:
            nr_cand, nr_blocks, nr_shade = 256, 0, 0

    frame_times = []
    for i, camera in enumerate(cameras):
        t0 = time.perf_counter()
        if use_raster:
            img = renderer.render_frame(camera, nr_cand, nr_blocks, nr_shade)
        else:
            img = renderer.render(camera)
        frame_times.append(time.perf_counter() - t0)
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(out_dir, f"frame_{i:03d}.png"))
    fps = 1.0 / float(np.mean(frame_times[1:])) if nr_frames > 1 else 0.0
    print(f"turntable: {nr_frames} frames, {fps:.1f} FPS after warmup")
    return frame_times


_VIEWER_HTML = """<!doctype html>
<html><head><title>volsurfs_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#hud { position:fixed; top:8px; left:8px; background:rgba(0,0,0,.6);
       padding:6px 10px; border-radius:4px; white-space:pre; }
img { display:block; margin:0 auto; cursor:grab; }
</style></head><body>
<div id="hud">loading...</div><img id="view" draggable="false">
<script>
// event loop mirroring the reference dearpygui viewer handlers
// (volsurfs_py/viewer/viewer.py:11-363): left-drag orbit, right/middle or
// shift-drag pan, wheel zoom, FPS + render-ms HUD.
let az = 0.0, el = 0.3, radius = 2.0, cx = 0, cy = 0, cz = 0;
let res = RES, busy = false, dirty = true, lastMs = 0, fps = 0, tPrev = 0;
const img = document.getElementById('view'), hud = document.getElementById('hud');
function req() {
  if (busy) { return; }
  if (!dirty) { setTimeout(req, 10); return; }
  busy = true; dirty = false;
  const t0 = performance.now();
  fetch(`/frame?az=${az}&el=${el}&r=${radius}&cx=${cx}&cy=${cy}&cz=${cz}&res=${res}`)
    .then(r => { lastMs = parseFloat(r.headers.get('X-Render-Ms')); return r.blob(); })
    .then(b => {
      img.src = URL.createObjectURL(b);
      const t1 = performance.now();
      fps = 1000.0 / (t1 - (tPrev || t1 - 1)); tPrev = t1;
      hud.textContent = `render ${lastMs.toFixed(1)} ms   loop ${fps.toFixed(1)} fps\\n` +
        `az ${az.toFixed(2)} el ${el.toFixed(2)} r ${radius.toFixed(2)}`;
      busy = false; req();
    }).catch(() => { busy = false; });
}
let drag = null;
img.onmousedown = e => { drag = {x: e.clientX, y: e.clientY, b: e.button, s: e.shiftKey}; e.preventDefault(); };
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
  drag.x = e.clientX; drag.y = e.clientY;
  if (drag.b === 0 && !drag.s) { az -= dx * 0.01; el = Math.min(1.45, Math.max(-1.45, el + dy * 0.01)); }
  else { cx -= dx * 0.002 * radius; cz += dy * 0.002 * radius; }
  dirty = true;
};
img.oncontextmenu = e => e.preventDefault();
window.onwheel = e => { radius = Math.min(20, Math.max(0.2, radius * (e.deltaY > 0 ? 1.1 : 0.9))); dirty = true; };
req();
</script></body></html>
"""


class InteractiveViewer:
    """Interactive viewer event loop over HTTP (reference
    volsurfs_py/viewer/viewer.py:11-363: dearpygui drag/pan/zoom handlers +
    per-frame render into a texture buffer + FPS/timing HUD).

    This environment has no display toolkit, so the window is a browser
    page: mouse handlers update an OrbitCamera server-side per /frame
    request; the HUD shows server render ms and client loop FPS. The
    renderer only needs ``render_frame(camera)`` (raster fast path) or
    ``render(camera)``.
    """

    def __init__(self, renderer, resolution: int = 512, radius: float = 2.0):
        self.renderer = renderer
        self.resolution = resolution
        self.radius = radius
        self._budgets = None
        self.server = None

    def render_params(self, az, el, r, center, res):
        cam_ctl = OrbitCamera(res, res, r)
        cam_ctl.azimuth, cam_ctl.elevation = az, el
        cam_ctl.center = np.asarray(center, np.float32)
        camera = cam_ctl.camera()
        t0 = time.perf_counter()
        if hasattr(self.renderer, "render_frame"):
            if self._budgets is None:
                self._budgets = self.renderer.suggest_budgets([camera])
            img = self.renderer.render_frame(camera, *self._budgets)
        else:
            img = self.renderer.render(camera)
        dt = time.perf_counter() - t0
        img = (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
        return img, dt

    def serve(self, port: int = 8090, blocking: bool = True):
        """Start the HTTP event loop. Returns (server, port); with
        blocking=False the loop runs on a daemon thread (used by tests)."""
        import io
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qs, urlparse

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _VIEWER_HTML.replace("RES", str(viewer.resolution))
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body.encode())
                    return
                if url.path != "/frame":
                    self.send_response(404)
                    self.end_headers()
                    return
                q = parse_qs(url.query)

                def f(name, default):
                    return float(q.get(name, [default])[0])

                img, dt = viewer.render_params(
                    f("az", 0.0), f("el", 0.3), f("r", viewer.radius),
                    (f("cx", 0.0), f("cy", 0.0), f("cz", 0.0)),
                    int(f("res", viewer.resolution)),
                )
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "PNG")
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Render-Ms", f"{dt * 1e3:.2f}")
                self.end_headers()
                self.wfile.write(buf.getvalue())

        server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.server = server
        port = server.server_address[1]
        print(f"viewer: http://127.0.0.1:{port}/ (drag orbit, shift-drag pan, "
              "wheel zoom)", flush=True)
        if blocking:
            server.serve_forever()
        else:
            threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, port


def main():
    import argparse

    parser = argparse.ArgumentParser("volsurfs_tpu viewer")
    parser.add_argument("--scene_dir", required=True, help="baked scene directory")
    parser.add_argument("--out_dir", default="./turntable")
    parser.add_argument("--nr_frames", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--serve", type=int, default=0, metavar="PORT",
                        help="serve the interactive viewer instead of "
                             "writing a turntable")
    args = parser.parse_args()

    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    renderer = BakedMeshRenderer(args.scene_dir)
    if args.serve:
        InteractiveViewer(renderer, args.resolution).serve(args.serve)
    else:
        render_turntable(renderer, args.out_dir, args.nr_frames, args.resolution)


if __name__ == "__main__":
    main()
