"""TSDF fusion + orbit camera tests."""

import numpy as np

from volsurfs_tpu.baking.tsdf import fuse_depths
from volsurfs_tpu.datasets.cameras import Camera
from volsurfs_tpu.datasets.synthetic import make_synthetic_split
from volsurfs_tpu.renderers.viewer import OrbitCamera


def _analytic_depths(cams, radius=0.5):
    """z-depth maps of the analytic sphere for each camera."""
    depths = []
    for cam in cams:
        H, W = cam.height, cam.width
        fx, fy = cam.intrinsics[0, 0], cam.intrinsics[1, 1]
        cx, cy = cam.intrinsics[0, 2], cam.intrinsics[1, 2]
        jj, ii = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5, indexing="xy")
        dirs_cam = np.stack([(jj - cx) / fx, (ii - cy) / fy, np.ones_like(jj)], -1)
        R = cam.pose[:3, :3]
        d = dirs_cam @ R.T
        norm = np.linalg.norm(d, axis=-1)
        dn = d / norm[..., None]
        o = cam.pose[:3, 3]
        b = np.sum(o * dn, -1)
        c = np.sum(o * o) - radius**2
        disc = b * b - c
        hit = disc >= 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        # z-depth = t along unit ray projected on camera z = t / norm... the
        # TSDF integrate compares against pts_cam z, so store z-depth:
        z = np.where(hit & (t > 0), t / norm * 1.0, 0.0)
        # t is along unit dir; z-depth = t * (unit dir z in cam frame)
        z = np.where(hit & (t > 0), t * (dirs_cam[..., 2] / norm), 0.0)
        depths.append(z.astype(np.float32))
    return depths


def test_tsdf_fusion_reconstructs_sphere():
    cams, _, _ = make_synthetic_split(12, 48, 48, cam_radius=2.0, sphere_radius=0.5)
    depths = _analytic_depths(cams)
    verts, faces = fuse_depths(depths, cams, resolution=48, bounds=1.0)
    assert faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=-1)
    # fused surface close to the true sphere
    assert abs(np.median(r) - 0.5) < 0.05
    assert np.abs(r - 0.5).mean() < 0.05


def test_post_process_mesh_drops_floaters():
    """post_process_mesh keeps the big component and drops the floater
    (reference utils/mesh_extraction.py:18-47)."""
    from volsurfs_tpu.baking.marching import extract_mesh_from_fn, post_process_mesh

    def sdf(p):  # big sphere + tiny floater sphere
        d_main = np.linalg.norm(p, axis=-1) - 0.5
        d_float = np.linalg.norm(p - np.asarray([0.0, 0.0, 0.8]), axis=-1) - 0.05
        return np.minimum(d_main, d_float)

    v, f = extract_mesh_from_fn(sdf, resolution=48)
    v2, f2 = post_process_mesh(v, f, cluster_to_keep=1, min_triangles=50)
    assert len(f2) < len(f)  # floater removed
    assert len(f2) > 0.7 * len(f)  # main shell kept
    assert f2.max() < len(v2) and f2.min() >= 0  # valid reindex
    # all kept vertices near the main sphere
    r = np.linalg.norm(v2, axis=-1)
    assert np.abs(r - 0.5).max() < 0.1


def test_neural_texture_align_to_webgl_rotates():
    """align_to_webgl rotates the UV lookup 90 degrees: querying (u, v)
    aligned equals querying the rotated coordinate unaligned."""
    import jax
    import jax.numpy as jnp

    from volsurfs_tpu.models.textures import NeuralTexture

    W = H = 32
    plain = NeuralTexture(res=(H, W), nr_channels=2, anchor=True)
    rot = NeuralTexture(res=(H, W), nr_channels=2, anchor=True,
                        align_to_webgl=True)
    uv = jax.random.uniform(jax.random.PRNGKey(0), (64, 2), minval=0.05,
                            maxval=0.95)
    params = plain.init(jax.random.PRNGKey(1), uv)
    out_rot = rot.apply(params, uv)
    # manually rotate: pix (i,j) -> (W-1-j, i) on rounded pixel coords
    x = uv[:, 0] * W - 0.5
    y = (1.0 - uv[:, 1]) * H - 0.5
    xr, yr = (W - 1) - y, x
    # map back to uv that yields those pixel coords in the plain texture
    uv_r = jnp.stack([(xr + 0.5) / W, 1.0 - (yr + 0.5) / H], -1)
    out_manual = plain.apply(params, uv_r)
    np.testing.assert_allclose(
        np.asarray(out_rot), np.asarray(out_manual), atol=1e-5
    )


def test_orbit_camera():
    orbit = OrbitCamera(64, 64, radius=2.0)
    cam = orbit.camera()
    assert cam.width == 64
    # camera looks at the center: forward axis points from eye to origin
    fwd = cam.pose[:3, 2]
    eye = cam.pose[:3, 3]
    to_center = -eye / np.linalg.norm(eye)
    assert np.dot(fwd, to_center) > 0.99
    orbit.rotate(0.5, 0.2)
    orbit.zoom(0.5)
    cam2 = orbit.camera()
    assert abs(np.linalg.norm(cam2.pose[:3, 3]) - 1.0) < 1e-5  # radius 2*0.5


def test_interactive_viewer_http_loop():
    """The interactive viewer event loop (reference viewer.py:11-363):
    serves the control page, renders /frame requests through an OrbitCamera
    built from the query params, and reports render timing."""
    import io
    import urllib.request

    from PIL import Image

    from volsurfs_tpu.renderers.viewer import InteractiveViewer

    seen = []

    class StubRenderer:
        def render(self, camera):
            seen.append(camera)
            img = np.zeros((camera.height, camera.width, 3), np.float32)
            img[..., 0] = 0.5
            return img

    viewer = InteractiveViewer(StubRenderer(), resolution=32)
    server, port = viewer.serve(port=0, blocking=False)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "volsurfs_tpu viewer" in page and "/frame" in page

        url = (f"http://127.0.0.1:{port}/frame?az=1.57&el=0.0&r=3.0"
               f"&cx=0&cy=0&cz=0&res=24")
        with urllib.request.urlopen(url) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert float(r.headers["X-Render-Ms"]) >= 0.0
            img = Image.open(io.BytesIO(r.read()))
        assert img.size == (24, 24)
        np.testing.assert_allclose(np.asarray(img)[..., 0], 127, atol=1)

        # the camera honored the orbit params: az=pi/2, r=3 -> eye ~ (0,3,0)
        cam = seen[-1]
        np.testing.assert_allclose(
            cam.get_pose()[:3, 3], [0.0, 3.0, 0.0], atol=0.01  # az=1.57~pi/2
        )
        assert cam.width == cam.height == 24
    finally:
        server.shutdown()
