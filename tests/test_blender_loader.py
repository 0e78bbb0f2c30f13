"""Blender (NeRF-synthetic) loader round-trip test.

Writes a tiny transforms_{train,test}.json + RGBA PNGs to tmp, loads them
through MVDataset, and checks camera/ray consistency against the poses we
wrote (reference loads this format through the mvdatasets submodule;
format per NeRF's blender datasets: frames[].transform_matrix is an
OpenGL camera-to-world, camera_angle_x gives the focal length).
"""

import json
import os

import numpy as np
import pytest

from volsurfs_tpu.datasets.cameras import get_camera_rays, look_at_pose
from volsurfs_tpu.datasets.mvdataset import MVDataset

W = H = 16
N_FRAMES = 4
CAM_ANGLE_X = 0.8
POSE_SCALE = 0.25


def _opencv_to_opengl(pose_cv):
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    return pose_cv @ flip


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("datasets")
    scene = root / "blender" / "tiny"
    os.makedirs(scene / "train")
    poses_gl = []
    for split in ("train", "test"):
        frames = []
        for i in range(N_FRAMES):
            ang = 2 * np.pi * i / N_FRAMES + (0.3 if split == "test" else 0.0)
            eye = np.asarray([2.0 * np.cos(ang), 2.0 * np.sin(ang), 1.0])
            pose_cv = look_at_pose(eye)  # OpenCV cam-to-world
            pose_gl = _opencv_to_opengl(pose_cv)
            poses_gl.append(pose_gl)
            # RGBA image: constant color = frame index, alpha=1 left half,
            # 0 right half (tests white-bg compositing + mask round trip)
            img = np.zeros((H, W, 4), np.uint8)
            img[..., 0] = 10 * (i + 1)
            img[..., 1] = 100
            img[:, : W // 2, 3] = 255
            os.makedirs(scene / split, exist_ok=True)
            Image.fromarray(img).save(scene / split / f"r_{i}.png")
            frames.append(
                {
                    "file_path": f"{split}/r_{i}",  # extensionless, NeRF style
                    "transform_matrix": pose_gl.tolist(),
                }
            )
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": CAM_ANGLE_X, "frames": frames}, f)
    return str(root), np.stack(poses_gl)


def test_blender_round_trip(blender_scene):
    root, poses_gl = blender_scene
    mv = MVDataset("blender", "tiny", root, config={"pose_scale": POSE_SCALE})

    for split in ("train", "test"):
        sp = mv[split]
        assert len(sp.cameras) == N_FRAMES
        assert sp.rgbs.shape == (N_FRAMES, H, W, 3)
        assert sp.masks.shape == (N_FRAMES, H, W, 1)

    train = mv["train"]
    # alpha -> mask, white-background compositing on the transparent half
    np.testing.assert_allclose(train.masks[0, :, : W // 2, 0], 1.0)
    np.testing.assert_allclose(train.masks[0, :, W // 2 :, 0], 0.0)
    np.testing.assert_allclose(train.rgbs[0, :, W // 2 :], 1.0)  # white bg
    np.testing.assert_allclose(
        train.rgbs[0, :, : W // 2, 0], 10.0 / 255.0, atol=1e-6
    )

    for i, cam in enumerate(train.cameras):
        # focal from camera_angle_x
        focal = 0.5 * W / np.tan(0.5 * CAM_ANGLE_X)
        K = cam.get_intrinsics()
        np.testing.assert_allclose(K[0, 0], focal, rtol=1e-6)
        np.testing.assert_allclose(K[1, 1], focal, rtol=1e-6)

        # camera center = scaled OpenGL translation
        pose = cam.get_pose()
        np.testing.assert_allclose(
            pose[:3, 3], poses_gl[i][:3, 3] * POSE_SCALE, rtol=1e-5
        )

        # rays: all origins at the camera center; the central ray points at
        # the scene origin (look_at target), i.e. along -Z of the GL pose
        rays_o, rays_d = get_camera_rays(cam)
        rays_o = np.asarray(rays_o).reshape(H, W, 3)
        rays_d = np.asarray(rays_d).reshape(H, W, 3)
        np.testing.assert_allclose(
            rays_o, np.broadcast_to(pose[:3, 3], rays_o.shape), atol=1e-6
        )
        np.testing.assert_allclose(
            np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-5
        )
        fwd = -poses_gl[i][:3, 2]  # OpenGL looks down -Z
        center_dir = rays_d[H // 2, W // 2]
        assert center_dir @ fwd > 0.99

        # every ray through the image plane reprojects to its pixel
        x, y = 5, 9
        d = rays_d[y, x]
        d_cam = pose[:3, :3].T @ d
        px = K @ (d_cam / d_cam[2])
        np.testing.assert_allclose(px[:2], [x + 0.5, y + 0.5], atol=1e-4)


def test_blender_subsample_and_skip(blender_scene):
    root, _ = blender_scene
    mv = MVDataset(
        "blender", "tiny", root,
        config={"subsample_factor": 2, "test_skip": 2},
    )
    assert mv["train"].rgbs.shape == (N_FRAMES, H // 2, W // 2, 3)
    assert len(mv["test"].cameras) == N_FRAMES // 2
    cam = mv["train"].cameras[0]
    assert cam.width == W // 2 and cam.height == H // 2
    # intrinsics are rescaled consistently with the image
    focal = 0.5 * W / np.tan(0.5 * CAM_ANGLE_X)
    np.testing.assert_allclose(cam.get_intrinsics()[0, 0], focal / 2, rtol=1e-6)
