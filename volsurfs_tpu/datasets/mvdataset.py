"""Multi-view dataset loading (Blender NeRF-synthetic / Shelly format + synthetic).

Re-implements the used surface of the mvdatasets submodule (reference
trainer.py:570-589: ``MVDataset(dataset, scene, path, splits, config)`` with
per-split camera + image lists). Blender/Shelly scenes load
``transforms_{split}.json``; the ``synthetic`` dataset generates analytic
images procedurally (no downloads needed).

Scene normalization: poses are scaled by ``pose_scale`` so the object fits
the unit-ish bounding sphere the methods assume (the reference gets this from
mvdatasets' internal per-dataset scaling).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from volsurfs_tpu.datasets import synthetic
from volsurfs_tpu.datasets.cameras import Camera, opengl_to_opencv_pose


@dataclasses.dataclass
class Split:
    cameras: list
    rgbs: np.ndarray  # [N, H, W, 3] float32
    masks: np.ndarray  # [N, H, W, 1] float32


class MVDataset:
    """dataset_name in {synthetic, blender, shelly, dtu}; splits dict of Split."""

    def __init__(
        self,
        dataset_name: str,
        scene_name: str,
        datasets_path: str,
        splits=("train", "test"),
        config: dict | None = None,
    ):
        config = config or {}
        self.dataset_name = dataset_name
        self.scene_name = scene_name
        self.splits: dict[str, Split] = {}
        self.scene_radius = float(config.get("scene_radius", 1.0))
        self.init_sphere_scale = float(config.get("init_sphere_scale", 0.3))
        self.bg_color = config.get("bg_color", None)

        if dataset_name == "synthetic":
            w = int(config.get("width", 64))
            h = int(config.get("height", 64))
            n_train = int(config.get("nr_train_cameras", 24))
            n_test = int(config.get("nr_test_cameras", 4))
            for split, n, seed in (("train", n_train, 0), ("test", n_test, 1)):
                if split not in splits:
                    continue
                cams, rgbs, masks = synthetic.make_synthetic_split(
                    n, w, h, cam_radius=2.0, sphere_radius=0.5, seed=seed
                )
                self.splits[split] = Split(cams, rgbs, masks)
            self.bg_color = self.bg_color or "white"
        elif dataset_name in ("blender", "shelly", "blendernerf", "dmsr"):
            scene_path = os.path.join(datasets_path, dataset_name, scene_name)
            pose_scale = float(config.get("pose_scale", 0.25))
            subsample = int(config.get("subsample_factor", 1))
            test_skip = int(config.get("test_skip", 1))
            for split in splits:
                self.splits[split] = _load_blender_split(
                    scene_path, split, pose_scale, subsample,
                    test_skip if split == "test" else 1,
                )
            self.bg_color = self.bg_color or "white"
        else:
            raise NotImplementedError(f"dataset {dataset_name} not supported yet")

    def __getitem__(self, split: str) -> Split:
        return self.splits[split]

    def has_masks(self) -> bool:
        return True


def _load_blender_split(
    scene_path: str, split: str, pose_scale: float, subsample: int, skip: int
) -> Split:
    from PIL import Image

    with open(os.path.join(scene_path, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    frames = meta["frames"][::skip]
    cams, rgbs, masks = [], [], []
    for i, frame in enumerate(frames):
        img_path = os.path.join(scene_path, frame["file_path"])
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"
        img = np.asarray(Image.open(img_path), np.float32) / 255.0
        if subsample > 1:
            img = img[::subsample, ::subsample]
        h, w = img.shape[:2]
        if img.shape[-1] == 4:
            alpha = img[..., 3:4]
            rgb = img[..., :3] * alpha + (1.0 - alpha)  # white bg composite
        else:
            alpha = np.ones((h, w, 1), np.float32)
            rgb = img[..., :3]
        focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
        intr = np.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
        pose_gl = np.asarray(frame["transform_matrix"], np.float32)
        pose = opengl_to_opencv_pose(pose_gl)
        pose[:3, 3] *= pose_scale
        cams.append(Camera(intr, pose, w, h, camera_id=i))
        rgbs.append(rgb)
        masks.append(alpha)
    return Split(cams, np.stack(rgbs), np.stack(masks))
