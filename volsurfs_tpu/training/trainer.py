"""Training loop driver (reference volsurfs_py/trainer.py, 733 lines).

Hot loop design: ray-batch generation and the optimization step are two
jitted functions; the Python loop only sequences them and handles cadenced
side work (occupancy refresh every 50 iters, test-loss estimation,
checkpointing, preview renders). Unlike the reference — which runs with
CUDA_LAUNCH_BLOCKING=1 and a device sync after every kernel
(trainer.py:53, RaySampler.cu:55) — steps here are dispatched asynchronously
and only the logged losses force a host sync.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from volsurfs_tpu.datasets.cameras import get_camera_rays
from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.datasets.tensor_reel import get_next_rays_batch, make_tensor_reel
from volsurfs_tpu.methods.base import render_frame_chunked
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.params.hyper_params import get_method_hyper_params
from volsurfs_tpu.training import checkpoints
from volsurfs_tpu.utils.evaluation import PerSceneEvaluator


def make_method(method_name, hp, bounding_primitive, bg_color, occupancy_res, key,
                **method_kwargs):
    if method_name == "surf":
        from volsurfs_tpu.methods.surf import Surf

        return Surf(hp, bounding_primitive, bg_color=bg_color,
                    occupancy_res=occupancy_res, key=key, **method_kwargs)
    if method_name == "nerf":
        from volsurfs_tpu.methods.nerf import NeRF

        return NeRF(hp, bounding_primitive, bg_color=bg_color,
                    occupancy_res=occupancy_res, key=key, **method_kwargs)
    if method_name == "offsets_surfs":
        from volsurfs_tpu.methods.offsets_surfs import OffsetsSurfs

        return OffsetsSurfs(hp, bounding_primitive, bg_color=bg_color,
                            occupancy_res=occupancy_res, key=key, **method_kwargs)
    if method_name == "volsurfs":
        from volsurfs_tpu.methods.volsurfs import VolSurfs

        return VolSurfs(hp, bg_color=bg_color, key=key, **method_kwargs)
    raise ValueError(f"unknown method {method_name}")


class Trainer:
    def __init__(
        self,
        method,
        mv_data: MVDataset,
        run_dir: str,
        update_occupancy_every: int = 50,
        log_every: int = 100,
        checkpoint_every: int | None = None,
        seed: int = 0,
        train_params=None,
        callbacks=None,
    ):
        self.method = method
        self.mv_data = mv_data
        self.run_dir = run_dir
        self.update_occupancy_every = update_occupancy_every
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.train_params = train_params
        self.callbacks = callbacks
        os.makedirs(run_dir, exist_ok=True)

        train_split = mv_data["train"]
        self.reel = make_tensor_reel(train_split.cameras, train_split.rgbs, train_split.masks)
        if "test" in mv_data.splits:
            test_split = mv_data["test"]
            self.test_reel = make_tensor_reel(
                test_split.cameras, test_split.rgbs, test_split.masks
            )
        else:
            self.test_reel = None
        self._batch_key = jax.random.PRNGKey(seed + 1234)
        self._batch_fn = jax.jit(
            lambda reel, key: get_next_rays_batch(
                reel,
                key,
                method.hp.training_rays_batch_size
                * method.hp.nr_training_rays_per_pixel,
                jitter_pixels=method.hp.jitter_training_rays,
                nr_rays_per_pixel=method.hp.nr_training_rays_per_pixel,
            )
        )
        self._test_loss_fn = None
        self.loss_history = []

    def estimate_test_loss(self, state):
        """RGB L1 on a random test-ray batch
        (reference utils/training.py:12-56 estimate_test_loss)."""
        if self.test_reel is None:
            return None
        if self._test_loss_fn is None:
            hp = self.method.hp
            render_fn = self.method.make_render_fn()

            def fn(params, grid, reel, key, iter_nr):
                batch = get_next_rays_batch(
                    reel, key, hp.training_rays_batch_size, jitter_pixels=False
                )
                out = render_fn(params, grid, batch["rays_o"], batch["rays_d"], iter_nr)
                return jnp.mean(jnp.abs(out["rgb"] - batch["gt_rgb"]))

            self._test_loss_fn = jax.jit(fn)
        self._batch_key, k = jax.random.split(self._batch_key)
        return float(
            self._test_loss_fn(
                state.params, state.grid, self.test_reel, k, state.iter_nr
            )
        )

    def train(self, state, end_iter: int | None = None, callback=None):
        hp = self.method.hp
        tp = self.train_params
        end_iter = end_iter if end_iter is not None else hp.training_end_iter
        t_start = time.time()
        it = int(state.iter_nr)
        if self.callbacks is not None:
            self.callbacks.training_started()
        while it < end_iter:
            if (
                self.method.hp.use_occupancy_grid
                and it % self.update_occupancy_every == 0
                and hasattr(self.method, "update_occupancy_grid")
            ):
                state = self.method.update_occupancy_grid(state)

            self._batch_key, k = jax.random.split(self._batch_key)
            batch = self._batch_fn(self.reel, k)
            state, losses = self.method.train_step(state, batch)
            it += 1

            if it % self.log_every == 0 or it == end_iter:
                loss_val = float(losses["loss"])
                iters_per_sec = it / max(time.time() - t_start, 1e-9)
                self.loss_history.append((it, loss_val))
                print(
                    f"iter {it}/{end_iter} loss {loss_val:.5f} "
                    f"({iters_per_sec:.1f} it/s)",
                    flush=True,
                )
            if self.callbacks is not None:
                self.callbacks.iter_ended(iter_nr=it, losses=losses)
            if callback is not None:
                callback(it, state, losses)

            # cadenced side work (reference trainer.py:334-397)
            if tp is not None:
                if tp.compute_test_loss and it % tp.compute_test_loss_freq == 0:
                    tl = self.estimate_test_loss(state)
                    if tl is not None:
                        print(f"iter {it} test loss {tl:.5f}", flush=True)
                if it % tp.render_freq == 0 and "test" in self.mv_data.splits:
                    from volsurfs_tpu.utils.rendering import (
                        render_from_camera,
                        save_image_png,
                    )

                    cam = self.mv_data["test"].cameras[it // tp.render_freq
                                                       % len(self.mv_data["test"].cameras)]
                    buffers = render_from_camera(self, state, cam)
                    for name, img in buffers.items():
                        save_image_png(
                            img,
                            os.path.join(self.run_dir, "renders", name),
                            f"{it:07d}",
                        )
                if tp.save_checkpoints and it % tp.checkpoint_freq == 0:
                    checkpoints.save_checkpoint(
                        os.path.join(self.run_dir, "checkpoints"), state
                    )
            if self.checkpoint_every and it % self.checkpoint_every == 0:
                checkpoints.save_checkpoint(
                    os.path.join(self.run_dir, "checkpoints"), state
                )
        if self.callbacks is not None:
            self.callbacks.training_ended()
        checkpoints.save_checkpoint(os.path.join(self.run_dir, "checkpoints"), state)
        return state

    def render_camera(self, state, camera, chunk_size: int = 2048):
        rays_o, rays_d = get_camera_rays(camera)
        render_fn = self.method.make_render_fn()
        out = render_frame_chunked(
            lambda o, d: render_fn(state.params, state.grid, o, d, state.iter_nr),
            rays_o,
            rays_d,
            chunk_size,
        )
        H, W = camera.height, camera.width
        return {k: np.asarray(v).reshape(H, W, -1) for k, v in out.items()}

    def eval_split(self, state, split_name: str, max_cameras: int | None = None):
        split = self.mv_data[split_name]
        evaluator = PerSceneEvaluator(split_name)
        cams = split.cameras[:max_cameras] if max_cameras else split.cameras
        for i, cam in enumerate(cams):
            out = self.render_camera(state, cam)
            evaluator.update(cam.camera_id, split.rgbs[i], out["rgb"].clip(0, 1))
        out_dir = os.path.join(self.run_dir, "results")
        evaluator.save_csv(out_dir)
        return evaluator.means()


def main():
    parser = argparse.ArgumentParser("volsurfs_tpu trainer")
    parser.add_argument("--method", required=True,
                        choices=["surf", "nerf", "offsets_surfs", "volsurfs"])
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--scene", default="sphere")
    parser.add_argument("--datasets_path", default="./data")
    parser.add_argument("--runs_path", default="./runs")
    parser.add_argument("--exp_name", default="default")
    parser.add_argument("--run_id", default=None)
    parser.add_argument("--exp_config", default=None, help="hjson config path")
    parser.add_argument("--train_iters", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--subsample_factor", type=int, default=1)
    parser.add_argument("--occupancy_res", type=int, default=256)
    parser.add_argument("--continue_training", action="store_true")
    parser.add_argument("--eval_test", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if args.exp_config is None:
        args.exp_config = os.path.join(
            os.path.dirname(__file__), "..", "..", "config", args.method, "base.cfg"
        )
    hp = get_method_hyper_params(args.method, args.exp_config)
    if args.train_iters is not None:
        hp.training_end_iter = args.train_iters
    if args.lr is not None:
        hp.lr = args.lr

    config = {"subsample_factor": args.subsample_factor}
    mv_data = MVDataset(args.dataset, args.scene, args.datasets_path, config=config)

    run_id = args.run_id or time.strftime("%Y-%m-%d-%H%M%S")
    run_dir = os.path.join(
        args.runs_path, args.method, args.exp_name, args.scene, run_id
    )
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)

    bounding = make_bounding_sphere(mv_data.scene_radius)
    method = make_method(
        args.method, hp, bounding, mv_data.bg_color, args.occupancy_res,
        jax.random.PRNGKey(args.seed),
    )
    state = method.init_state()
    trainer = Trainer(method, mv_data, run_dir, seed=args.seed)
    if args.continue_training:
        state = checkpoints.load_checkpoint(
            os.path.join(run_dir, "checkpoints"), state
        )
    state = trainer.train(state)
    if args.eval_test:
        means = trainer.eval_split(state, "test")
        print("test metrics:", means)


if __name__ == "__main__":
    main()
