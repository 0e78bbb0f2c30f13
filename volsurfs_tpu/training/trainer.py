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

        return VolSurfs(hp, bg_color=bg_color, key=key,
                        bounding_primitive=bounding_primitive, **method_kwargs)
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
        profiler=None,
        distiller=None,
        data_parallel: bool = False,
    ):
        self.method = method
        self.mv_data = mv_data
        self.run_dir = run_dir
        self.update_occupancy_every = update_occupancy_every
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.train_params = train_params
        self.callbacks = callbacks
        self.profiler = profiler
        self.distiller = distiller
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
        # dynamic ray count (reference trainer.py:289-304 multiplies the ray
        # count by target/actual samples every iteration). Arbitrary batch
        # sizes would force a recompile per change, so the count is quantized
        # to power-of-2 buckets: each bucket compiles once and is reused.
        self._rays_bucket = int(method.hp.training_rays_batch_size)
        self._min_bucket = max(32, self._rays_bucket // 8)
        self._max_bucket = self._rays_bucket * 8
        # data-parallel TRAINING over rays (SURVEY.md §5.8): each batch is
        # sharded on its ray axis across a 1-D device mesh, the TrainState
        # (params, optimizer, occupancy grid, rng) replicated; GSPMD inserts
        # the gradient psum over ICI. Identical math to single device — the
        # occupancy refresh runs replicated with identical RNG per replica.
        self.data_parallel = bool(data_parallel) and len(jax.devices()) > 1
        self._mesh = None
        if self.data_parallel:
            from volsurfs_tpu.parallel import mesh as M

            self._mesh = M.make_mesh()
            # ray buckets must divide evenly into shards
            m = self._mesh.size
            self._rays_bucket = max(-(-self._rays_bucket // m) * m, m)
            self._min_bucket = max(-(-self._min_bucket // m) * m, m)
            self._max_bucket = max(-(-self._max_bucket // m) * m, m)
        self._batch_fn_cache = {}
        self._test_loss_fn = None
        self.loss_history = []

    def _batch_fn(self, reel, key):
        n = self._rays_bucket
        if n not in self._batch_fn_cache:
            hp = self.method.hp
            self._batch_fn_cache[n] = jax.jit(
                lambda reel, key, n=n: get_next_rays_batch(
                    reel,
                    key,
                    n * hp.nr_training_rays_per_pixel,
                    jitter_pixels=hp.jitter_training_rays,
                    nr_rays_per_pixel=hp.nr_training_rays_per_pixel,
                )
            )
        return self._batch_fn_cache[n](reel, key)

    def _adjust_ray_bucket(self, losses, it: int):
        """Pick the power-of-2 ray bucket whose sample count is closest to
        target_nr_of_training_samples. Checked every 10 iters: reading the
        sample count forces a host sync, which would otherwise serialize
        every dispatch (the reference adjusts every iteration but runs
        synchronously anyway, trainer.py:289-304)."""
        hp = self.method.hp
        if not hp.is_nr_training_rays_dynamic or "nr_samples_total" not in losses:
            return
        if it % 10 != 0:
            return
        actual = float(losses["nr_samples_total"])
        if actual <= 0:
            return
        target = float(hp.target_nr_of_training_samples)
        ideal = self._rays_bucket * target / actual
        bucket = 2 ** int(round(np.log2(max(ideal, 1.0))))
        bucket = int(np.clip(bucket, self._min_bucket, self._max_bucket))
        if self._mesh is not None:  # keep buckets shard-divisible
            m = self._mesh.size
            bucket = -(-bucket // m) * m
        self._rays_bucket = bucket

    def estimate_test_loss(self, state):
        """RGB L1 on a random test-ray batch
        (reference utils/training.py:12-56 estimate_test_loss)."""
        if self.test_reel is None:
            return None
        if self._test_loss_fn is None:
            hp = self.method.hp
            render_fn = self.method.make_render_fn()
            # batch gen is jitted separately; render_fn is already jitted and
            # must NOT be wrapped in an outer jit (methods inject scene
            # arrays as runtime arguments — an outer trace would capture them
            # as HLO constants)
            batch_fn = jax.jit(
                lambda reel, key: get_next_rays_batch(
                    reel, key, hp.training_rays_batch_size, jitter_pixels=False
                )
            )

            def fn(params, grid, reel, key, iter_nr):
                batch = batch_fn(reel, key)
                out = render_fn(params, grid, batch["rays_o"], batch["rays_d"], iter_nr)
                return jnp.mean(jnp.abs(out["rgb"] - batch["gt_rgb"]))

            self._test_loss_fn = fn
        self._batch_key, k = jax.random.split(self._batch_key)
        return float(
            self._test_loss_fn(
                state.params, state.grid, self.test_reel, k, state.iter_nr
            )
        )

    def _train_step_with_retry(self, state, batch, max_retries: int = 2):
        """One train step, retrying INTERNAL compiler crashes.

        The TPU compile service occasionally aborts on an autotuned fusion
        choice (fusion_emitter CHECK via remote_compile SIGABRT) that a
        recompile of the SAME graph does not take — observed on the offsets
        color-init phase switch. Failed compiles are not cached, so a retry
        re-runs compilation; genuine errors still raise after max_retries.
        """
        for attempt in range(max_retries + 1):
            try:
                return self.method.train_step(state, batch)
            except Exception as e:  # jax.errors.JaxRuntimeError
                transient = "INTERNAL" in str(e) or "SIGABRT" in str(e)
                if not transient or attempt == max_retries:
                    raise
                print(
                    f"train_step compile crashed (attempt {attempt + 1}), "
                    f"retrying: {str(e)[:120]}",
                    flush=True,
                )

    def train(self, state, end_iter: int | None = None, callback=None):
        hp = self.method.hp
        tp = self.train_params
        end_iter = end_iter if end_iter is not None else hp.training_end_iter
        t_start = time.time()
        it = int(state.iter_nr)
        if self.data_parallel:
            from volsurfs_tpu.parallel import mesh as M

            state = M.replicate_state(state, self._mesh)
        if self.callbacks is not None:
            self.callbacks.training_started()
        while it < end_iter:
            prof = self.profiler
            if (
                self.method.hp.use_occupancy_grid
                and it % self.update_occupancy_every == 0
                and hasattr(self.method, "update_occupancy_grid")
            ):
                if prof:
                    prof.start("update_occupancy_grid")
                state = self.method.update_occupancy_grid(state)
                if prof:
                    prof.end("update_occupancy_grid")

            self._batch_key, k = jax.random.split(self._batch_key)
            if prof:
                prof.start("ray_gen")
            batch = self._batch_fn(self.reel, k)
            if self.distiller is not None:
                # teacher-supervised fraction of the batch
                # (reference trainer.py:150-175 distillation rays)
                self._batch_key, kd = jax.random.split(self._batch_key)
                batch = self.distiller.mix_batch(batch, kd)
            if self.data_parallel:
                from volsurfs_tpu.parallel import mesh as M

                batch = M.shard_ray_batch(batch, self._mesh)
            if prof:
                prof.end("ray_gen")
                prof.start("training_iteration")
            state, losses = self._train_step_with_retry(state, batch)
            if prof:
                prof.end("training_iteration")
            it += 1
            self._adjust_ray_bucket(losses, it)

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
        """Full-frame render; averages nr_test_rays_per_pixel jittered
        subsamples when configured (reference base_method.py:366-541
        supersampled render)."""
        render_fn = self.method.make_render_fn()
        ss = max(int(self.method.hp.nr_test_rays_per_pixel), 1)
        H, W = camera.height, camera.width
        acc = None
        for s in range(ss):
            if ss == 1:
                rays_o, rays_d = get_camera_rays(camera)
            else:
                self._batch_key, k = jax.random.split(self._batch_key)
                rays_o, rays_d = get_camera_rays(camera, jitter_pixels=True, key=k)
            out = render_frame_chunked(
                lambda o, d: render_fn(state.params, state.grid, o, d, state.iter_nr),
                rays_o,
                rays_d,
                chunk_size,
            )
            out = {k_: np.asarray(v) for k_, v in out.items()}
            acc = out if acc is None else {
                k_: acc[k_] + out[k_] for k_ in acc
            }
        return {k_: (v / ss).reshape(H, W, -1) for k_, v in acc.items()}

    def eval_split(self, state, split_name: str, max_cameras: int | None = None,
                   use_device_mesh: bool = True):
        """Render + score a split. With several local devices, frames render
        with rays sharded over the 1-D device mesh (SURVEY.md §5.8)."""
        split = self.mv_data[split_name]
        evaluator = PerSceneEvaluator(split_name)
        cams = split.cameras[:max_cameras] if max_cameras else split.cameras

        sharded = None
        if use_device_mesh and len(jax.devices()) > 1 and \
                self.method.hp.nr_test_rays_per_pixel <= 1:
            from volsurfs_tpu.parallel import mesh as M

            device_mesh = M.make_mesh()
            render_fn = self.method.make_render_fn()

            def sharded(cam):
                rays_o, rays_d = get_camera_rays(cam)
                out = M.render_rays_sharded(
                    render_fn, state, rays_o, rays_d, device_mesh
                )
                H, W = cam.height, cam.width
                return {k: np.asarray(v).reshape(H, W, -1) for k, v in out.items()}

        for i, cam in enumerate(cams):
            out = sharded(cam) if sharded else self.render_camera(state, cam)
            evaluator.update(cam.camera_id, split.rgbs[i], out["rgb"].clip(0, 1))
        out_dir = os.path.join(self.run_dir, "results")
        evaluator.save_csv(out_dir)
        return evaluator.means()


def _repo_config(*parts):
    return os.path.join(os.path.dirname(__file__), "..", "..", "config", *parts)


def main():
    """CLI mirroring reference trainer.py main() (:443-733): three-tier config
    (paths/train/data + per-method experiment cfg), init_run directory
    lifecycle, cross-stage model transfer via --models_path / --meshes_path."""
    from volsurfs_tpu.params.params import (
        DataParams,
        PathsParams,
        TrainParams,
        init_run,
    )

    parser = argparse.ArgumentParser("volsurfs_tpu trainer")
    parser.add_argument("--method", required=True,
                        choices=["surf", "nerf", "offsets_surfs", "volsurfs"])
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--scene", default="sphere")
    parser.add_argument("--exp_name", default="default")
    parser.add_argument("--run_id", default=None)
    parser.add_argument("--exp_config", default=None, help="hjson experiment config")
    parser.add_argument("--paths_config", default=None)
    parser.add_argument("--train_config", default=None)
    parser.add_argument("--data_config", default=None)
    parser.add_argument("--datasets_path", default=None, help="override paths cfg")
    parser.add_argument("--runs_path", default=None, help="override paths cfg")
    parser.add_argument("--models_path", default=None,
                        help="models dir of a previous stage (offsets_surfs "
                             "loads sdf.msgpack, volsurfs loads bg.msgpack; "
                             "reference offsets_surfs.sh:93-94)")
    parser.add_argument("--meshes_path", default=None,
                        help="directory of .obj shells for volsurfs "
                             "(reference volsurfs.sh:100-104)")
    parser.add_argument("--train_iters", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--subsample_factor", type=int, default=None)
    parser.add_argument("--occupancy_res", type=int, default=256)
    parser.add_argument("--continue_training", action="store_true")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each training ray batch across all local "
                             "devices (1-D mesh, replicated params; SURVEY.md "
                             "§5.8) — identical math to single device")
    parser.add_argument("--eval_test", action="store_true")
    parser.add_argument("--eval_train", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    # --- three-tier config (SURVEY.md §5.6) ---------------------------------
    if args.exp_config is None:
        base = "base_5.cfg" if args.method in ("offsets_surfs", "volsurfs") else "base.cfg"
        args.exp_config = _repo_config(args.method, base)
    paths_cfg = args.paths_config or _repo_config("paths_config.cfg")
    train_cfg = args.train_config or _repo_config("train_config.cfg")
    data_cfg = args.data_config or _repo_config("data_config.cfg")
    paths = PathsParams(
        paths_cfg if os.path.exists(paths_cfg) else None,
        datasets=args.datasets_path, runs=args.runs_path,
    )
    train_params = TrainParams(
        args.method, train_cfg if os.path.exists(train_cfg) else None
    )
    data_params = DataParams(
        args.dataset, args.scene, data_cfg if os.path.exists(data_cfg) else None
    )

    hp = get_method_hyper_params(args.method, args.exp_config)
    if args.train_iters is not None:
        hp.training_end_iter = args.train_iters
    if args.lr is not None:
        hp.lr = args.lr

    config = dict(data_params.dict)
    if args.subsample_factor is not None:
        config["subsample_factor"] = args.subsample_factor
    mv_data = MVDataset(args.dataset, args.scene, paths.datasets_path, config=config)

    run_dir, run_id = init_run(
        paths.runs_path, args.method, args.exp_name, args.scene,
        run_id=args.run_id, continue_training=args.continue_training,
        config_files={
            "exp_config": args.exp_config,
            "train_config": train_cfg if os.path.exists(train_cfg) else None,
            "data_config": data_cfg if os.path.exists(data_cfg) else None,
        },
    )
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)

    bounding = make_bounding_sphere(mv_data.scene_radius)
    method_kwargs = {}
    if args.method == "volsurfs":
        from volsurfs_tpu.baking.mesh_io import load_obj

        if args.meshes_path is None:
            raise SystemExit("volsurfs requires --meshes_path with .obj shells")
        mesh_files = sorted(
            f for f in os.listdir(args.meshes_path) if f.endswith(".obj")
        )
        # hp.meshes_indices selects a subset of the sorted shells (reference
        # hyper_params.py:386-411 -> utils/mesh_loaders.py:34-90)
        if getattr(hp, "meshes_indices", None):
            mesh_files = [mesh_files[int(i)] for i in sorted(hp.meshes_indices)]
        method_kwargs["meshes"] = [
            load_obj(os.path.join(args.meshes_path, f)) for f in mesh_files
        ]
    method = make_method(
        args.method, hp, bounding, mv_data.bg_color or data_params.bg_color,
        args.occupancy_res, jax.random.PRNGKey(args.seed), **method_kwargs,
    )
    state = method.init_state()

    # cross-stage transfer (reference offsets_surfs.py:248-261, volsurfs.py:394-405)
    if args.models_path:
        sdf_path = os.path.join(args.models_path, "sdf.msgpack")
        if args.method == "offsets_surfs" and os.path.exists(sdf_path):
            # no template: offsets_surfs' params have no "sdf" key (its keys
            # are sdfs/rgb_*/alpha_*/bg) — restore the raw surf-SDF dict and
            # let load_main_sdf map encoder + main head into the shared trunk
            surf_sdf = checkpoints.load_model_params(sdf_path)
            state = method.load_main_sdf(state, surf_sdf)
        bg_path = os.path.join(args.models_path, "bg.msgpack")
        if "bg" in state.params and os.path.exists(bg_path):
            params = dict(state.params)
            params["bg"] = checkpoints.load_model_params(bg_path, params["bg"])
            state = state.replace(params=params)

    trainer = Trainer(
        method, mv_data, run_dir, seed=args.seed, train_params=train_params,
        data_parallel=args.data_parallel,
    )
    if args.continue_training:
        state = checkpoints.load_checkpoint(
            os.path.join(run_dir, "checkpoints"), state
        )
    state = trainer.train(state)
    if args.eval_test or train_params.eval_test:
        print("test metrics:", trainer.eval_split(state, "test"))
    if args.eval_train or train_params.eval_train:
        print("train metrics:", trainer.eval_split(state, "train"))


if __name__ == "__main__":
    main()
