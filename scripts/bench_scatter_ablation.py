"""Surf train-step scatter ablation on the real chip.

Measures the same jitted train step with the hash-table gradient scatter
(a) as shipped ("flat"), (b) replaced by zeros ("zero") — the difference is
the true scatter share of the step — and (c) the "sorted" unique-scatter
formulation. Run: python scripts/bench_scatter_ablation.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.methods.surf import Surf
from volsurfs_tpu.models import encodings as E
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.params.hyper_params import HyperParamsSuRF


def main():
    # reference workload shape (BASELINE.md): 512 rays x (64 + 32) samples
    hp = HyperParamsSuRF(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=512,
        max_nr_samples_per_ray=64,
        max_nr_imp_samples_per_ray=32,
        do_importance_sampling=True,
        init_phase_end_iter=100,
        first_phase_end_iter=100000,
        training_end_iter=100000,
        nr_warmup_iters=50,
        lr=3e-3,
        lr_milestones=[80000],
        eikonal_weight=0.04,
        offsurface_weight=1e-4,
        geom_feat_size=32,
        sdf_nr_iters_for_c2f=0,
        nr_samples_bg=8,
    )
    mv = MVDataset(
        "synthetic", "sphere", "",
        config={"width": 64, "height": 64, "nr_train_cameras": 4,
                "nr_test_cameras": 1},
    )
    bound = make_bounding_sphere(1.0)
    R = hp.training_rays_batch_size
    batch = {
        "rays_o": jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (R, 1)),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1)),
        "gt_rgb": jnp.zeros((R, 3)),
        "gt_mask": jnp.ones((R, 1)),
    }

    for mode in ("flat", "zero", "sorted"):
        E.set_table_grad_mode(mode)
        m = Surf(hp, bound, bg_color="white", init_sphere_radius=0.4,
                 occupancy_res=128, key=jax.random.PRNGKey(0))
        state = m.init_state()
        state = state.replace(iter_nr=jnp.asarray(200, jnp.int32))  # data phase
        state, losses = m.train_step(state, batch)  # compile
        float(losses["loss"])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, losses = m.train_step(state, batch)
            float(losses["loss"])
            ts.append(time.perf_counter() - t0)
        print(f"mode={mode:<7} step {min(ts)*1e3:8.1f} ms "
              f"({1.0/min(ts):.2f} it/s)", flush=True)
    E.set_table_grad_mode("flat")


if __name__ == "__main__":
    main()
