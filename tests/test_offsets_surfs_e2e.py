"""End-to-end offsets_surfs smoke: all four phases run, losses finite,
offsets-init converges toward the target deltas, rendering works."""

import jax
import numpy as np
import pytest

from volsurfs_tpu.datasets.mvdataset import MVDataset
from volsurfs_tpu.methods.offsets_surfs import OffsetsSurfs, get_offsets_gt
from volsurfs_tpu.ops.raycast import make_bounding_sphere
from volsurfs_tpu.params.hyper_params import HyperParamsOffsetsSuRFs
from volsurfs_tpu.training.trainer import Trainer


def test_offsets_gt_layout():
    gt = np.asarray(get_offsets_gt(2, 3, 0.1))
    # inner largest-first then outer decreasing
    np.testing.assert_allclose(gt, [0.3, 0.2, 0.1, -0.1, -0.2], atol=1e-6)


@pytest.mark.slow
def test_offsets_surfs_phases_train(tmp_path):
    hp = HyperParamsOffsetsSuRFs(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=48,
        max_nr_samples_per_ray=12,
        max_nr_imp_samples_per_ray=8,
        do_importance_sampling=True,
        init_phase_end_iter=8,
        color_init_phase_end_iter=16,
        first_phase_end_iter=30,
        training_end_iter=36,
        nr_warmup_iters=4,
        lr=3e-3,
        lr_milestones=[10000],
        nr_inner_surfs=1,
        nr_outer_surfs=1,
        eikonal_weight=0.04,
        support_surfs_eikonal_weight=0.04,
        offsurface_weight=1e-4,
        curvature_weight=0.0,
        geom_feat_size=16,
        sdf_nr_iters_for_c2f=0,
        sdf_encoding_type="gridhash",
        rgb_pos_encoder_type="gridhash",
        nr_samples_bg=8,
    )
    mv = MVDataset(
        "synthetic", "sphere", "",
        config={"width": 24, "height": 24, "nr_train_cameras": 4, "nr_test_cameras": 1},
    )
    bound = make_bounding_sphere(1.0)
    method = OffsetsSurfs(
        hp, bound, bg_color="white", occupancy_res=16, key=jax.random.PRNGKey(0)
    )
    assert method.nr_surfs == 3 and method.main_surf_idx == 1

    trainer = Trainer(method, mv, str(tmp_path), log_every=8)
    state = method.init_state()

    phase_losses = {"offsets_init": [], "data": []}

    def cb(it, state, losses):
        key = "offsets_init" if "offsets" in losses else "data"
        phase_losses[key].append(float(losses["loss"]))

    state = trainer.train(state, callback=cb)
    assert np.isfinite(phase_losses["offsets_init"]).all()
    assert np.isfinite(phase_losses["data"]).all()
    # offsets regression converges
    assert phase_losses["offsets_init"][-1] < phase_losses["offsets_init"][0]

    out = trainer.render_camera(state, mv["test"].cameras[0])
    assert out["rgb"].shape == (24, 24, 3)
    assert np.isfinite(out["rgb"]).all()
    assert out["surfs_alpha"].shape == (24, 24, 3)  # per-surface opacities


def test_load_main_sdf_from_surf():
    """Cross-stage transfer: surf's sdf params load into OffsetsSDF
    (reference offsets_surfs.py:248-261)."""
    import jax.numpy as jnp

    from volsurfs_tpu.methods.surf import Surf
    from volsurfs_tpu.params.hyper_params import HyperParamsSuRF

    bound = make_bounding_sphere(1.0)
    shp = HyperParamsSuRF(
        geom_feat_size=16, sdf_nr_iters_for_c2f=0, sdf_encoding_type="gridhash",
        rgb_pos_encoder_type="gridhash", use_occupancy_grid=False,
    )
    surf = Surf(shp, bound, bg_color="white", key=jax.random.PRNGKey(0))
    surf_state = surf.init_state()

    ohp = HyperParamsOffsetsSuRFs(
        geom_feat_size=16, sdf_nr_iters_for_c2f=0, sdf_encoding_type="gridhash",
        rgb_pos_encoder_type="gridhash", use_occupancy_grid=False,
        nr_inner_surfs=1, nr_outer_surfs=1,
    )
    offs = OffsetsSurfs(ohp, bound, bg_color="white", key=jax.random.PRNGKey(1))
    state = offs.init_state()
    state = offs.load_main_sdf(state, surf_state.params["sdf"])

    pts = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=-0.5, maxval=0.5)
    sdf_surf, _ = surf.sdf_model.apply(surf_state.params["sdf"], pts, None)
    sdfs, _, _ = offs.sdfs_model.apply(state.params["sdfs"], pts, None)
    np.testing.assert_allclose(
        np.asarray(sdf_surf[:, 0]),
        np.asarray(sdfs[:, offs.main_surf_idx, 0]),
        atol=1e-6,
    )
