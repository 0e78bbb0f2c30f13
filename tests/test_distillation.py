"""Teacher-student distillation batch mixing (reference trainer.py:150-175)."""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_surf_method(key):
    from volsurfs_tpu.methods.surf import Surf
    from volsurfs_tpu.ops.raycast import make_bounding_sphere
    from volsurfs_tpu.params.hyper_params import HyperParamsSuRF

    hp = HyperParamsSuRF(
        is_nr_training_rays_dynamic=False,
        training_rays_batch_size=16,
        max_nr_samples_per_ray=8,
        max_nr_imp_samples_per_ray=4,
        do_importance_sampling=False,
        init_phase_end_iter=0,
        first_phase_end_iter=10,
        training_end_iter=10,
        nr_warmup_iters=2,
        lr_milestones=[100],
        geom_feat_size=8,
        sdf_nr_iters_for_c2f=0,
        nr_samples_bg=4,
    )
    return Surf(
        hp,
        make_bounding_sphere(1.0),
        bg_color="white",
        init_sphere_radius=0.4,
        occupancy_res=8,
        key=key,
    )


def test_distiller_mixes_batch():
    from volsurfs_tpu.training.distillation import Distiller

    method = _tiny_surf_method(jax.random.PRNGKey(0))
    state = method.init_state()
    distiller = Distiller(method, state)

    n = 16
    batch = {
        "rays_o": jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (n, 1)),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "gt_rgb": jnp.full((n, 3), 0.123),
        "gt_mask": jnp.zeros((n, 1)),
    }
    mixed = distiller.mix_batch(batch, jax.random.PRNGKey(1), fraction=0.5)

    # second half untouched
    np.testing.assert_allclose(np.asarray(mixed["gt_rgb"][8:]), 0.123)
    # first half replaced by the (finite) teacher render with full mask
    teacher_part = np.asarray(mixed["gt_rgb"][:8])
    assert np.isfinite(teacher_part).all()
    assert not np.allclose(teacher_part, 0.123)
    np.testing.assert_allclose(np.asarray(mixed["gt_mask"][:8]), 1.0)

    # fraction=0 is the identity
    same = distiller.mix_batch(batch, jax.random.PRNGKey(2), fraction=0.0)
    np.testing.assert_allclose(np.asarray(same["gt_rgb"]), np.asarray(batch["gt_rgb"]))


def test_distiller_hemisphere_rays():
    """With a hemisphere radius, teacher rays come from fresh cameras."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from volsurfs_tpu.training.distillation import Distiller

    method = _tiny_surf_method(jax.random.PRNGKey(0))
    state = method.init_state()
    distiller = Distiller(method, state, hemisphere_radius=2.0,
                          image_size=(16, 16))
    n = 16
    batch = {
        "rays_o": jnp.zeros((n, 3)),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "gt_rgb": jnp.full((n, 3), 0.5),
        "gt_mask": jnp.zeros((n, 1)),
    }
    mixed = distiller.mix_batch(batch, jax.random.PRNGKey(1), fraction=0.5)
    # teacher rays replaced: origins now on the radius-2 hemisphere
    norms = np.linalg.norm(np.asarray(mixed["rays_o"][:8]), axis=-1)
    np.testing.assert_allclose(norms, 2.0, atol=1e-4)
    assert np.isfinite(np.asarray(mixed["gt_rgb"])).all()
