"""Config files + small utility parity tests (dilation, debug guards, SG)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


# ---- config files ----------------------------------------------------------


def test_all_shipped_configs_parse():
    from volsurfs_tpu.params.hyper_params import get_method_hyper_params

    cfg_root = os.path.join(REPO, "config")
    count = 0
    for method in ("surf", "nerf", "offsets_surfs", "volsurfs"):
        mdir = os.path.join(cfg_root, method)
        for fname in sorted(os.listdir(mdir)):
            hp = get_method_hyper_params(method, os.path.join(mdir, fname))
            assert hp.training_end_iter > 0
            count += 1
    assert count == 13  # 2 surf + 1 nerf + 5 offsets + 5 volsurfs


def test_config_values_match_reference_workload():
    """Spot-check headline values documented in BASELINE.md."""
    from volsurfs_tpu.params.hyper_params import get_method_hyper_params

    surf = get_method_hyper_params("surf", os.path.join(REPO, "config/surf/base.cfg"))
    assert surf.training_end_iter == 100000
    assert surf.max_nr_samples_per_ray == 64
    assert surf.max_nr_imp_samples_per_ray == 32
    assert surf.training_rays_batch_size == 512
    assert surf.eikonal_weight == pytest.approx(0.04)

    offs5 = get_method_hyper_params(
        "offsets_surfs", os.path.join(REPO, "config/offsets_surfs/base_5.cfg")
    )
    assert offs5.nr_inner_surfs == 4 and offs5.nr_outer_surfs == 0

    vs5 = get_method_hyper_params(
        "volsurfs", os.path.join(REPO, "config/volsurfs/base_5.cfg")
    )
    assert vs5.textures_res == [2048, 1024, 512, 256]
    assert vs5.using_neural_textures and vs5.using_sh_quantization


def test_train_and_data_params():
    from volsurfs_tpu.params.params import DataParams, PathsParams, TrainParams

    tp = TrainParams("surf", os.path.join(REPO, "config/train_config.cfg"))
    assert tp.compute_test_loss_freq == 1000 and tp.render_freq == 10000
    dp = DataParams("shelly", "khady", os.path.join(REPO, "config/data_config.cfg"))
    assert dp.bg_color == "white" and dp.init_sphere_scale == pytest.approx(0.15)
    pp = PathsParams(os.path.join(REPO, "config/paths_config.cfg"))
    assert pp.runs_path


# ---- texture dilation ------------------------------------------------------


def test_dilate_texture_fills_empty_texels():
    from volsurfs_tpu.baking.texture_utils import dilate_texture

    img = np.zeros((8, 8, 3), np.float32)
    img[4, 4] = [1.0, 0.5, 0.25]
    out, occ = dilate_texture(img, nr_iterations=10)
    assert occ.all()
    # propagated color is preserved exactly (single source)
    np.testing.assert_allclose(out[0, 0], [1.0, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(out[4, 4], img[4, 4])


def test_dilate_texture_respects_iteration_budget():
    from volsurfs_tpu.baking.texture_utils import dilate_texture

    img = np.zeros((16, 16, 1), np.float32)
    img[0, 0] = 1.0
    _, occ = dilate_texture(img, nr_iterations=2)
    assert occ[2, 2] and not occ[8, 8]


def test_sample_surface_texels_roundtrip():
    """Texels inside UV islands map back onto the triangle's 3D plane."""
    from volsurfs_tpu.baking.texture_utils import sample_surface_texels

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    pos, nrm, occ = sample_surface_texels(verts, faces, uvs, res=16)
    assert occ.mean() > 0.9  # full square covered
    assert np.allclose(pos[occ][:, 2], 0.0, atol=1e-5)
    assert np.allclose(np.abs(nrm[occ][:, 2]), 1.0, atol=1e-4)


# ---- debug guards ----------------------------------------------------------


def test_sanity_check_and_finite_guard():
    from volsurfs_tpu.utils.debug import (
        count_nonfinite,
        finite_or_zero,
        sanity_check,
        tree_sanity_check,
    )

    sanity_check(x=np.ones(3))
    with pytest.raises(AssertionError, match="has nan"):
        sanity_check(bad=np.array([1.0, np.nan]))
    with pytest.raises(AssertionError, match="has inf"):
        sanity_check(bad=np.array([np.inf]))

    x = jnp.asarray([1.0, jnp.nan, jnp.inf, -2.0])
    np.testing.assert_allclose(finite_or_zero(x), [1.0, 0.0, 0.0, -2.0])
    tree = {"a": jnp.ones(2), "b": {"c": jnp.asarray([jnp.nan])}}
    assert int(count_nonfinite(tree)) == 1
    with pytest.raises(AssertionError):
        tree_sanity_check(tree)


# ---- spherical gaussians ---------------------------------------------------


def test_eval_sg_matches_formula():
    from volsurfs_tpu.models.encodings import eval_sg

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lam = jax.random.uniform(k1, (4, 5), minval=1.0, maxval=10.0)
    mu = jax.random.normal(k2, (4, 5, 3))
    mu = mu / jnp.linalg.norm(mu, axis=-1, keepdims=True)
    coeffs = jax.random.normal(k3, (4, 5, 3))
    dirs = jax.random.normal(k4, (4, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    out = eval_sg(lam, mu, coeffs, dirs)
    ref = np.zeros((4, 3))
    for b in range(4):
        for lobe in range(5):
            basis = np.exp(float(lam[b, lobe]) * (float(mu[b, lobe] @ dirs[b]) - 1.0))
            ref[b] += np.asarray(coeffs[b, lobe]) * basis
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_sg_encoder_peak_at_lobe_axis():
    from volsurfs_tpu.models.encodings import SphericalGaussianEncoder

    enc = SphericalGaussianEncoder(nr_lobes=8)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = enc.apply({}, dirs)
    assert out.shape == (2, 8)
    assert float(out.max()) <= 1.0 + 1e-6 and float(out.min()) >= 0.0


def test_lpips_rf_perceptual_metric():
    """lpips_rf: 0 on identical images, monotonic in distortion,
    deterministic across calls."""
    import numpy as np

    from volsurfs_tpu.utils.evaluation import lpips_rf

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3))
    assert lpips_rf(img, img) == 0.0
    small = np.clip(img + rng.normal(scale=0.02, size=img.shape), 0, 1)
    big = np.clip(img + rng.normal(scale=0.2, size=img.shape), 0, 1)
    d_small, d_big = lpips_rf(img, small), lpips_rf(img, big)
    assert 0 < d_small < d_big
    assert lpips_rf(img, small) == d_small  # deterministic


def test_postprocess_renders_and_plots():
    """Postprocessing parity (reference postprocessing.py:41-244,
    plotting_2d.py:46-140): key-based colorization, per-surface stacking,
    and the SDF section plots render to finite rgb arrays."""
    import numpy as np

    from volsurfs_tpu.datasets.cameras import Camera
    from volsurfs_tpu.utils import postprocessing as PP

    h = w = 8
    cam = Camera(np.eye(3, dtype=np.float32), np.eye(4, dtype=np.float32), w, h)
    n = h * w
    renders = {
        "volumetric": {
            "rgb": np.random.rand(n, 3).astype(np.float32),
            "depth": np.linspace(0, 2, n, dtype=np.float32)[:, None],
            "normals": np.random.uniform(-1, 1, (n, 3)).astype(np.float32),
            "weights_sum": np.random.rand(n, 1).astype(np.float32),
            "uv": np.random.rand(n, 2, 2).astype(np.float32),  # 2 surfaces
            "nr_samples": np.random.randint(0, 16, (n, 1)).astype(np.float32),
        }
    }
    out = PP.postprocess_renders(renders, cam, max_nr_samples_per_ray=16)
    vol = out["volumetric"]
    assert vol["rgb"].shape == (h, w, 3)
    assert vol["uv"].shape == (h, 2 * w, 3)  # surfaces stacked on the row
    for key, img in vol.items():
        assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # normals remap
    np.testing.assert_allclose(
        vol["normals"],
        (renders["volumetric"]["normals"].reshape(h, w, 3) + 1) / 2,
        atol=1e-6,
    )
    # depth uses jet: min -> blue, max -> red
    d = vol["depth"].reshape(-1, 3)
    assert d[0, 2] >= 0.5 and d[-1, 0] >= 0.5 and d[0, 0] < 0.1 and d[-1, 2] < 0.1

    # plots
    xs = np.linspace(-1, 1, 16)
    X, Y = np.meshgrid(xs, xs)
    sdf = (np.sqrt(X**2 + Y**2) - 0.5).ravel()
    for img in (
        PP.plot_2d_sdf(sdf, 16, 16),
        PP.plot_2d_sdfs([sdf, sdf + 0.1], 16, 16),
        PP.plot_2d_sdfs_together([sdf, sdf + 0.1], 16, 16),
        PP.plot_2d_density(np.exp(-sdf * 4), 16, 16),
        PP.plot_2d_occupancy(sdf < 0, 16, 16),
    ):
        assert img.ndim == 3 and img.shape[-1] == 3 and np.isfinite(img).all()


def test_view_3d_sdf_renders_level_set():
    """Headless view_3d_sdf (reference plotting_3d.py open3d window):
    sphere SDF -> shaded image with the silhouette darker than the white
    background."""
    import numpy as np

    from volsurfs_tpu.utils.postprocessing import view_3d_sdf, view_3d_sdfs

    def sdf(p):
        return np.linalg.norm(p, axis=-1) - 0.5

    img = view_3d_sdf(sdf, nr_points_per_dim=24, width=48, height=48)
    assert img.shape == (48, 48, 3) and np.isfinite(img).all()
    center = img[20:28, 20:28]
    assert center.mean() < 0.98  # object visible
    assert img[0, 0].min() > 0.99  # corner is background

    def sdfs(p):
        d = np.linalg.norm(p, axis=-1)
        return np.stack([d - 0.5, d - 0.3], -1)

    row = view_3d_sdfs(sdfs, 2, nr_points_per_dim=16, width=32, height=32)
    assert row.shape == (32, 64, 3)


def test_hard_scene_gt_renderer():
    """The 'hard' procedural evidence scene (VERDICT r4 item 7): exact CSG
    ray-marched GT with thin fins, a torus ring, a crater concavity and
    view-dependent shading. Checks the analytic renderer produces plausible
    geometry and that the high-frequency / view-dependence stressors are
    actually present in the images (otherwise the scene cannot do its job
    of exposing per-stage pipeline quality loss)."""
    import numpy as np

    from volsurfs_tpu.datasets.synthetic import (
        _hard_sdf, make_synthetic_split, render_hard_scene,
    )

    # SDF sanity: center is inside the body, far point outside, a point on
    # the torus ring's center circle is ~0.020 inside the tube
    s = _hard_sdf(np.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.46, 0.0, 0.0]]))
    assert s[0] < 0 and s[1] > 0.5
    assert abs(s[2] + 0.020) < 1e-6

    cams, rgbs, masks = make_synthetic_split(3, 72, 72, seed=3, scene="hard")
    assert rgbs.shape == (3, 72, 72, 3) and masks.shape == (3, 72, 72, 1)
    fg = masks.mean()
    assert 0.05 < fg < 0.5, f"implausible fg fraction {fg}"

    # high-frequency albedo: neighboring fg texels must differ strongly
    m = masks[0, :, :-1, 0] * masks[0, :, 1:, 0]
    dx = np.abs(rgbs[0, :, 1:] - rgbs[0, :, :-1]).max(-1) * m
    assert (dx > 0.25).sum() > 40, "albedo lacks high-frequency detail"

    # view dependence: re-render view 0 with flipped ray directions is not
    # testable cheaply, but distinct cameras must not produce near-identical
    # fg statistics (specular lobe + albedo variation across the surface)
    means = [rgbs[i][masks[i, :, :, 0] > 0].mean() for i in range(3)]
    assert np.ptp(means) > 0.01

    # mask edges are consistent with rgb: white bg exactly where mask==0
    bg = rgbs[1][masks[1, :, :, 0] == 0]
    assert np.allclose(bg, 1.0)
