"""Tests for encodings, MLPs and field models."""

import jax
import jax.numpy as jnp
import numpy as np

from volsurfs_tpu.models import encodings as E
from volsurfs_tpu.models import field_utils as FU
from volsurfs_tpu.models import fields as F
from volsurfs_tpu.models.mlp import MLP, LipshitzMLP


def test_frequency_and_identity_encoders():
    pts = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    enc = E.FrequencyEncoder(multires=6)
    out, _ = enc.apply({}, pts)
    assert out.shape == (1, enc.output_dim) == (1, 3 + 3 * 6 * 2)
    idn = E.IdentityEncoder()
    out2, _ = idn.apply({}, pts)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(pts))


def _check_hash_encoder(enc_cls, **kw):
    enc = enc_cls(nr_levels=8, log2_hashmap_size=12, **kw)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (64, 3), minval=-0.9, maxval=0.9)
    params = enc.init(jax.random.PRNGKey(1), pts)
    out, oob = enc.apply(params, pts)
    assert out.shape == (64, enc.output_dim)
    assert not bool(oob.any())

    # continuity: nearby points give nearby features
    delta = 1e-5
    out2, _ = enc.apply(params, pts + delta)
    assert float(jnp.max(jnp.abs(out2 - out))) < 1e-2

    # out-of-bounds flagged
    _, oob2 = enc.apply(params, pts + 10.0)
    assert bool(oob2.all())

    # gradients flow into the table
    def loss(p):
        o, _ = enc.apply(p, pts)
        return jnp.sum(o**2)

    g = jax.grad(loss)(params)
    table_grad = jax.tree_util.tree_leaves(g)[0]
    assert float(jnp.sum(jnp.abs(table_grad))) > 0.0

    # c2f: early iters silence fine levels
    enc_c2f = enc_cls(nr_levels=8, log2_hashmap_size=12, nr_iters_for_c2f=1000, **kw)
    params2 = enc_c2f.init(jax.random.PRNGKey(1), pts, 0)
    early, _ = enc_c2f.apply(params2, pts, 0)
    late, _ = enc_c2f.apply(params2, pts, 1000)
    # fine-level features (just before the concat of points) are zeroed early
    nf = 8 * 2
    assert float(jnp.abs(early[:, nf - 4 : nf]).max()) < 1e-12
    assert float(jnp.abs(late[:, nf - 4 : nf]).max()) > 0.0


def test_hashgrid_encoder():
    _check_hash_encoder(E.HashGridEncoder)


def test_permuto_encoder():
    _check_hash_encoder(E.PermutoEncoder)


def test_permuto_barycentric_weights_sum_to_one():
    # internal consistency: a constant-table permuto encoding returns the
    # constant (weights sum to 1 over simplex corners)
    enc = E.PermutoEncoder(
        nr_levels=4, log2_hashmap_size=10, concat_points=False, remove_last_element=False
    )
    pts = jax.random.uniform(jax.random.PRNGKey(2), (32, 3), minval=-0.9, maxval=0.9)
    params = enc.init(jax.random.PRNGKey(1), pts)
    const = jax.tree_util.tree_map(lambda t: jnp.ones_like(t) * 0.5, params)
    out, _ = enc.apply(const, pts)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_mlp_shapes_and_gelu():
    mlp = MLP((32, 32, 4), last_layer_linear=True)
    x = jnp.ones((8, 16))
    params = mlp.init(jax.random.PRNGKey(0), x)
    y = mlp.apply(params, x)
    assert y.shape == (8, 4)
    # linear last layer -> outputs can be negative
    assert float(y.min()) < 0.0 or float(y.max()) > 0.0


def test_lipshitz_mlp_bound_and_forward():
    mlp = LipshitzMLP((16, 16, 3), last_layer_linear=True)
    x = jnp.ones((4, 8))
    params = mlp.init(jax.random.PRNGKey(0), x)
    y = mlp.apply(params, x)
    assert y.shape == (4, 3)
    bound = LipshitzMLP.lipshitz_bound_full(params["params"])
    assert float(bound) > 0.0
    # shrinking every c must shrink the network output magnitude
    small = jax.tree_util.tree_map(
        lambda v: v * 0.0 - 5.0 if v.shape == (1,) else v, params
    )
    y2 = mlp.apply(small, x)
    assert float(jnp.abs(y2).max()) < float(jnp.abs(y).max()) + 1e-3


def test_sdf_field_and_gradients():
    sdf = F.SDF(mlp_layers_dims=(32, 32), encoding_type="gridhash", geom_feat_size=8)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (32, 3), minval=-0.5, maxval=0.5)
    params = sdf.init(jax.random.PRNGKey(1), pts)
    val, feat = sdf.apply(params, pts)
    assert val.shape == (32, 1) and feat.shape == (32, 8)

    grads = FU.get_field_gradients(lambda p: sdf.apply(params, p), pts)
    assert grads.shape == (32, 3)

    # FD operator against an analytic field (hash encodings are piecewise
    # linear, so FD/AD only agree for smooth fields)
    def analytic(p):
        return jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.3

    g_fd = FU.get_field_gradients(analytic, pts)
    g_ad = FU.get_field_gradients_autodiff(analytic, pts)
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_ad), atol=5e-3)


def test_encoder_analytic_spatial_grads_match_fd():
    """with_grads jacobian == finite differences of the encoder output, for
    both hash encoders (piecewise linear: use a small interior step)."""
    pts = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-0.6, maxval=0.6)
    for enc in (
        E.HashGridEncoder(nr_levels=6, finest_res=64.0, log2_hashmap_size=10),
        E.PermutoEncoder(nr_levels=6, finest_scale=0.02, log2_hashmap_size=10),
        E.FrequencyEncoder(),
        E.IdentityEncoder(),
    ):
        params = enc.init(jax.random.PRNGKey(4), pts)
        feats0, dfeats, _ = enc.apply(params, pts, None, True)
        f_plain = enc.apply(params, pts)[0]
        np.testing.assert_allclose(
            np.asarray(feats0), np.asarray(f_plain), atol=1e-6
        )
        eps = 1e-4
        for k in range(3):
            off = np.zeros(3, np.float32)
            off[k] = eps
            f1, *_ = enc.apply(params, pts + off, None, False)
            fd = (np.asarray(f1) - np.asarray(feats0)) / eps
            # a few points straddle cell boundaries where the jacobian jumps;
            # compare the bulk
            err = np.abs(fd - np.asarray(dfeats[k]))
            scale = np.abs(fd).max() + 1e-3
            assert np.quantile(err / scale, 0.9) < 2e-2, type(enc).__name__


def test_mlp_tangent_propagation_matches_jvp():
    mlp = MLP((16, 16, 4), last_layer_linear=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    t = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 8))  # K-leading
    params = mlp.init(jax.random.PRNGKey(2), x)
    y, dy = mlp.apply(params, x, t)
    y_plain = mlp.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain), atol=1e-5)
    for k in range(3):
        _, jvp_k = jax.jvp(lambda xx: mlp.apply(params, xx), (x,), (t[k],))
        np.testing.assert_allclose(
            np.asarray(dy[k]), np.asarray(jvp_k), rtol=1e-4, atol=1e-5
        )


def test_sdf_with_grads_table_gradient_correct():
    """Training gradient (w.r.t. the hash table) of a loss that uses the
    analytic sdf_grad must match numerical differentiation of the loss.
    Runs in float64: the check needs FD resolution far below the fine-level
    gradient magnitudes (verified exact to ~1e-5 relative in f64).

    The accumulation mode matters: "mxu" (split-bf16 two-pass) is f32-exact
    to ~4e-6 relative and is checked tightly; the shipped default "mxu_bf16"
    (single-pass) carries ~2e-3 per-update rounding by design — below
    minibatch gradient noise — so it only gets a bounded-error check."""
    import contextlib

    from volsurfs_tpu.models import encodings as E

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    prev_mode = E._TABLE_GRAD_MODE
    try:
        with enable_x64():
            E.set_table_grad_mode("mxu")
            _check_table_gradient("gridhash", "HashGridEncoder_0")
            _check_table_gradient("permutohash", "PermutoEncoder_0")
            E.set_table_grad_mode("mxu_bf16")
            _check_table_gradient("gridhash", "HashGridEncoder_0", rtol=8e-3)
    finally:
        E.set_table_grad_mode(prev_mode)


def _check_table_gradient(encoding_type, enc_name, rtol=1e-3):
        import flax

        sdf = F.SDF(mlp_layers_dims=(16,), encoding_type=encoding_type, geom_feat_size=4)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5)
        params = sdf.init(jax.random.PRNGKey(1), pts)

        v, f, g = sdf.apply(params, pts, None, True)
        assert v.shape == (16, 1) and g.shape == (16, 3)
        v2, _ = sdf.apply(params, pts)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)

        def loss_fn(p):
            v, _, g = sdf.apply(p, pts, None, True)
            return jnp.sum(v**2) + jnp.sum(
                (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
            )

        grad = jax.grad(loss_fn)(params)
        table = params["params"][enc_name]["table"]
        gtable = np.asarray(grad["params"][enc_name]["table"])
        # numerical check on the 8 largest-gradient entries
        flat = np.abs(gtable).reshape(-1)
        order = np.argsort(-flat)[:8]
        eps = 1e-6

        def loss_at(idx, delta):
            t2 = np.asarray(table).copy()
            t2[idx] += delta
            p2 = flax.core.unfreeze(params)
            p2["params"][enc_name]["table"] = jnp.asarray(t2)
            return float(loss_fn(p2))

        for o in order:
            idx = np.unravel_index(o, gtable.shape)
            fd = (loss_at(idx, eps) - loss_at(idx, -eps)) / (2 * eps)
            assert abs(fd - gtable[idx]) < rtol * max(1.0, abs(gtable[idx])), (
                idx, fd, gtable[idx]
            )


def test_offsets_sdf_ordering():
    model = F.OffsetsSDF(
        mlp_layers_dims=(32, 32),
        encoding_type="gridhash",
        nr_inner_surfs=2,
        nr_outer_surfs=2,
        geom_feat_size=8,
    )
    pts = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5)
    params = model.init(jax.random.PRNGKey(1), pts)
    sdfs, offsets, feats = model.apply(params, pts)
    assert sdfs.shape == (16, 5, 1)
    s = np.asarray(sdfs)[..., 0]
    # inner sdfs (idx < main) are strictly larger than main; outer strictly smaller
    main = s[:, 2]
    assert np.all(s[:, 0] > s[:, 1]) and np.all(s[:, 1] > main)
    assert np.all(main > s[:, 3]) and np.all(s[:, 3] > s[:, 4])

    # freezing main surf stops gradients into mlp_sdf
    def loss(p):
        sdfs, _, _ = model.apply(p, pts, None, False, True)
        return jnp.sum(sdfs**2)

    g = jax.grad(loss)(params)
    g_main = g["params"]["mlp_sdf"]
    assert all(
        float(jnp.abs(leaf).sum()) == 0.0 for leaf in jax.tree_util.tree_leaves(g_main)
    )


def test_rgb_and_colorsh_fields():
    pts = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    normals = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (16, 1))
    feat = jnp.ones((16, 8))

    rgb = F.RGB(
        mlp_layers_dims=(32, 32),
        pos_encoder_type="gridhash",
        in_geom_feat_size=8,
    )
    params = rgb.init(jax.random.PRNGKey(1), pts, dirs, normals, feat)
    out = rgb.apply(params, pts, dirs, normals, feat)
    assert out.shape == (16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    csh = F.ColorSH(
        mlp_layers_dims=(32, 32), pos_encoder_type="gridhash", in_geom_feat_size=8
    )
    params2 = csh.init(jax.random.PRNGKey(1), pts, dirs, normals, feat)
    out2 = csh.apply(params2, pts, dirs, normals, feat)
    assert out2.shape == (16, 3)
    coeffs = csh.apply(params2, pts, None, normals, feat)
    assert coeffs.shape == (16, 3 * 16)  # raw coeffs for baking (deg 3)


def test_nerfhash_bg_field():
    bg = F.NerfHash(pos_encoder_type="gridhash")
    pts = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    params = bg.init(jax.random.PRNGKey(1), pts, dirs)
    rgb, density = bg.apply(params, pts, dirs)
    assert rgb.shape == (16, 3) and density.shape == (16, 1)
    assert float(density.min()) >= 0.0


def test_offsets_sdf_with_grads_matches_autodiff():
    """Analytic per-surface gradients (with_grads=True) == reverse-mode
    autodiff of each surface's sdf, including the softplus/cumsum offset
    chain."""
    model = F.OffsetsSDF(
        mlp_layers_dims=(16, 16),
        encoding_type="gridhash",
        nr_inner_surfs=2,
        nr_outer_surfs=1,
        geom_feat_size=8,
    )
    pts = jax.random.uniform(jax.random.PRNGKey(0), (32, 3), minval=-0.5, maxval=0.5)
    params = model.init(jax.random.PRNGKey(1), pts)

    sdfs, offsets, geom, grads = model.apply(params, pts, with_grads=True)
    sdfs_plain, offsets_plain, geom_plain = model.apply(params, pts)
    np.testing.assert_allclose(np.asarray(sdfs), np.asarray(sdfs_plain), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(offsets), np.asarray(offsets_plain), atol=1e-6
    )
    assert grads.shape == (32, model.nr_inner_surfs + model.nr_outer_surfs + 1, 3)

    for s in range(sdfs.shape[-2]):
        g_rev = jax.grad(
            lambda p: jnp.sum(model.apply(params, p)[0][..., s, 0])
        )(pts)
        np.testing.assert_allclose(
            np.asarray(grads[:, s, :]), np.asarray(g_rev), rtol=1e-4, atol=1e-6
        )


def test_bf16_appearance_matches_f32():
    """mlp_dtype="bfloat16" (the TPU-native hp.use_grad_scaler reading,
    reference base_method.py:80-83) computes in bf16 but returns f32 outputs
    close to the f32 model with the SAME params; grads stay finite."""
    model32 = F.RGB(
        mlp_layers_dims=(32, 32),
        pos_encoder_type="gridhash",
        normal_dep=False,
        geom_feat_dep=False,
        in_geom_feat_size=0,
    )
    model16 = F.RGB(
        mlp_layers_dims=(32, 32),
        pos_encoder_type="gridhash",
        normal_dep=False,
        geom_feat_dep=False,
        in_geom_feat_size=0,
        mlp_dtype="bfloat16",
    )
    k = jax.random.PRNGKey(0)
    pts = jax.random.uniform(k, (64, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = model32.init(jax.random.PRNGKey(2), pts, dirs)

    out32 = model32.apply(params, pts, dirs)
    out16 = model16.apply(params, pts, dirs)
    assert out16.dtype == jnp.float32
    # sigmoid outputs: bf16 matmuls keep ~2 decimal digits
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=0.03)

    g = jax.grad(lambda p: jnp.sum(model16.apply(p, pts, dirs)))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
        assert leaf.dtype == jnp.float32


def test_table_grad_scatter_modes_agree():
    """The "sorted" unique-scatter and the dense one-hot-matmul table-gradient
    formulations equal the "flat" scatter (and autodiff) for both _hash_lookup
    and _hash_lookup_grad backward passes."""
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    N, L, C, F, T = 37, 4, 8, 2, 64
    table = jax.random.normal(k1, (L * T, F))
    # per-level indices within each level's own row range (the encoders'
    # invariant the dense/fine split relies on)
    local = jax.random.randint(k2, (N, L, C), 0, T, jnp.int32)
    idx = local + (jnp.arange(L, dtype=jnp.int32) * T)[None, :, None]
    bary = jax.random.uniform(k3, (N, L, C))
    dbary = jax.random.normal(k4, (N, L, C, 3))
    cot = jax.random.normal(k5, (N, L, F))

    def make_losses(layout):
        def loss(t):
            return jnp.sum(E._hash_lookup(layout, t, idx, bary) * cot)

        def loss_grad(t):
            f, df = E._hash_lookup_grad(layout, t, idx, bary, dbary)
            return jnp.sum(f * cot) + jnp.sum(df * cot[..., None])

        return loss, loss_grad

    # all-scatter, 2 dense levels + 2 fine, all-dense
    grads = {}
    for layout in ((0, 0), (2, 2 * T), (L, L * T)):
        for mode in ("flat", "sorted", "cplx"):
            E.set_table_grad_mode(mode)
            loss, loss_grad = make_losses(layout)
            grads[(layout, mode)] = (
                jax.grad(loss)(table), jax.grad(loss_grad)(table)
            )
    E.set_table_grad_mode("flat")

    base = grads[((0, 0), "flat")]
    for key, pair in grads.items():
        for a, b in zip(base, pair):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=str(key)
            )

    # against plain autodiff of the unfused formulation
    def loss_ref(t):
        g = t[idx]
        return jnp.sum(jnp.sum(bary[..., None] * g, axis=2) * cot)

    np.testing.assert_allclose(
        np.asarray(base[0]), np.asarray(jax.grad(loss_ref)(table)),
        atol=1e-4,
    )
