"""Neural fields: SDF, OffsetsSDF, Density, RGB, ColorSH, NerfHash.

Flax re-designs of the reference field models (volsurfs_py/models/). Same
input composition, activations and output splits; freezing of sub-networks is
expressed with apply-time ``stop_gradient`` flags instead of torch
requires_grad toggles (jit-friendly: the flag is a static argument).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from volsurfs_tpu.models.encodings import get_encoder
from volsurfs_tpu.models.mlp import MLP, LipshitzMLP
from volsurfs_tpu.ops.sh import num_sh_coeffs, sh_basis, sh_eval
from volsurfs_tpu.utils.math import small_cumsum as _small_cumsum
from volsurfs_tpu.utils.math import take_rev


class SDF(nn.Module):
    """pos-encoder + MLP -> (sdf, geom_feat) (reference models/sdf.py:11-101)."""

    mlp_layers_dims: Sequence[int] = (32, 32, 32)
    encoding_type: str = "permutohash"
    geom_feat_size: int = 32
    nr_iters_for_c2f: int = 0
    bb_sides: float = 2.0

    @nn.compact
    def __call__(self, points, iter_nr=None, with_grads=False):
        """-> (sdf, geom_feats), or with with_grads=True
        (sdf, geom_feats, sdf_grad [..., 3]) where the spatial gradient is
        computed analytically: the hash encoder returns its jacobian from
        the same gathered corners and the MLP propagates it as tangents —
        one encoder backward scatter instead of the reference's 4-point
        finite difference (volsurfs_py/utils/fields_utils.py:6-80)."""
        enc = get_encoder(
            self.encoding_type,
            input_dim=3,
            nr_levels=24,
            nr_iters_for_c2f=self.nr_iters_for_c2f,
            multires=6,
            bb_sides=self.bb_sides,
        )
        mlp = MLP(
            tuple(self.mlp_layers_dims) + (1 + self.geom_feat_size,),
            last_layer_linear=True,
        )
        if not with_grads:
            feats, _ = enc(points, iter_nr)
            pred = mlp(feats)
            sdf = pred[..., 0:1]
            geom_feats = pred[..., 1:] if self.geom_feat_size > 0 else None
            return sdf, geom_feats
        feats, dfeats, _ = enc(points, iter_nr, with_grads=True)
        pred, dpred = mlp(feats, tangents=dfeats)  # dpred [3, ..., out]
        sdf = pred[..., 0:1]
        geom_feats = pred[..., 1:] if self.geom_feat_size > 0 else None
        sdf_grad = jnp.moveaxis(dpred[..., 0], 0, -1)  # [..., 3]
        return sdf, geom_feats, sdf_grad



class OffsetsSDF(nn.Module):
    """Main SDF + k offset level-set heads (reference models/offsets_sdf.py:12-261).

    forward -> (sdfs [..., nr_surfs, 1], offsets [..., nr_surfs, 1], geom_feats).
    Surfaces are ordered inner...main...outer; each eps head is a small MLP on
    the geometry features, softplus-positive for inner / negative for outer,
    cumulatively summed so offsets stay ordered, with a min_offset margin.

    stop-gradient flags replace the reference's freeze/unfreeze phases
    (offsets_sdf.py:174-216).
    """

    mlp_layers_dims: Sequence[int] = (32, 32, 32)
    encoding_type: str = "permutohash"
    nr_inner_surfs: int = 1
    nr_outer_surfs: int = 1
    geom_feat_size: int = 32
    min_offset: float = 1e-4
    nr_iters_for_c2f: int = 0
    bb_sides: float = 2.0
    use_per_offset_mlp: bool = True

    @property
    def nr_surfs(self) -> int:
        return self.nr_inner_surfs + self.nr_outer_surfs + 1

    @property
    def main_surf_idx(self) -> int:
        return self.nr_inner_surfs

    def setup(self):
        self.pos_encoder = get_encoder(
            self.encoding_type,
            input_dim=3,
            nr_levels=24,
            nr_iters_for_c2f=self.nr_iters_for_c2f,
            multires=6,
            bb_sides=self.bb_sides,
        )
        self.mlp_sdf = MLP(
            tuple(self.mlp_layers_dims) + (1 + self.geom_feat_size,),
            last_layer_linear=True,
        )
        if self.nr_surfs > 1:
            if self.use_per_offset_mlp:
                self.mlps_eps = [
                    MLP((32, 1), last_layer_linear=True, name=f"mlp_eps_{i}")
                    for i in range(self.nr_surfs - 1)
                ]
            else:
                self.mlp_eps = MLP(
                    (32, 32, self.nr_surfs - 1), last_layer_linear=True
                )

    def main_sdf(self, points, iter_nr=None, train_main_surf: bool = True):
        feats, _ = self.pos_encoder(points, iter_nr)
        pred = self.mlp_sdf(feats)
        if not train_main_surf:
            pred = jax.lax.stop_gradient(pred)
        sdf = pred[..., 0:1]
        geom_feats = pred[..., 1:] if self.geom_feat_size > 0 else None
        return sdf, geom_feats

    def main_sdf_grad(self, points, iter_nr=None, train_main_surf: bool = True):
        """Analytic spatial gradient of the MAIN surface only [..., 3] —
        skips the eps-head tangent chain that the full with_grads path runs
        (used by the curvature loss, which needs just the main normal)."""
        feats, dfeats, _ = self.pos_encoder(points, iter_nr, with_grads=True)
        pred, dpred = self.mlp_sdf(feats, tangents=dfeats)
        if not train_main_surf:
            dpred = jax.lax.stop_gradient(dpred)
        return jnp.moveaxis(dpred[..., 0], 0, -1)  # [..., 3]

    def get_offsets(self, geom_feats, train_offsets: bool = True):
        """(cum_inner_eps, cum_outer_eps, inner_eps, outer_eps)
        (reference offsets_sdf.py:140-172)."""
        if self.use_per_offset_mlp:
            eps = jnp.concatenate(
                [m(geom_feats) for m in self.mlps_eps], axis=-1
            )
        else:
            eps = self.mlp_eps(geom_feats)
        if not train_offsets:
            eps = jax.lax.stop_gradient(eps)
        inner_eps = jax.nn.softplus(eps[..., self.nr_outer_surfs :])
        outer_eps = -jax.nn.softplus(eps[..., : self.nr_outer_surfs])
        cum_outer_eps = _small_cumsum(outer_eps, -1) - self.min_offset
        cum_inner_eps = _small_cumsum(inner_eps, -1) + self.min_offset
        cum_inner_eps = take_rev(cum_inner_eps, axis=-1)
        return cum_inner_eps, cum_outer_eps, inner_eps, outer_eps

    def __call__(
        self,
        points,
        iter_nr=None,
        train_main_surf: bool = True,
        train_offsets: bool = True,
        with_grads: bool = False,
    ):
        """-> (sdfs [..., S, 1], offsets [..., S, 1], geom_feats), plus
        sdfs_grad [..., S, 3] when with_grads=True: analytic per-surface
        spatial gradients via the encoder jacobian + MLP tangent chain (one
        table scatter in the backward instead of the reference's 4-point
        finite difference over the whole multi-head forward)."""
        if not with_grads:
            sdf, geom_feats = self.main_sdf(points, iter_nr, train_main_surf)
            if self.nr_surfs == 1:
                return sdf[..., None, :], None, geom_feats
            cum_inner, cum_outer, inner_eps, outer_eps = self.get_offsets(
                geom_feats, train_offsets
            )
            inner_sdfs = sdf + cum_inner
            outer_sdfs = sdf + cum_outer
            sdfs = jnp.concatenate([inner_sdfs, sdf, outer_sdfs], axis=-1)[..., None]
            offsets = jnp.concatenate(
                [inner_eps, jnp.zeros_like(sdf), outer_eps], axis=-1
            )[..., None]
            return sdfs, offsets, geom_feats

        feats, dfeats, _ = self.pos_encoder(points, iter_nr, with_grads=True)
        pred, dpred = self.mlp_sdf(feats, tangents=dfeats)  # dpred [3, ..., out]
        if not train_main_surf:
            pred = jax.lax.stop_gradient(pred)
            dpred = jax.lax.stop_gradient(dpred)
        sdf = pred[..., 0:1]
        geom_feats = pred[..., 1:] if self.geom_feat_size > 0 else None
        dgeom = dpred[..., 1:] if self.geom_feat_size > 0 else None
        if self.nr_surfs == 1:
            sdf_grad = jnp.moveaxis(dpred[..., 0], 0, -1)  # [..., 3]
            return sdf[..., None, :], None, geom_feats, sdf_grad[..., None, :]

        # eps heads with tangents (chain rule through geom_feats); the K=3
        # spatial axis stays LEADING through the whole chain (encoder/MLP
        # tangent convention) and only the final [..., S, 3] moves it back
        if self.use_per_offset_mlp:
            pairs = [m(geom_feats, tangents=dgeom) for m in self.mlps_eps]
            eps = jnp.concatenate([p[0] for p in pairs], axis=-1)
            deps = jnp.concatenate([p[1] for p in pairs], axis=-1)  # [3, ..., S-1]
        else:
            eps, deps = self.mlp_eps(geom_feats, tangents=dgeom)
        if not train_offsets:
            eps = jax.lax.stop_gradient(eps)
            deps = jax.lax.stop_gradient(deps)

        # softplus / cumsum chain with tangents (mirrors get_offsets)
        sig = jax.nn.sigmoid(eps)  # softplus'
        inner_eps = jax.nn.softplus(eps[..., self.nr_outer_surfs :])
        outer_eps = -jax.nn.softplus(eps[..., : self.nr_outer_surfs])
        dinner = sig[None, ..., self.nr_outer_surfs :] * deps[
            ..., self.nr_outer_surfs :
        ]
        douter = -sig[None, ..., : self.nr_outer_surfs] * deps[
            ..., : self.nr_outer_surfs
        ]
        cum_outer = _small_cumsum(outer_eps, -1) - self.min_offset
        cum_inner = take_rev(
            _small_cumsum(inner_eps, -1) + self.min_offset, axis=-1
        )
        dcum_outer = _small_cumsum(douter, -1)
        dcum_inner = take_rev(_small_cumsum(dinner, -1), axis=-1)

        sdfs = jnp.concatenate(
            [sdf + cum_inner, sdf, sdf + cum_outer], axis=-1
        )[..., None]
        offsets = jnp.concatenate(
            [inner_eps, jnp.zeros_like(sdf), outer_eps], axis=-1
        )[..., None]
        g = dpred[..., 0:1]  # [3, ..., 1]
        sdfs_grad = jnp.moveaxis(
            jnp.concatenate([g + dcum_inner, g, g + dcum_outer], axis=-1),
            0, -1,
        )  # [..., S, 3]
        return sdfs, offsets, geom_feats, sdfs_grad


class Density(nn.Module):
    """pos-encoder + MLP -> (softplus density, geom_feat)
    (reference models/density.py:12-99)."""

    mlp_layers_dims: Sequence[int] = (32, 32, 32)
    encoding_type: str = "permutohash"
    geom_feat_size: int = 32
    nr_iters_for_c2f: int = 0
    bb_sides: float = 2.0

    @nn.compact
    def __call__(self, points, iter_nr=None):
        enc = get_encoder(
            self.encoding_type,
            input_dim=3,
            nr_levels=24,
            nr_iters_for_c2f=self.nr_iters_for_c2f,
            multires=6,
            bb_sides=self.bb_sides,
        )
        feats, _ = enc(points, iter_nr)
        pred = MLP(
            tuple(self.mlp_layers_dims) + (1 + self.geom_feat_size,),
            last_layer_linear=True,
        )(feats)
        density = jax.nn.softplus(pred[..., 0:1])
        geom_feats = pred[..., 1:] if self.geom_feat_size > 0 else None
        return density, geom_feats


class RGB(nn.Module):
    """[pos-enc, SH(dirs), normals, geom_feat] -> MLP -> sigmoid rgb
    (reference models/rgb.py:13-168)."""

    mlp_layers_dims: Sequence[int] = (128, 128, 64)
    pos_encoder_type: str = "permutohash"
    out_channels: int = 3
    sh_deg: int = 3
    pos_dep: bool = True
    view_dep: bool = True
    normal_dep: bool = True
    geom_feat_dep: bool = True
    in_geom_feat_size: int = 32
    nr_iters_for_c2f: int = 0
    use_lipshitz_mlp: bool = False
    bb_sides: float = 2.0
    # bf16 appearance compute = the TPU-native reading of hp.use_grad_scaler
    # (reference base_method.py:80-83); geometry nets stay f32.
    mlp_dtype: str | None = None

    @nn.compact
    def __call__(
        self, points=None, samples_dirs=None, normals=None, geom_feat=None, iter_nr=None
    ):
        data = []
        if self.pos_dep:
            enc = get_encoder(
                self.pos_encoder_type,
                input_dim=3,
                nr_levels=24,
                nr_iters_for_c2f=self.nr_iters_for_c2f,
                multires=6,
                bb_sides=self.bb_sides,
            )
            feats, _ = enc(points, iter_nr)
            data.append(feats)
        if self.view_dep:
            # dirs encoding carries no gradient in the reference (rgb.py:122-125)
            data.append(jax.lax.stop_gradient(sh_basis(samples_dirs, self.sh_deg)))
        if self.normal_dep:
            data.append(normals)
        if self.geom_feat_dep and self.in_geom_feat_size > 0:
            assert geom_feat is not None, "geom_feat is required"
            data.append(geom_feat)
        x = jnp.concatenate(data, axis=-1)
        mlp_cls = LipshitzMLP if self.use_lipshitz_mlp else MLP
        x = mlp_cls(
            tuple(self.mlp_layers_dims) + (self.out_channels,),
            last_layer_linear=True,
            dtype=self.mlp_dtype,
        )(x)
        return jax.nn.sigmoid(x)


class ColorSH(nn.Module):
    """pos(+normal,+geom_feat) -> MLP -> SH coeffs; optional eval at dirs
    (reference models/color_sh.py:16-160). With samples_dirs=None returns the
    raw coefficients (used when baking textures)."""

    mlp_layers_dims: Sequence[int] = (128, 128, 64)
    pos_encoder_type: str = "permutohash"
    out_channels: int = 3
    sh_deg: int = 3
    normal_dep: bool = True
    geom_feat_dep: bool = True
    in_geom_feat_size: int = 32
    nr_iters_for_c2f: int = 0
    bb_sides: float = 2.0
    mlp_dtype: str | None = None  # see RGB.mlp_dtype

    @nn.compact
    def __call__(
        self, points, samples_dirs=None, normals=None, geom_feat=None, iter_nr=None
    ):
        enc = get_encoder(
            self.pos_encoder_type,
            input_dim=3,
            nr_levels=24,
            nr_iters_for_c2f=self.nr_iters_for_c2f,
            multires=6,
            bb_sides=self.bb_sides,
        )
        feats, _ = enc(points, iter_nr)
        data = [feats]
        if self.normal_dep:
            assert normals is not None, "normals required for normal-dep ColorSH"
            data.append(normals)
        if self.geom_feat_dep and self.in_geom_feat_size > 0:
            assert geom_feat is not None, "geom_feat is required"
            data.append(geom_feat)
        x = jnp.concatenate(data, axis=-1)
        nr_coeffs = num_sh_coeffs(self.sh_deg)
        pred = MLP(
            tuple(self.mlp_layers_dims) + (nr_coeffs * self.out_channels,),
            last_layer_linear=True,
            dtype=self.mlp_dtype,
        )(x)
        if samples_dirs is None:
            return pred
        sh_coeffs = pred.reshape(*pred.shape[:-1], self.out_channels, nr_coeffs)
        raw = sh_eval(sh_coeffs, samples_dirs, self.sh_deg)
        return jax.nn.sigmoid(raw)


class NerfHash(nn.Module):
    """Instant-NGP style background field
    (reference models/nerfhash.py:11-114): pos-enc -> 64^3 MLP ->
    (density, 64 feat); [gelu(feat), SH(dirs)] -> 64^2 MLP -> rgb;
    softplus density, sigmoid rgb."""

    pos_encoder_type: str = "permutohash"
    sh_deg: int = 3
    nr_feat_for_rgb: int = 64
    nr_iters_for_c2f: int = 0
    bb_sides: float = 2.0
    mlp_dtype: str | None = None  # see RGB.mlp_dtype

    @nn.compact
    def __call__(self, samples_3d, samples_dirs, iter_nr=None):
        enc = get_encoder(
            self.pos_encoder_type,
            input_dim=3,
            nr_levels=24,
            nr_iters_for_c2f=self.nr_iters_for_c2f,
            multires=6,
            bb_sides=self.bb_sides,
        )
        feats, _ = enc(samples_3d, iter_nr)
        dirs_enc = jax.lax.stop_gradient(sh_basis(samples_dirs, self.sh_deg))

        feat_and_density = MLP(
            (64, 64, 64, self.nr_feat_for_rgb + 1), last_layer_linear=True,
            dtype=self.mlp_dtype,
        )(feats)
        density = jax.nn.softplus(feat_and_density[..., 0:1])
        feat_rgb = feat_and_density[..., 1 : self.nr_feat_for_rgb + 1]

        x = jnp.concatenate([nn.gelu(feat_rgb), dirs_enc], axis=-1)
        rgb = MLP((64, 64, 3), last_layer_linear=True, dtype=self.mlp_dtype)(x)
        return jax.nn.sigmoid(rgb), density
