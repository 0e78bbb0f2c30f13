"""``offsets_surfs`` method: main SDF + k offset level-set surfaces.

TPU-native re-design of reference volsurfs_py/methods/offsets_surfs.py
(1449 lines). A shared encoder predicts the main SDF and per-offset epsilon
heads (models/offsets_sdf.py); all surfaces are rendered from ONE shared
sample set: per-surface NeuS alphas/transmittances/integrations give
per-surface rgb_k and opacity alpha_k, the surfaces are alpha-blended outer
to inner with cumprod(1-alpha) (reference offsets_surfs.py:418-685), and the
phase machine (offsets-init -> color-init -> first -> second,
offsets_surfs.py:1032-1151) becomes a static dispatch between jitted step
functions with stop-gradient freezing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from volsurfs_tpu.methods.base import TrainState, grad_norms, make_optimizer
from volsurfs_tpu.methods.surf import render_contracted_bg
from volsurfs_tpu.models import fields as F
from volsurfs_tpu.models.field_utils import (
    get_field_gradients,
    get_fields_gradients,
    get_sdf_curvature,
)
from volsurfs_tpu.ops import raycast as RC
from volsurfs_tpu.ops import samplers as SP
from volsurfs_tpu.ops import samples as S
from volsurfs_tpu.ops import volume_rendering as VR
from volsurfs_tpu.ops.occupancy import make_grid
from volsurfs_tpu.utils import losses as L
from volsurfs_tpu.utils.math import safe_norm, safe_normalize, small_cumprod, take_rev
from volsurfs_tpu.utils.schedules import (
    get_logistic_beta_from_variance,
    logistic_distribution_stdev,
    map_range_val,
)


def get_offsets_gt(nr_outer_surfs: int, nr_inner_surfs: int, delta_surfs: float):
    """Target offsets for the offsets-init phase: +-i*delta ordered
    [inner largest-first..., outer...] (reference utils/offsets_utils.py:4-20)."""
    inner = [(i + 1) * delta_surfs for i in range(nr_inner_surfs)]
    outer = [-(i + 1) * delta_surfs for i in range(nr_outer_surfs)]
    return jnp.asarray(inner[::-1] + outer, jnp.float32)


class OffsetsSurfs:
    method_name = "offsets_surfs"

    def __init__(
        self,
        hyper_params,
        bounding_primitive,
        bg_color: Optional[str] = None,
        occupancy_res: int = 256,
        key: jax.Array | None = None,
    ):
        self.hp = hyper_params
        hp = self.hp
        self.bounding_primitive = bounding_primitive
        self.occupancy_res = occupancy_res
        radius = float(bounding_primitive.get_radius())
        self.radius = radius
        bb_sides = radius * 2.0

        self.nr_inner_surfs = hp.nr_inner_surfs
        self.nr_outer_surfs = hp.nr_outer_surfs
        self.nr_surfs = hp.nr_inner_surfs + hp.nr_outer_surfs + 1
        self.main_surf_idx = hp.nr_inner_surfs

        # delta for initializing offsets from the logistic stdev
        # (reference offsets_surfs.py:62-75)
        stdev = float(
            logistic_distribution_stdev(
                np.clip(np.exp(hp.first_phase_variance_start_value * 10.0), 1e-6, 1e6)
            )
        )
        self.delta_surfs = stdev * hp.delta_surfs_multiplier
        self.offsets_gt = get_offsets_gt(
            self.nr_outer_surfs, self.nr_inner_surfs, self.delta_surfs
        )

        self.sdfs_model = F.OffsetsSDF(
            mlp_layers_dims=tuple(hp.sdf_mlp_layers_dims),
            encoding_type=hp.sdf_encoding_type,
            nr_inner_surfs=self.nr_inner_surfs,
            nr_outer_surfs=self.nr_outer_surfs,
            geom_feat_size=hp.geom_feat_size,
            nr_iters_for_c2f=0,
            bb_sides=bb_sides,
        )

        mlp_dtype = "bfloat16" if hp.use_grad_scaler else None  # see surf.py

        def make_appearance(out_channels, view_dep, normal_dep, geom_feat_dep):
            return F.RGB(
                mlp_layers_dims=tuple(hp.rgb_mlp_layers_dims),
                pos_encoder_type=hp.rgb_pos_encoder_type,
                out_channels=out_channels,
                sh_deg=hp.sh_degree,
                view_dep=view_dep,
                normal_dep=normal_dep,
                geom_feat_dep=geom_feat_dep,
                in_geom_feat_size=hp.geom_feat_size,
                nr_iters_for_c2f=hp.rgb_nr_iters_for_c2f,
                bb_sides=bb_sides,
                mlp_dtype=mlp_dtype,
            )

        # color + transparency models, shared or per-surface
        # (reference offsets_surfs.py model construction)
        self.nr_rgb_models = self.nr_surfs if hp.are_surfs_colors_indep else 1
        self.nr_alpha_models = self.nr_surfs if hp.are_surfs_transparency_indep else 1
        self.rgb_model = make_appearance(
            3, hp.rgb_view_dep, hp.rgb_normal_dep, hp.rgb_geom_feat_dep
        )
        self.alpha_model = make_appearance(
            1, hp.transp_view_dep, hp.transp_normal_dep, hp.transp_geom_feat_dep
        )

        self.bg_color = None
        self.bg_model = None
        if bg_color in (None, "trained"):
            self.bg_model = F.NerfHash(
                pos_encoder_type=hp.bg_pos_encoder_type,
                nr_iters_for_c2f=hp.bg_nr_iters_for_c2f,
                bb_sides=None,
                mlp_dtype=mlp_dtype,
            )
        elif bg_color == "white":
            self.bg_color = jnp.ones((1, 3))
        elif bg_color == "black":
            self.bg_color = jnp.zeros((1, 3))
        else:
            raise ValueError(f"bad bg_color {bg_color}")

        self.tx = make_optimizer(hp, warmup_start_iter=hp.color_init_phase_end_iter)
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._jit_cache = {}

    # ---- state ----------------------------------------------------------------

    def init_state(self) -> TrainState:
        keys = jax.random.split(self._key, 4 + self.nr_rgb_models + self.nr_alpha_models)
        p0 = jnp.zeros((8, 3))
        d0 = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        f0 = jnp.zeros((8, self.hp.geom_feat_size))
        params = {"sdfs": self.sdfs_model.init(keys[0], p0)}
        for i in range(self.nr_rgb_models):
            params[f"rgb_{i}"] = self.rgb_model.init(keys[2 + i], p0, d0, d0, f0)
        for i in range(self.nr_alpha_models):
            params[f"alpha_{i}"] = self.alpha_model.init(
                keys[2 + self.nr_rgb_models + i], p0, d0, d0, f0
            )
        if self.bg_model is not None:
            params["bg"] = self.bg_model.init(keys[1], p0, d0)
        grid = None
        if self.hp.use_occupancy_grid:
            grid = make_grid(
                self.occupancy_res, self.radius * 2.0, sphere_roi_radius=self.radius
            )
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            grid=grid,
            key=keys[-1],
            iter_nr=jnp.asarray(0, jnp.int32),
        )

    def load_main_sdf(self, state: TrainState, surf_sdf_params) -> TrainState:
        """Transfer a pretrained surf SDF into the shared encoder + main head
        (reference offsets_surfs.py:248-261 / models/offsets_sdf.py:218-237)."""
        sdfs = state.params["sdfs"]
        src = surf_sdf_params["params"]
        new = dict(sdfs["params"])
        # surf's SDF is @nn.compact ('<Enc>_0'/'MLP_0'); OffsetsSDF uses setup
        # attribute names ('pos_encoder'/'mlp_sdf')
        enc_name = [k for k in src if "Encoder" in k][0]
        new["pos_encoder"] = src[enc_name]
        new["mlp_sdf"] = src["MLP_0"]
        params = dict(state.params)
        params["sdfs"] = {"params": new}
        return state.replace(params=params)

    # ---- phases (reference offsets_surfs.py:1032-1151) -------------------------

    def _phase(self, it: int) -> str:
        if it < self.hp.init_phase_end_iter:
            return "offsets_init"
        if it < self.hp.color_init_phase_end_iter:
            return "color_init"
        if it < self.hp.first_phase_end_iter:
            return "first"
        return "second"

    def _variance(self, iter_nr):
        hp = self.hp
        return map_range_val(
            iter_nr,
            hp.color_init_phase_end_iter,
            hp.first_phase_end_iter,
            hp.first_phase_variance_start_value,
            hp.first_phase_variance_end_value,
        )

    def _alpha_decay_factor(self, iter_nr):
        """1000 during init phases, annealed 1000 -> 10 over the first phase
        (reference offsets_surfs.py:1065,1126-1132,1149)."""
        return map_range_val(
            iter_nr,
            self.hp.color_init_phase_end_iter,
            self.hp.first_phase_end_iter,
            1000.0,
            10.0,
        )

    # ---- fields ---------------------------------------------------------------

    def _sdfs_fn(self, params, points, iter_nr, train_main=True, train_offsets=True):
        return self.sdfs_model.apply(
            params["sdfs"], points, iter_nr, train_main, train_offsets
        )

    def _sdfs_with_grads(self, params, points, iter_nr, train_main=True,
                         train_offsets=True):
        """(sdfs, offsets, geom_feat, sdfs_grad [..., S, 3]): analytic
        encoder-jacobian gradients of every surface at once
        (hp.sdf_grads_mode="autodiff"; one backward table scatter) or the
        reference's batched 4-point finite difference ("finite_diff",
        volsurfs_py/utils/fields_utils.py:6-80)."""
        if self.hp.sdf_grads_mode == "autodiff":
            return self.sdfs_model.apply(
                params["sdfs"], points, iter_nr, train_main, train_offsets,
                with_grads=True,
            )
        sdfs, offsets, geom_feat = self._sdfs_fn(
            params, points, iter_nr, train_main, train_offsets
        )
        grads = get_fields_gradients(
            lambda p: self._sdfs_fn(params, p, iter_nr, train_main, train_offsets)[0][
                ..., 0
            ],
            points,
        )
        return sdfs, offsets, geom_feat, grads

    def _rgb_fn(self, params, surf_idx, *args):
        name = f"rgb_{surf_idx if self.hp.are_surfs_colors_indep else 0}"
        return self.rgb_model.apply(params[name], *args)

    def _alpha_fn(self, params, surf_idx, *args):
        name = f"alpha_{surf_idx if self.hp.are_surfs_transparency_indep else 0}"
        return self.alpha_model.apply(params[name], *args)

    # ---- sampling (reference utils/sdfs_utils.py:12-200) -----------------------

    def _avg_cdf(self, samples, sdfs, beta_value):
        """Average of the per-surface normalized-weight CDFs
        (reference sdfs_utils.py:12-67). All surfaces share ONE batched
        [K*R, S] transmittance/CDF scan — separate per-surface scans get
        pattern-matched by XLA into an interleaved reduce-window that trips
        a TPU fusion-emitter CHECK (see render_rays)."""
        K = self.nr_surfs
        R, S = samples.mask.shape
        alphas = [
            VR.sdf2alpha(samples, sdfs[..., surf_idx], beta_value)
            for surf_idx in range(K)
        ]
        alpha_all = jnp.stack(alphas, axis=0).reshape(K * R, S)
        mask_all = jnp.tile(samples.mask, (K, 1))
        alpha_all = jnp.where(mask_all, alpha_all, 0.0)
        trans_all, _ = VR.cumprod_one_minus_alpha_to_transmittance(
            (1.0 - alpha_all) + 1e-6, mask_all
        )
        w = alpha_all * trans_all
        w_sum = jnp.sum(jnp.where(mask_all, w, 0.0), axis=1, keepdims=True)
        w = w / jnp.clip(w_sum, 1e-6)
        cdf_all = VR.compute_cdf(w, mask_all).reshape(K, R, S)
        return jnp.sum(cdf_all, axis=0) / K

    def _sample_rays(self, params, grid, rays_o, rays_d, t_near, t_far, iter_nr, key,
                     jitter, train_main, train_offsets):
        hp = self.hp
        k_uni, k1, k2 = jax.random.split(key, 3) if key is not None else (None,) * 3
        if grid is not None:
            uniform = SP.compute_samples_fg_in_occupied_regions(
                rays_o, rays_d, t_near, t_far, grid.lookup_fn(),
                hp.min_dist_between_samples, hp.min_nr_samples_per_ray,
                hp.max_nr_samples_per_ray, key=k_uni if jitter else None,
                clip_to_occupancy=hp.clip_rays_to_occupancy,
            )
        else:
            uniform = SP.compute_samples_fg(
                rays_o, rays_d, t_near, t_far,
                hp.min_dist_between_samples, hp.min_nr_samples_per_ray,
                hp.max_nr_samples_per_ray, key=k_uni if jitter else None,
            )
        if not hp.do_importance_sampling:
            return uniform

        sg = jax.lax.stop_gradient(params)
        beta = get_logistic_beta_from_variance(self._variance(iter_nr))
        n_imp = hp.max_nr_imp_samples_per_ray

        def sdfs_at(samples):
            sdfs, _, _ = self._sdfs_fn(
                sg, samples.positions(), iter_nr, train_main, train_offsets
            )
            return sdfs[..., 0]  # [R, S, nr_surfs]

        sdfs_u = sdfs_at(uniform)
        cdf1 = self._avg_cdf(uniform, sdfs_u, beta / 2.0)
        imp1 = VR.importance_sample(uniform, cdf1, n_imp // 2, k1 if jitter else None)

        sdfs_i1 = sdfs_at(imp1)
        combined, comb_sdfs = S.combine(
            uniform, imp1, hp.min_dist_between_samples, sdfs_u, sdfs_i1
        )
        cdf2 = self._avg_cdf(combined, comb_sdfs, beta)
        imp2 = VR.importance_sample(combined, cdf2, n_imp // 2, k2 if jitter else None)

        imp, _ = S.combine(imp1, imp2, hp.min_dist_between_samples)
        final, _ = S.combine(uniform, imp, hp.min_dist_between_samples)
        return final

    # ---- rendering (reference offsets_surfs.py:418-685) ------------------------

    def render_rays(self, params, grid, rays_o, rays_d, iter_nr, key, train: bool,
                    train_main: bool = True, train_offsets: bool = True):
        hp = self.hp
        raycast = RC.intersect_bounding_primitive(self.bounding_primitive, rays_o, rays_d)
        k_fg, k_bg = jax.random.split(key) if key is not None else (None, None)
        beta = get_logistic_beta_from_variance(self._variance(iter_nr))
        decay_factor = self._alpha_decay_factor(iter_nr)
        cos_anneal = 1.0  # reference keeps cos_anneal at 1 (offsets_surfs.py:1117)

        samples = self._sample_rays(
            params, grid, rays_o, rays_d, raycast["t_near"], raycast["t_far"],
            iter_nr, k_fg, train, train_main, train_offsets,
        )
        pos = samples.positions()
        dirs = samples.dirs()

        # [R, S, nr_surfs, 3]: every surface's gradient from one evaluation
        sdfs, _, geom_feat, surfs_grad = self._sdfs_with_grads(
            params, pos, iter_nr, train_main, train_offsets
        )
        surfs_normals_s = safe_normalize(surfs_grad)

        # per-surface appearance + NeuS alphas (no scans inside the loop)
        per_rgb_s, per_transp_s, per_alpha_s = [], [], []
        for surf_idx in range(self.nr_surfs):
            normals_s = surfs_normals_s[..., surf_idx, :]
            rgb_s = self._rgb_fn(
                params, surf_idx, pos, dirs, normals_s, geom_feat, iter_nr
            )
            transparency_s = self._alpha_fn(
                params, surf_idx, pos, dirs, normals_s, geom_feat, iter_nr
            )
            if hp.with_alpha_decay:
                # modulate transparency by grazing angle
                # (reference offsets_surfs.py:527-543)
                dot = jnp.clip(
                    jnp.sum(-dirs * normals_s, axis=-1, keepdims=True), 0.0, 1.0
                )
                decay = jax.nn.sigmoid(decay_factor * dot) * 2.0 - 1.0
                transparency_s = transparency_s * jax.lax.stop_gradient(decay)
            per_rgb_s.append(rgb_s)
            per_transp_s.append(transparency_s)
            per_alpha_s.append(VR.neus_alpha_from_sdf_gradients(
                samples, sdfs[..., surf_idx, 0], surfs_grad[..., surf_idx, :],
                cos_anneal, beta,
            ))

        # ONE batched transmittance scan for all surfaces, [K*R, S]: five
        # separate per-surface scans get pattern-matched by XLA into an
        # interleaved reduce-window that trips the TPU fusion-emitter CHECK
        # (window_bounds != strides); batching over the major axis keeps a
        # single stride-1 scan (and is faster anyway)
        K = self.nr_surfs
        R, S = samples.mask.shape
        alpha_all = jnp.stack(per_alpha_s, axis=0).reshape(K * R, S)
        mask_all = jnp.tile(samples.mask, (K, 1))
        alpha_all = jnp.where(mask_all, alpha_all, 0.0)
        trans_all, _ = VR.cumprod_one_minus_alpha_to_transmittance(
            (1.0 - alpha_all) + 1e-6, mask_all
        )
        w_all = (alpha_all * trans_all).reshape(K, R, S)

        surfs_rgb, surfs_alpha = [], []
        surfs_normals, surfs_depths, surfs_weight_sum = [], [], []
        for surf_idx in range(self.nr_surfs):
            normals_s = surfs_normals_s[..., surf_idx, :]
            w_s = w_all[surf_idx]
            surfs_rgb.append(VR.integrate(per_rgb_s[surf_idx], w_s, samples.mask))
            surfs_alpha.append(
                VR.integrate(per_transp_s[surf_idx], w_s, samples.mask)
            )
            surfs_normals.append(
                jax.lax.stop_gradient(VR.integrate(normals_s, w_s, samples.mask))
            )
            surfs_depths.append(
                jax.lax.stop_gradient(
                    VR.integrate(samples.z[..., None], w_s, samples.mask)
                )
            )
            surfs_weight_sum.append(
                jax.lax.stop_gradient(VR.sum_over_rays(w_s, samples.mask)[0])
            )

        surfs_rgb = jnp.stack(surfs_rgb, axis=1)  # [R, nr_surfs, 3] inner..outer
        surfs_alpha = jnp.stack(surfs_alpha, axis=1)  # [R, nr_surfs, 1]

        # blend outer -> inner: T_k = cumprod(1 - alpha) over the flipped order
        # (reference offsets_surfs.py:602-665)
        rgb_o2i = take_rev(surfs_rgb, axis=1)
        alpha_o2i = take_rev(surfs_alpha, axis=1)
        # unrolled: the surfaces axis is tiny and jnp.cumprod's
        # reduce-window lowering trips a TPU fusion-emitter CHECK in the
        # color-init stop-gradient graph (see utils/math.small_cumprod)
        transmittances = small_cumprod(1.0 - alpha_o2i, axis=1)
        if self.nr_surfs == 1:
            surfs_T = jnp.ones_like(transmittances)
            bg_transmittance = transmittances[:, -1]
        else:
            surfs_T = jnp.concatenate(
                [jnp.ones_like(transmittances[:, :1]), transmittances[:, :-1]], axis=1
            )
            bg_transmittance = transmittances[:, -1]
        blending_weights = surfs_T * alpha_o2i
        rgb_fg = jnp.sum(rgb_o2i * blending_weights, axis=1)

        # background
        if self.bg_model is None:
            rgb_bg = jnp.broadcast_to(self.bg_color, rgb_fg.shape)
        else:
            bg_res = render_contracted_bg(
                lambda p, d, i: self.bg_model.apply(params["bg"], p, d, i),
                raycast, hp.nr_samples_bg, k_bg if train else None, iter_nr,
            )
            rgb_bg = bg_res["pred_rgb"]
        rgb = rgb_fg + rgb_bg * bg_transmittance

        return {
            "rgb": rgb,
            "rgb_fg": rgb_fg,
            "rgb_bg": rgb_bg,
            "bg_transmittance": bg_transmittance,
            "surfs_rgb": surfs_rgb,
            "surfs_alpha": surfs_alpha,
            "surfs_normals": jnp.stack(surfs_normals, axis=1),
            "surfs_depths": jnp.stack(surfs_depths, axis=1),
            "surfs_weight_sum": jnp.stack(surfs_weight_sum, axis=1),
            "surfs_blending_weights": take_rev(blending_weights, axis=1),
            "nr_samples": samples.samples_per_ray(),
            "samples": samples,
            "samples_sdfs": sdfs,
            "samples_sdfs_grad": surfs_grad,
        }

    # ---- losses (reference offsets_surfs.py:1153-1449) -------------------------

    def _offsets_init_loss(self, params, iter_nr, key):
        hp = self.hp
        pts = self.bounding_primitive.get_random_points_inside(key, 30000)
        # main surf frozen during offsets init
        _, geom_feats = self.sdfs_model.apply(
            params["sdfs"], pts, iter_nr, False, method=self.sdfs_model.main_sdf
        )
        geom_feats = jax.lax.stop_gradient(geom_feats)
        cum_inner, cum_outer, _, _ = self.sdfs_model.apply(
            params["sdfs"], geom_feats, method=self.sdfs_model.get_offsets
        )
        points_offsets = jnp.concatenate([cum_inner, cum_outer], axis=-1)
        offsets_gt = jnp.broadcast_to(self.offsets_gt[None], points_offsets.shape)
        loss_offsets = jnp.mean(jnp.abs(points_offsets - offsets_gt))
        loss = loss_offsets

        loss_eik_supp = jnp.asarray(0.0)
        if hp.support_surfs_eikonal_weight > 0.0 and self.nr_surfs > 1:
            grads = self._support_grads(params, pts, iter_nr, False, True)
            loss_eik_supp = L.eikonal_loss(grads) * hp.support_surfs_eikonal_weight
            loss = loss + loss_eik_supp
        return loss, {
            "loss": loss, "offsets": loss_offsets, "eikonal_supp": loss_eik_supp,
        }

    def _support_grads(self, params, pts, iter_nr, train_main, train_offsets):
        grads = self._sdfs_with_grads(
            params, pts, iter_nr, train_main, train_offsets
        )[3]  # [N, nr_surfs, 3]
        supp_idx = [i for i in range(self.nr_surfs) if i != self.main_surf_idx]
        return grads[:, supp_idx, :]

    def _data_loss(self, params, grid, batch, iter_nr, key, train_main, train_offsets):
        hp = self.hp
        k_render, k_pts, k_curv = jax.random.split(key, 3)
        res = self.render_rays(
            params, grid, batch["rays_o"], batch["rays_d"], iter_nr, k_render, True,
            train_main, train_offsets,
        )
        pred_rgb = res["rgb"]
        if hp.nr_training_rays_per_pixel > 1:
            pred_rgb = pred_rgb.reshape(-1, hp.nr_training_rays_per_pixel, 3).mean(1)
        if hp.is_training_masked:
            loss_rgb = L.loss_l1(batch["gt_rgb"], pred_rgb, mask=batch["gt_mask"])
        else:
            loss_rgb = L.loss_l1(batch["gt_rgb"], pred_rgb)
        loss = loss_rgb

        samples = res["samples"]
        s_mask = samples.mask
        denom = jnp.clip(jnp.sum(s_mask), 1)

        r_pts = self.bounding_primitive.get_random_points_inside(k_pts, 1024)
        # one evaluation yields every surface's value AND gradient
        r_sdfs, _, _, r_grads = self._sdfs_with_grads(
            params, r_pts, iter_nr, train_main, train_offsets
        )
        r_main_grad = r_grads[..., self.main_surf_idx, :]

        loss_eik_main = jnp.asarray(0.0)
        if hp.eikonal_weight > 0.0 and train_main:
            loss_eik_main = L.eikonal_loss(r_main_grad) * hp.eikonal_weight
            s_main_grad = res["samples_sdfs_grad"][..., self.main_surf_idx, :]
            err = jnp.where(s_mask, (safe_norm(s_main_grad, axis=-1) - 1.0) ** 2, 0.0)
            loss_eik_main = loss_eik_main + (jnp.sum(err) / denom) * hp.eikonal_weight
            loss = loss + loss_eik_main

        loss_eik_supp = jnp.asarray(0.0)
        if (
            hp.eikonal_weight > 0.0
            and hp.support_surfs_eikonal_weight > 0.0
            and train_offsets
            and self.nr_surfs > 1
        ):
            supp_idx = [i for i in range(self.nr_surfs) if i != self.main_surf_idx]
            r_supp = r_grads[:, supp_idx, :]
            loss_eik_supp = (
                L.eikonal_loss(r_supp) * hp.support_surfs_eikonal_weight
            )
            s_supp = res["samples_sdfs_grad"][..., supp_idx, :]
            err = jnp.where(
                s_mask[..., None], (safe_norm(s_supp, axis=-1) - 1.0) ** 2, 0.0
            )
            loss_eik_supp = loss_eik_supp + (
                jnp.sum(err) / (denom * len(supp_idx))
            ) * hp.support_surfs_eikonal_weight
            loss = loss + loss_eik_supp

        loss_offsurface = jnp.asarray(0.0)
        if hp.offsurface_weight > 0.0:
            # main surface only (reference offsets_surfs.py:1400-1412)
            loss_offsurface = (
                L.offsurface_loss(r_sdfs[..., self.main_surf_idx, 0])
                * hp.offsurface_weight
            )
            loss = loss + loss_offsurface

        loss_curv = jnp.asarray(0.0)
        if hp.curvature_weight > 0.0 and train_main:
            curv = get_sdf_curvature(
                lambda p: self._sdfs_fn(params, p, iter_nr, train_main, train_offsets)[
                    0
                ][..., self.main_surf_idx, 0:1],
                samples.positions(),
                res["samples_sdfs_grad"][..., self.main_surf_idx, :],
                k_curv,
                grad_fn=(
                    (lambda p: self.sdfs_model.apply(
                        params["sdfs"], p, iter_nr, train_main,
                        method="main_sdf_grad",
                    ))
                    if self.hp.sdf_grads_mode == "autodiff"
                    else None
                ),
            )
            curv = jnp.where(s_mask[..., None], curv, 0.0)
            loss_curv = (jnp.sum(curv) / denom) * hp.curvature_weight
            loss = loss + loss_curv

        return loss, {
            "loss": loss,
            "rgb": loss_rgb,
            "eikonal_main": loss_eik_main,
            "eikonal_supp": loss_eik_supp,
            "loss_offsurface_high_sdf": loss_offsurface,
            "curvature": loss_curv,
            "nr_samples_total": jnp.sum(res["nr_samples"]) if "nr_samples" in res else jnp.asarray(0),
        }

    # ---- steps ------------------------------------------------------------------

    def _get_jitted(self, name, fn, **kw):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, **kw)
        return self._jit_cache[name]

    def train_step(self, state: TrainState, batch):
        phase = self._phase(int(state.iter_nr))
        # freezing per phase (reference offsets_surfs.py:1060-1105)
        train_main = phase in ("first", "second")
        train_offsets = phase in ("offsets_init", "first", "second")

        def step_fn(state, batch):
            k, k_loss = jax.random.split(state.key)

            def loss_fn(params):
                if phase == "offsets_init":
                    return self._offsets_init_loss(params, state.iter_nr, k_loss)
                return self._data_loss(
                    params, state.grid, batch, state.iter_nr, k_loss,
                    train_main, train_offsets,
                )

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            losses = {**losses, **grad_norms(grads)}
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    params=params, opt_state=opt_state, key=k, iter_nr=state.iter_nr + 1
                ),
                losses,
            )

        return self._get_jitted(f"step_{phase}", step_fn, donate_argnums=(0,))(
            state, batch
        )

    def update_occupancy_grid(self, state: TrainState) -> TrainState:
        """Occupancy from min over surfaces of |sdf|
        (reference offsets_surfs.py:358-416)."""
        if state.grid is None:
            return state

        def update_fn(state):
            grid = state.grid
            pts = grid.get_grid_samples()
            n = pts.shape[0]
            chunk = min(n, 65536)
            n_chunks = n // chunk

            def eval_chunk(p):
                sdfs, _, _ = self._sdfs_fn(
                    jax.lax.stop_gradient(state.params), p, state.iter_nr
                )
                return jnp.min(jnp.abs(sdfs[..., 0]), axis=-1)

            vals = jax.lax.map(
                eval_chunk, pts[: n_chunks * chunk].reshape(n_chunks, chunk, 3)
            ).reshape(-1)
            if n_chunks * chunk < n:
                vals = jnp.concatenate([vals, eval_chunk(pts[n_chunks * chunk :])])

            variance = jnp.minimum(0.8, self._variance(state.iter_nr))
            beta = get_logistic_beta_from_variance(variance)
            grid = grid.update_values(vals, decay=0.0)
            grid = grid.update_occupancy_with_sdf(beta, occupancy_thresh=1e-4)
            return state.replace(grid=grid)

        return self._get_jitted("update_occupancy", update_fn)(state)

    def make_render_fn(self, chunk_size: int = 2048):
        def render(params, grid, rays_o, rays_d, iter_nr):
            res = self.render_rays(params, grid, rays_o, rays_d, iter_nr, None, False)
            return {
                "rgb": res["rgb"],
                "bg_transmittance": res["bg_transmittance"],
                "surfs_alpha": res["surfs_alpha"][..., 0],
            }

        return self._get_jitted("render", render)
