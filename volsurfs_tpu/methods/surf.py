"""``surf`` method: NeuS-style single-SDF surface reconstruction.

TPU-native re-design of reference volsurfs_py/methods/surf.py (1128 lines).
The whole forward (sampling -> 2-round SDF importance sampling -> finite-diff
gradients -> NeuS compositing -> background -> losses) is one pure function
jitted end-to-end; phase switching (sphere-init vs data training) is a
static Python-level dispatch between two jitted step functions, and the
variance / cos-anneal schedules are traced scalars of iter_nr so no
recompilation happens during training (reference mutates module state per
iteration instead, surf.py:789-864).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from volsurfs_tpu.methods.base import TrainState, grad_norms, make_optimizer
from volsurfs_tpu.models import fields as F
from volsurfs_tpu.models.field_utils import get_field_gradients, get_sdf_curvature
from volsurfs_tpu.ops import raycast as RC
from volsurfs_tpu.ops import samplers as SP
from volsurfs_tpu.ops import samples as S
from volsurfs_tpu.ops import volume_rendering as VR
from volsurfs_tpu.ops.occupancy import make_grid
from volsurfs_tpu.utils import losses as L
from volsurfs_tpu.utils.math import safe_norm, safe_normalize
from volsurfs_tpu.utils.schedules import (
    get_logistic_beta_from_variance,
    map_range_val,
)


def render_contracted_bg(
    bg_apply, raycast, nr_samples_bg: int, key, iter_nr=None
):
    """Background rendering through the contracted NerfHash field
    (reference volsurfs_py/utils/background.py:31-141)."""
    bg_samples = SP.compute_samples_bg(
        raycast["rays_o"],
        raycast["rays_d"],
        raycast["t_far"],
        nr_samples_bg,
        t_far=100.0,
        key=key,
    )
    cpos, c_samples = SP.contract_samples(bg_samples)
    rgb_samples, density_samples = bg_apply(cpos, c_samples.dirs(), iter_nr)
    alpha = 1.0 - jnp.exp(-density_samples[..., 0] * c_samples.dt)
    alpha = jnp.where(c_samples.mask, alpha, 0.0)
    transmittance, _ = VR.cumprod_one_minus_alpha_to_transmittance(
        (1.0 - alpha) + 1e-6, c_samples.mask
    )
    weights = alpha * transmittance
    pred_rgb = VR.integrate(rgb_samples, weights, c_samples.mask)
    median_depth = VR.median_depth(bg_samples, weights)  # uncontracted z
    return {"pred_rgb": pred_rgb, "median_depth": median_depth}


class Surf:
    method_name = "surf"

    def __init__(
        self,
        hyper_params,
        bounding_primitive,
        bg_color: Optional[str] = None,
        init_sphere_radius: float = 0.3,
        occupancy_res: int = 256,
        key: jax.Array | None = None,
    ):
        self.hp = hyper_params
        self.bounding_primitive = bounding_primitive
        self.init_sphere_radius = init_sphere_radius
        self.occupancy_res = occupancy_res
        radius = float(bounding_primitive.get_radius())
        self.radius = radius
        bb_sides = radius * 2.0

        hp = self.hp
        # bf16 appearance compute when the config asks for mixed precision
        # (reference base_method.py:80-83 GradScaler; the SDF stays f32 —
        # NeuS geometry is precision-sensitive on TPU)
        mlp_dtype = "bfloat16" if hp.use_grad_scaler else None
        self.sdf_model = F.SDF(
            mlp_layers_dims=tuple(hp.sdf_mlp_layers_dims),
            encoding_type=hp.sdf_encoding_type,
            geom_feat_size=hp.geom_feat_size,
            nr_iters_for_c2f=hp.sdf_nr_iters_for_c2f,
            bb_sides=bb_sides,
        )
        if hp.appearance_predict_sh_coeffs:
            assert hp.rgb_view_dep, "SH coeffs require view-dependent color"
            self.rgb_model = F.ColorSH(
                mlp_layers_dims=tuple(hp.rgb_mlp_layers_dims),
                pos_encoder_type=hp.rgb_pos_encoder_type,
                sh_deg=hp.sh_degree,
                normal_dep=hp.rgb_normal_dep,
                geom_feat_dep=hp.rgb_geom_feat_dep,
                in_geom_feat_size=hp.geom_feat_size,
                nr_iters_for_c2f=hp.rgb_nr_iters_for_c2f,
                bb_sides=bb_sides,
                mlp_dtype=mlp_dtype,
            )
        else:
            self.rgb_model = F.RGB(
                mlp_layers_dims=tuple(hp.rgb_mlp_layers_dims),
                pos_encoder_type=hp.rgb_pos_encoder_type,
                sh_deg=hp.sh_degree,
                view_dep=hp.rgb_view_dep,
                normal_dep=hp.rgb_normal_dep,
                geom_feat_dep=hp.rgb_geom_feat_dep,
                in_geom_feat_size=hp.geom_feat_size,
                nr_iters_for_c2f=hp.rgb_nr_iters_for_c2f,
                use_lipshitz_mlp=hp.rgb_use_lipshitz_mlp,
                bb_sides=bb_sides,
                mlp_dtype=mlp_dtype,
            )
        # constant vs learned background (reference surf.py:151-162)
        self.bg_color = None
        self.bg_model = None
        if bg_color in (None, "trained"):
            self.bg_model = F.NerfHash(
                pos_encoder_type=hp.bg_pos_encoder_type,
                nr_iters_for_c2f=hp.bg_nr_iters_for_c2f,
                bb_sides=None,  # bg operates on contracted coords, unbounded
                mlp_dtype=mlp_dtype,
            )
        elif bg_color == "white":
            self.bg_color = jnp.ones((1, 3))
        elif bg_color == "black":
            self.bg_color = jnp.zeros((1, 3))
        else:
            raise ValueError(f"bad bg_color {bg_color}")

        self.tx = make_optimizer(hp, warmup_start_iter=hp.init_phase_end_iter)
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._jit_cache = {}

    # ---- init ---------------------------------------------------------------

    def init_state(self) -> TrainState:
        key = self._key
        k_sdf, k_rgb, k_bg, k_state = jax.random.split(key, 4)
        p0 = jnp.zeros((8, 3))
        d0 = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        f0 = jnp.zeros((8, self.hp.geom_feat_size))
        params = {
            "sdf": self.sdf_model.init(k_sdf, p0),
            "rgb": self.rgb_model.init(k_rgb, p0, d0, d0, f0),
        }
        if self.bg_model is not None:
            params["bg"] = self.bg_model.init(k_bg, p0, d0)
        grid = None
        if self.hp.use_occupancy_grid:
            grid = make_grid(
                self.occupancy_res, self.radius * 2.0, sphere_roi_radius=self.radius
            )
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            grid=grid,
            key=k_state,
            iter_nr=jnp.asarray(0, jnp.int32),
        )

    # ---- schedules ----------------------------------------------------------

    def _variance(self, iter_nr):
        """reference surf.py:810-828 (traced)."""
        return map_range_val(
            iter_nr,
            self.hp.init_phase_end_iter,
            self.hp.first_phase_end_iter,
            self.hp.first_phase_variance_start_value,
            self.hp.first_phase_variance_end_value,
        )

    def _cos_anneal(self, iter_nr):
        return map_range_val(
            iter_nr,
            self.hp.init_phase_end_iter,
            self.hp.first_phase_end_iter,
            0.0,
            1.0,
        )

    # ---- field wrappers ------------------------------------------------------

    def _sdf_fn(self, params, points, iter_nr):
        return self.sdf_model.apply(params["sdf"], points, iter_nr)

    def _sdf_with_grad(self, params, points, iter_nr):
        """(sdf, geom_feat, sdf_grad): analytic encoder-jacobian gradients
        (hp.sdf_grads_mode="autodiff", one fused backward scatter) or the
        reference's 4-point finite difference ("finite_diff",
        volsurfs_py/utils/fields_utils.py:6-80)."""
        if self.hp.sdf_grads_mode == "autodiff":
            return self.sdf_model.apply(
                params["sdf"], points, iter_nr, with_grads=True
            )
        sdf, geom_feat = self._sdf_fn(params, points, iter_nr)
        grad = get_field_gradients(
            lambda p: self._sdf_fn(params, p, iter_nr), points
        )
        return sdf, geom_feat, grad

    def _sdf_grad_only(self, params, points, iter_nr):
        return self._sdf_with_grad(params, points, iter_nr)[2]

    def _rgb_fn(self, params, points, dirs, normals, geom_feat, iter_nr):
        return self.rgb_model.apply(
            params["rgb"], points, dirs, normals, geom_feat, iter_nr
        )

    # ---- sampling (reference utils/sdf_utils.py:44-281) ---------------------

    def _sample_rays(self, params, grid, rays_o, rays_d, t_near, t_far, iter_nr, key, jitter):
        hp = self.hp
        k_uni, k_imp1, k_imp2 = (
            jax.random.split(key, 3) if key is not None else (None, None, None)
        )
        if grid is not None:
            uniform = SP.compute_samples_fg_in_occupied_regions(
                rays_o, rays_d, t_near, t_far, grid.lookup_fn(),
                hp.min_dist_between_samples,
                hp.min_nr_samples_per_ray,
                hp.max_nr_samples_per_ray,
                key=k_uni if jitter else None,
                clip_to_occupancy=hp.clip_rays_to_occupancy,
            )
        else:
            uniform = SP.compute_samples_fg(
                rays_o, rays_d, t_near, t_far,
                hp.min_dist_between_samples,
                hp.min_nr_samples_per_ray,
                hp.max_nr_samples_per_ray,
                key=k_uni if jitter else None,
            )
        if not hp.do_importance_sampling:
            return uniform

        # importance sampling runs without gradients (reference
        # sdf_utils.py:44 @torch.no_grad)
        sg_params = jax.lax.stop_gradient(params)
        variance = self._variance(iter_nr)
        beta = get_logistic_beta_from_variance(variance)
        n_imp = hp.max_nr_imp_samples_per_ray

        # Stage-seam optimization barriers: letting XLA fuse the whole
        # DDA -> CDF round 1 -> combine -> CDF round 2 -> combine pipeline
        # into one graph makes compile time blow up super-linearly in the
        # ray-chunk size (measured: 1561 s at the reference's 16384-ray
        # eval chunk vs ~1 min at 4096, while every stage alone compiles in
        # 1-20 s). The barriers bound each fusion region to one stage;
        # runtime is unchanged (the seams materialize only the [R, S]
        # sample tensors, which the stages would write anyway).
        uniform = jax.lax.optimization_barrier(uniform)

        def weights_cdf(samples, sdf, beta_value):
            alpha = VR.sdf2alpha(samples, sdf, beta_value)
            w, _, _ = VR.neus_weights(samples, alpha)
            _, w_sum = VR.sum_over_rays(w, samples.mask)
            w = w / jnp.clip(w_sum, 1e-6)
            return VR.compute_cdf(w, samples.mask)

        sdf_u, _ = self._sdf_fn(sg_params, uniform.positions(), iter_nr)
        sdf_u = sdf_u[..., 0]
        cdf = weights_cdf(uniform, sdf_u, beta / 2.0)
        imp1 = VR.importance_sample(uniform, cdf, n_imp // 2, k_imp1 if jitter else None)
        imp1, sdf_u = jax.lax.optimization_barrier((imp1, sdf_u))

        sdf_i1, _ = self._sdf_fn(sg_params, imp1.positions(), iter_nr)
        sdf_i1 = sdf_i1[..., 0]
        combined1, comb_sdf = S.combine(
            uniform, imp1, hp.min_dist_between_samples,
            sdf_u[..., None], sdf_i1[..., None],
        )
        combined1, comb_sdf = jax.lax.optimization_barrier((combined1, comb_sdf))
        cdf2 = weights_cdf(combined1, comb_sdf[..., 0], beta)
        imp2 = VR.importance_sample(combined1, cdf2, n_imp // 2, k_imp2 if jitter else None)
        imp2 = jax.lax.optimization_barrier(imp2)

        imp, _ = S.combine(imp1, imp2, hp.min_dist_between_samples)
        final, _ = S.combine(uniform, imp, hp.min_dist_between_samples)
        return final

    # ---- rendering ----------------------------------------------------------

    def render_rays(self, params, grid, rays_o, rays_d, iter_nr, key, train: bool):
        """Full surf render (reference surf.py:649-787)."""
        hp = self.hp
        raycast = RC.intersect_bounding_primitive(self.bounding_primitive, rays_o, rays_d)
        k_fg, k_bg = (
            jax.random.split(key) if key is not None else (None, None)
        )
        variance = self._variance(iter_nr)
        beta = get_logistic_beta_from_variance(variance)
        cos_anneal = self._cos_anneal(iter_nr)

        samples = self._sample_rays(
            params, grid, rays_o, rays_d,
            raycast["t_near"], raycast["t_far"], iter_nr, k_fg, jitter=train,
        )

        # foreground volumetric (reference surf.py:305-548)
        pos = samples.positions()
        sdf, geom_feat, sdf_grad = self._sdf_with_grad(params, pos, iter_nr)
        normals = safe_normalize(sdf_grad)
        rgb_samples = self._rgb_fn(
            params, pos, samples.dirs(), normals, geom_feat, iter_nr
        )
        alpha = VR.neus_alpha_from_sdf_gradients(
            samples, sdf, sdf_grad, cos_anneal, beta
        )
        weights, transmittance, _ = VR.neus_weights(samples, alpha)
        weights_sum, _ = VR.sum_over_rays(weights, samples.mask)
        bg_transmittance = 1.0 - weights_sum
        rgb_fg = VR.integrate(rgb_samples, weights, samples.mask)
        depth_fg = VR.integrate(samples.z[..., None], weights, samples.mask)
        pred_normals = VR.integrate(normals, weights, samples.mask)

        # background (reference surf.py:730-748)
        if self.bg_model is None:
            rgb_bg = jnp.broadcast_to(self.bg_color, rgb_fg.shape)
            depth_bg = raycast["t_far"]
        else:
            bg_res = render_contracted_bg(
                lambda p, d, i: self.bg_model.apply(params["bg"], p, d, i),
                raycast, hp.nr_samples_bg, k_bg if train else None, iter_nr,
            )
            rgb_bg = bg_res["pred_rgb"]
            depth_bg = bg_res["median_depth"]

        rgb = rgb_fg + rgb_bg * bg_transmittance
        depth = depth_fg * weights_sum + depth_bg * bg_transmittance

        return {
            "rgb": rgb,
            "rgb_fg": rgb_fg,
            "rgb_bg": rgb_bg,
            "depth": depth,
            "depth_fg": depth_fg,
            "weights_sum": weights_sum,
            "bg_transmittance": bg_transmittance,
            "normals": pred_normals,
            "nr_samples": samples.samples_per_ray(),
            "samples": samples,
            "samples_sdf_grad": sdf_grad,
        }

    # ---- losses -------------------------------------------------------------

    def _data_loss(self, params, grid, batch, iter_nr, key):
        """Data-phase loss (reference surf.py:934-1105)."""
        hp = self.hp
        k_render, k_pts, k_curv = jax.random.split(key, 3)
        res = self.render_rays(
            params, grid, batch["rays_o"], batch["rays_d"], iter_nr, k_render, True
        )
        pred_rgb = res["rgb"]
        if hp.nr_training_rays_per_pixel > 1:
            pred_rgb = pred_rgb.reshape(-1, hp.nr_training_rays_per_pixel, 3).mean(1)

        if hp.is_training_masked:
            loss_rgb = L.loss_l1(batch["gt_rgb"], pred_rgb, mask=batch["gt_mask"])
        else:
            loss_rgb = L.loss_l1(batch["gt_rgb"], pred_rgb)
        loss = loss_rgb

        # random-point regularizers
        nr_points = 1024
        r_points = self.bounding_primitive.get_random_points_inside(k_pts, nr_points)
        r_sdf, _, r_grad = self._sdf_with_grad(params, r_points, iter_nr)

        samples = res["samples"]
        s_mask = samples.mask
        s_grad = res["samples_sdf_grad"]

        loss_eik = jnp.asarray(0.0)
        if hp.eikonal_weight > 0.0:
            loss_eik = L.eikonal_loss(r_grad) * hp.eikonal_weight
            # masked eikonal on the rendered sample points
            norms = safe_norm(s_grad, axis=-1)
            err = jnp.where(s_mask, (norms - 1.0) ** 2, 0.0)
            denom = jnp.clip(jnp.sum(s_mask), 1)
            loss_eik = loss_eik + (jnp.sum(err) / denom) * hp.eikonal_weight
            loss = loss + loss_eik

        loss_offsurface = jnp.asarray(0.0)
        if hp.offsurface_weight > 0.0:
            loss_offsurface = L.offsurface_loss(r_sdf) * hp.offsurface_weight
            loss = loss + loss_offsurface

        # curvature with the global reduction schedule (reference surf.py:1041-1079)
        loss_curv = jnp.asarray(0.0)
        if hp.curvature_weight > 0.0:
            if hp.reduce_curv_start_iter is not None and hp.reduce_curv_end_iter is not None:
                gw = map_range_val(
                    iter_nr, hp.reduce_curv_start_iter, hp.reduce_curv_end_iter, 1.0, 0.0
                )
            else:
                gw = 1.0
            curv = get_sdf_curvature(
                lambda p: self._sdf_fn(params, p, iter_nr),
                samples.positions(), s_grad, k_curv,
                grad_fn=lambda p: self._sdf_grad_only(params, p, iter_nr),
            )
            curv = jnp.where(s_mask[..., None], curv, 0.0)
            denom = jnp.clip(jnp.sum(s_mask), 1)
            loss_curv = (jnp.sum(curv) / denom) * hp.curvature_weight * gw
            loss = loss + loss_curv

        loss_lipshitz = jnp.asarray(0.0)
        if (
            hp.lipshitz_weight > 0.0
            and hp.rgb_use_lipshitz_mlp
            and hp.reduce_curv_start_iter is not None
        ):
            from volsurfs_tpu.models.mlp import LipshitzMLP

            bound = LipshitzMLP.lipshitz_bound_full(
                params["rgb"]["params"]["LipshitzMLP_0"]
            )
            w = jnp.where(iter_nr >= hp.reduce_curv_start_iter, hp.lipshitz_weight, 0.0)
            loss_lipshitz = bound * w
            loss = loss + loss_lipshitz

        losses = {
            "loss": loss,
            "rgb": loss_rgb,
            "eikonal": loss_eik,
            "curvature": loss_curv,
            "offsurface_high_sdf": loss_offsurface,
            "lipshitz": loss_lipshitz,
            "nr_samples_total": jnp.sum(res["nr_samples"]) if "nr_samples" in res else jnp.asarray(0),
        }
        return loss, losses

    def _sphere_init_loss(self, params, iter_nr, key):
        """Sphere-init phase (reference surf.py:888-932)."""
        points = self.bounding_primitive.get_random_points_inside(key, 30000)
        sdf_gt = (
            jnp.linalg.norm(points, axis=-1, keepdims=True) - self.init_sphere_radius
        )
        sdf_pred, _, grad = self._sdf_with_grad(params, points, iter_nr)
        loss_sdf = jnp.mean((sdf_pred - sdf_gt) ** 2)
        loss_eik = jnp.mean((safe_norm(grad, axis=-1) - 1.0) ** 2)
        loss = loss_sdf + loss_eik * 1e-3
        return loss, {"loss": loss, "sdf": loss_sdf, "eikonal": loss_eik}

    # ---- jitted steps -------------------------------------------------------

    def _get_jitted(self, name, fn, **jit_kwargs):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, **jit_kwargs)
        return self._jit_cache[name]

    def train_step(self, state: TrainState, batch) -> tuple[TrainState, dict]:
        """One optimization step; phase chosen statically from the host-side
        iteration counter (no recompiles: each phase compiles once)."""
        it = int(state.iter_nr)
        in_sphere_init = it < self.hp.init_phase_end_iter

        if in_sphere_init:

            def step_fn(state, batch):
                k, k_loss = jax.random.split(state.key)

                def loss_fn(params):
                    return self._sphere_init_loss(params, state.iter_nr, k_loss)

                (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params
                )
                losses = {**losses, **grad_norms(grads)}
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return (
                    state.replace(
                        params=params,
                        opt_state=opt_state,
                        key=k,
                        iter_nr=state.iter_nr + 1,
                    ),
                    losses,
                )

            jitted = self._get_jitted("sphere_init_step", step_fn, donate_argnums=(0,))
        else:

            def step_fn(state, batch):
                k, k_loss = jax.random.split(state.key)

                def loss_fn(params):
                    return self._data_loss(
                        params, state.grid, batch, state.iter_nr, k_loss
                    )

                (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params
                )
                losses = {**losses, **grad_norms(grads)}
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return (
                    state.replace(
                        params=params,
                        opt_state=opt_state,
                        key=k,
                        iter_nr=state.iter_nr + 1,
                    ),
                    losses,
                )

            jitted = self._get_jitted("data_step", step_fn, donate_argnums=(0,))
        return jitted(state, batch)

    def update_occupancy_grid(self, state: TrainState) -> TrainState:
        """Re-evaluate |sdf| on the grid and refresh occupancy
        (reference surf.py:246-302; every 50 iters, surf.py:802-808)."""
        if state.grid is None:
            return state

        def update_fn(state):
            grid = state.grid
            pts = grid.get_grid_samples()  # voxel centers

            # chunked evaluation to bound peak memory (reference batches at
            # 256*256*100 points, surf.py:262)
            n = pts.shape[0]
            chunk = min(n, 65536)
            n_chunks = n // chunk

            def eval_chunk(pts_chunk):
                sdf, _ = self._sdf_fn(
                    jax.lax.stop_gradient(state.params), pts_chunk, state.iter_nr
                )
                return jnp.abs(sdf[..., 0])

            sdf_abs = jax.lax.map(
                eval_chunk, pts[: n_chunks * chunk].reshape(n_chunks, chunk, 3)
            ).reshape(-1)
            if n_chunks * chunk < n:
                sdf_abs = jnp.concatenate([sdf_abs, eval_chunk(pts[n_chunks * chunk :])])

            variance = jnp.minimum(0.8, self._variance(state.iter_nr))
            beta = get_logistic_beta_from_variance(variance)
            grid = grid.update_values(sdf_abs, decay=0.0)
            grid = grid.update_occupancy_with_sdf(beta, occupancy_thresh=1e-4)
            return state.replace(grid=grid)

        jitted = self._get_jitted("update_occupancy", update_fn)
        return jitted(state)

    def render_rays_sphere_traced(
        self,
        params,
        grid,
        rays_o,
        rays_d,
        iter_nr,
        max_st_steps: int = 24,
        converged_dist_tresh: float = 1e-3,
        min_step: float = 8e-3,
    ):
        """Test-time surface rendering by sphere tracing the SDF
        (reference surf.py:551-647 render_fg_sphere_traced + the
        render_sphere_traced eval toggle at :721-761).

        One SDF eval per trace step on all rays in lockstep, then a single
        shade at the converged hit points — no per-sample integration, so
        eval frames cost ~max_st_steps SDF evals instead of
        samples_per_ray SDF+RGB evals. Crossings are bracket-refined by
        false position inside the same loop (see ops/sphere_tracing.py),
        which is what makes the low default step cap viable (measured at
        256²: 26.5 dB at 24 steps vs 26.1 at 100). When ``grid`` is given
        the trace is grid-assisted (reference OccupancyGridGPU.cuh:505-584):
        rays start at the occupied AABB and skip empty voxels/blocks."""
        from volsurfs_tpu.ops.sphere_tracing import sphere_trace

        raycast = RC.intersect_bounding_primitive(
            self.bounding_primitive, rays_o, rays_d
        )
        trace = sphere_trace(
            lambda p: self._sdf_fn(params, p, iter_nr),
            rays_o,
            rays_d,
            self.bounding_primitive,
            nr_sphere_traces=max_st_steps,
            sdf_converged_tresh=converged_dist_tresh,
            occupancy_grid=grid,
            min_step=min_step,
        )
        hit = trace["is_hit"][:, None]
        pos = trace["positions"]

        # shade at the hit points (misses shade too — lockstep — and are
        # masked out of the composite)
        _, geom_feat, grad = self._sdf_with_grad(params, pos, iter_nr)
        normals = safe_normalize(grad)
        rgb_surf = self._rgb_fn(params, pos, rays_d, normals, geom_feat, iter_nr)

        weights_sum = hit.astype(jnp.float32)
        bg_transmittance = 1.0 - weights_sum
        if self.bg_model is None:
            rgb_bg = jnp.broadcast_to(self.bg_color, rgb_surf.shape)
            depth_bg = raycast["t_far"]
        else:
            bg_res = render_contracted_bg(
                lambda p, d, i: self.bg_model.apply(params["bg"], p, d, i),
                raycast, self.hp.nr_samples_bg, None, iter_nr,
            )
            rgb_bg = bg_res["pred_rgb"]
            depth_bg = bg_res["median_depth"]

        rgb = jnp.where(hit, rgb_surf, rgb_bg)
        depth = jnp.where(hit, trace["z"], depth_bg)
        return {
            "rgb": rgb,
            "rgb_fg": jnp.where(hit, rgb_surf, 0.0),
            "depth": depth,
            "normals": jnp.where(hit, normals, 0.0),
            "weights_sum": weights_sum,
            "bg_transmittance": bg_transmittance,
        }

    def make_render_fn(self, chunk_size: int = 4096, sphere_traced: bool = False):
        """Jitted eval-mode ray renderer for full-frame rendering.

        ``sphere_traced=True`` switches to the fast surface path (reference
        render_sphere_traced toggle, surf.py:721-761)."""
        if sphere_traced:

            def render_st(params, grid, rays_o, rays_d, iter_nr):
                res = self.render_rays_sphere_traced(
                    params, grid, rays_o, rays_d, iter_nr
                )
                return {
                    "rgb": res["rgb"],
                    "depth": res["depth"],
                    "normals": res["normals"],
                    "weights_sum": res["weights_sum"],
                }

            return self._get_jitted("render_sphere_traced", render_st)

        # XLA's pass pipeline on the fused sampler graph compiles
        # super-linearly in the ray-chunk size (measured: ~1 min at 4096
        # rays, >25 min at the reference config's 16384 test chunk, with
        # every stage alone compiling in 1-20 s; stage-seam optimization
        # barriers only soften it). Per-ray THROUGHPUT is flat in chunk
        # size, so big chunks buy nothing — lax.map over <=4096-ray
        # sub-chunks gives any requested chunk size the compile time of
        # the 4096 graph at unchanged speed.
        MAX_FUSED = 4096

        def render_one(params, grid, rays_o, rays_d, iter_nr):
            res = self.render_rays(params, grid, rays_o, rays_d, iter_nr, None, False)
            return {
                "rgb": res["rgb"],
                "depth": res["depth"],
                "normals": res["normals"],
                "weights_sum": res["weights_sum"],
            }

        def render(params, grid, rays_o, rays_d, iter_nr):
            R = rays_o.shape[0]
            if R <= MAX_FUSED or R % MAX_FUSED != 0:
                return render_one(params, grid, rays_o, rays_d, iter_nr)
            n_sub = R // MAX_FUSED
            out = jax.lax.map(
                lambda od: render_one(params, grid, od[0], od[1], iter_nr),
                (
                    rays_o.reshape(n_sub, MAX_FUSED, 3),
                    rays_d.reshape(n_sub, MAX_FUSED, 3),
                ),
            )
            return {k: v.reshape(R, *v.shape[2:]) for k, v in out.items()}

        return self._get_jitted("render", render)
