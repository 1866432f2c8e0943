"""HoloDiffusionModel — the central pipeline (view pooling -> bootstrapped
two-pass diffusion -> multi-pass EA rendering -> photometric losses).

TPU-native rebuild of the reference HoloDiffusionModel
(holo_diffusion_model.py:44-634, subclass of Implicitron GenericModel). Key
idiomatic translations (SURVEY.md §7):

  * LazyLinear pooled-feature mapper -> explicit input dim computed from the
    extractor+aggregator config (kills the warm-up pass, experiment.py:234-247);
  * dynamic `safe_slice_` source/target split -> static (n_targets, n_sources)
    slices; same-sequence batching is the loader's contract;
  * `np.random.uniform() < bootstrap_prob` python branch
    (holo_diffusion_model.py:401-403) -> both denoise passes computed, output
    selected by a PRNG bernoulli `jnp.where` (one compiled program; the second
    UNet pass at 16^3 is cheap relative to rendering);
  * MASK_SAMPLE variable-ray multinomial -> fixed n_rays categorical;
  * voxel grids are channels-last (r, r, r, C); one grid per device
    (holo_diffusion_model.py:326).

forward returns a preds dict: rendered passes, ray bundle, view metrics with
the `loss_prev_stage^k_*` cascade, splatted/reshaped image renders, and the
weighted `objective` (no DDP unused-param hack needed under jax.grad).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.cameras import PerspectiveCameras
from ..geometry.rays import (
    RayBundle,
    sample_rays_from_mask,
    sample_rays_full_grid,
)
from ..ops.splat import rasterize_sparse_rays
from ..ops.voxel import voxel_coord_grid
from . import diffusion as gd
from .feature_extractor import ResNetFeatureExtractor
from .implicit import VoxelGridImplicitFunction
from .metrics import (
    as_unit_float,
    get_objective,
    multipass_view_metrics,
    preprocess_input,
)
from .renderer import multipass_ea_render
from .unet3d import UNetModel3D
from .view_pooler import ViewPooler

_xavier = nn.initializers.xavier_uniform()

DEFAULT_LOSS_WEIGHTS = {
    "loss_rgb_mse": 1.0,
    "loss_prev_stage_rgb_mse": 1.0,
    "loss_prev_stage_prev_stage_rgb_mse": 1.0,
    "loss_mask_bce": 0.0,
    "loss_prev_stage_mask_bce": 0.0,
}


class HoloDiffusionModel(nn.Module):
    # ---- voxel grid (holo_diffusion_model.py:47-52)
    resol: int = 16
    volume_extent: float = 8.0
    feature_size: int = 64
    num_passes: int = 2

    # ---- 3D UNet (net_3d_SimpleUnet3D_args)
    net_3d_enabled: bool = True
    net_3d_args: Optional[dict] = None

    # ---- diffusion (diffusion_args)
    diffusion_enabled: bool = True
    diffusion_args: Optional[dict] = None
    enable_bootstrap: bool = True
    bootstrap_prob: float = 0.5

    # ---- rendering/targets
    render_image_height: int = 256
    render_image_width: int = 256
    output_rasterized_mc: bool = True
    mask_images: bool = True
    mask_depths: bool = True
    mask_threshold: float = 0.5
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    n_train_target_views: int = 6
    sampling_mode_training: str = "mask_sample"
    sampling_mode_evaluation: str = "full_grid"
    chunk_size_grid: int = 0  # eval ray chunking (hydrant.yaml:112)

    # ---- ray sampler (raysampler_AdaptiveRaySampler_args)
    n_pts_per_ray_training: int = 64
    n_pts_per_ray_evaluation: int = 64
    n_rays_per_image: int = 1024
    stratified_point_sampling_training: bool = True
    stratified_point_sampling_evaluation: bool = False
    scene_extent: float = 4.0
    scene_center: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # ---- renderer (renderer_HoloMultiPassEmissionAbsorptionRenderer_args)
    n_pts_per_ray_fine_training: int = 16
    n_pts_per_ray_fine_evaluation: int = 16
    append_coarse_samples_to_fine: bool = True
    density_noise_std_train: float = 1.0
    surface_thickness: int = 1
    background_opacity: float = 1e10
    replicate_last_interval: bool = False
    density_relu: bool = True

    # ---- view pooling
    view_pooler_enabled: bool = True
    image_feature_extractor_args: Optional[dict] = None
    view_pooler_args: Optional[dict] = None

    # ---- implicit function
    render_normals: bool = False
    render_mlp_args: Optional[dict] = None
    sampler: str = "auto"  # voxel sampling strategy (see models/implicit.py)
    sampler_precision: str = "default"  # fused-sampler MXU precision
    collapse_density: str = "auto"  # fold the density MLP into the sampling
    fuse_decode: str = "auto"  # one-kernel sample+decode (models/implicit.py)

    loss_weights: Optional[Dict[str, float]] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.view_pooler_enabled:
            self.image_feature_extractor = ResNetFeatureExtractor(
                **(self.image_feature_extractor_args or {}), name="feature_extractor"
            )
            self.view_pooler = ViewPooler(
                **(self.view_pooler_args or {}), name="view_pooler"
            )
            # explicit input dim — replaces LazyLinearWithXavierInit
            # (holo_diffusion_model.py:113)
            self.pooled_feature_mapper = nn.Dense(
                self.feature_size,
                kernel_init=_xavier,
                bias_init=nn.initializers.zeros,
                name="pooled_feature_mapper",
            )
        if self.net_3d_enabled:
            args = dict(self.net_3d_args or {})
            args.setdefault("model_channels", 64)
            args.setdefault("num_res_blocks", 2)
            args.setdefault("num_heads", 2)
            args.setdefault("channel_mult", (1, 1, 2, 4, 8))
            args.setdefault("attention_resolutions", (4, 8))
            self.net_3d = UNetModel3D(
                in_channels=self.feature_size,
                out_channels=self.feature_size,
                dtype=self.dtype,
                **args,
                name="net_3d",
            )
        self.implicit_function = VoxelGridImplicitFunction(
            resol=self.resol,
            volume_extent=self.volume_extent,
            n_hidden=self.feature_size,
            feature_dim=0,  # no extra rendered features (holo_diffusion_model.py:157)
            render_normals=self.render_normals,
            render_mlp_args=self.render_mlp_args,
            sampler=self.sampler,
            sampler_precision=self.sampler_precision,
            collapse_density=self.collapse_density,
            fuse_decode=self.fuse_decode,
            name="implicit_function",
        )
        if self.diffusion_enabled:
            self.schedule = gd.make_named_schedule_from_config(self.diffusion_args)

    # ------------------------------------------------------------------
    # pipeline pieces (each usable standalone via apply(method=...))
    # ------------------------------------------------------------------

    def apply_net_3d(self, x, timesteps):
        """Raw denoiser — exposed for external sampling loops."""
        return self.net_3d(x, timesteps)

    def pool_features(
        self,
        image_rgb: jnp.ndarray,
        cameras: PerspectiveCameras,
        fg_probability: Optional[jnp.ndarray] = None,
        mask_crop: Optional[jnp.ndarray] = None,
        prerescaled: bool = False,
    ) -> jnp.ndarray:
        """Views -> voxel grid (holo_diffusion_model.py:327-374).

        image_rgb: (S, H, W, 3) SOURCE views (already preprocessed);
        prerescaled: images arrive at the extractor's post-rescale resolution
        (compact-source batches, data/compact.py) — skip the device resize.
        Returns (resol, resol, resol, feature_size) in [-1, 1] (tanh).
        """
        image_rgb = as_unit_float(image_rgb)
        fg_probability = as_unit_float(fg_probability)
        mask_crop = as_unit_float(mask_crop)
        img_feats = self.image_feature_extractor(
            image_rgb, fg_probability, rescale_done=prerescaled
        )
        pts = voxel_coord_grid(self.resol, self.volume_extent).reshape(-1, 3)
        pooled = self.view_pooler(img_feats, cameras, pts, mask_crop)  # (N, F)
        v = self.pooled_feature_mapper(pooled)
        v = jnp.tanh(v)  # squash to [-1, 1] (holo_diffusion_model.py:373)
        return v.reshape(self.resol, self.resol, self.resol, self.feature_size)

    def denoise(
        self,
        voxel_features: jnp.ndarray,
        training: bool,
        rng: Optional[jax.Array],
        timesteps: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """The diffusion mechanism (holo_diffusion_model.py:385-426).

        voxel_features: (1, r, r, r, C) in [-1, 1].
        timesteps: optional (2,) int32 — externally sampled (t, t_bootstrap),
        e.g. from the loss-second-moment sampler whose state lives in the
        TrainState (parallel/train_step.py). None -> uniform sampling here
        (reference default, holo_diffusion_model.py:387).
        """
        aux: Dict[str, jnp.ndarray] = {}
        if not self.net_3d_enabled:
            return voxel_features, aux

        model_fn = lambda x, t: self.net_3d(x, t)

        if self.diffusion_enabled and training:
            rng_t, rng_n, rng_t2, rng_n2, rng_b = jax.random.split(rng, 5)
            if timesteps is None:
                t, _ = gd.uniform_sample_timesteps(self.schedule, 1, rng_t)
            else:
                t = timesteps[:1]
            noise = jax.random.normal(rng_n, voxel_features.shape)
            x_t = gd.q_sample(self.schedule, voxel_features, t, noise)
            aux["x_t"] = x_t
            aux["timesteps"] = t
            v = gd.p_mean_variance(
                self.schedule, model_fn, x_t, t, clip_denoised=True
            )["pred_xstart"]

            if self.enable_bootstrap:
                # Bootstrapped second pass (holo_diffusion_model.py:401-418):
                # computed unconditionally, selected by a bernoulli jnp.where
                # so the whole step stays one compiled program.
                # (A lax.cond / nn.cond that skips the second UNet pass on
                # ~50% of steps was tried and reverted: linen modules inside
                # raw lax.cond leak tracers, and the lifted nn.cond variant
                # aborts XLA:CPU under shard_map+scan+grad — the extra pass
                # costs ~2 ms of a 57 ms step, not worth a fragile branch.)
                if timesteps is None:
                    t2, _ = gd.uniform_sample_timesteps(self.schedule, 1, rng_t2)
                else:
                    t2 = timesteps[1:]
                noise2 = jax.random.normal(rng_n2, v.shape)
                x_t2 = gd.q_sample(self.schedule, v, t2, noise2)
                v2 = gd.p_mean_variance(
                    self.schedule, model_fn, x_t2, t2, clip_denoised=True
                )["pred_xstart"]
                take_boot = (
                    jax.random.uniform(rng_b, ()) < self.bootstrap_prob
                )
                v = jnp.where(take_boot, v2, v)
                # exposed so the train step can (a) scale the objective by the
                # bootstrap timestep's importance weight only when the branch
                # was taken and (b) gate the loss-aware sampler's credit for
                # t_bootstrap on the same condition (timestep_sampler.py:48-64)
                aux["take_boot"] = take_boot
            return v, aux

        # EVALUATION (or no diffusion): pass through the denoiser at t=0
        # (holo_diffusion_model.py:420-426 — yes, also for generated samples).
        t0 = jnp.zeros((voxel_features.shape[0],), jnp.int32)
        v = jnp.tanh(model_fn(voxel_features, t0))
        return v, aux

    def encode_eval(
        self,
        camera: PerspectiveCameras,
        image_rgb: jnp.ndarray,
        fg_probability: Optional[jnp.ndarray] = None,
        mask_crop: Optional[jnp.ndarray] = None,
        prerescaled: bool = False,
    ) -> jnp.ndarray:
        """Preprocess + pool + EVALUATION denoise -> (r, r, r, C) voxel grid.

        The encode half of the EVALUATION forward (holo_diffusion_model.py:
        327-374 + 420-426), exposed so chunked/flyaround rendering can reuse
        one grid across many target cameras without re-pooling.
        `image_rgb`: (S, H, W, 3) SOURCE views only. With `prerescaled` the
        sources arrive host-preprocessed (compact mode, data/compact.py):
        masking/composite already applied and already at the extractor's
        input resolution — skip the device-side re-mask and resize.
        """
        if not prerescaled:
            image_rgb, fg_probability, _ = preprocess_input(
                image_rgb,
                fg_probability,
                None,
                self.mask_images,
                self.mask_depths,
                self.mask_threshold,
                self.bg_color,
            )
        grid = self.pool_features(
            image_rgb, camera, fg_probability, mask_crop,
            prerescaled=prerescaled,
        )
        v, _ = self.denoise(grid[None], training=False, rng=None)
        return v[0]

    def query_density(
        self, voxel_grid: jnp.ndarray, points_world: jnp.ndarray
    ) -> jnp.ndarray:
        """RAW (pre-relu) densities at world points, (..., 1) -> (...,).

        One batched implicit-function call — the probe pass of the eval-only
        occupancy-grid empty-space skip (ops/occupancy.py)."""
        d, _, _ = self.implicit_function(
            voxel_grid, points_world[..., None, :], None
        )
        return d[..., 0, 0]

    def render_rays(
        self,
        voxel_grid: jnp.ndarray,
        ray_bundle: RayBundle,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Multi-pass EA render of a prepared ray bundle — the chunkable inner
        renderer (GenericModel's chunked eval, `chunk_size_grid`,
        hydrant.yaml:112; host-side chunk loop in render_eval.py)."""

        def implicit_fn(points, directions, pass_number):
            return self.implicit_function(voxel_grid, points, directions)

        n_fine = (
            self.n_pts_per_ray_fine_training
            if training
            else self.n_pts_per_ray_fine_evaluation
        )
        stratified = (
            self.stratified_point_sampling_training
            if training
            else self.stratified_point_sampling_evaluation
        )
        return multipass_ea_render(
            implicit_fn,
            ray_bundle,
            n_pts_per_ray_fine=n_fine,
            rng=rng,
            training=training,
            density_noise_std_train=self.density_noise_std_train,
            stratified_sampling_coarse=stratified,
            append_coarse_samples_to_fine=self.append_coarse_samples_to_fine,
            surface_thickness=self.surface_thickness,
            background_opacity=self.background_opacity,
            replicate_last_interval=self.replicate_last_interval,
            density_relu=self.density_relu,
            num_passes=self.num_passes,
        )

    def render(
        self,
        voxel_grid: jnp.ndarray,
        cameras: PerspectiveCameras,
        training: bool,
        rng: Optional[jax.Array],
        mask_crop: Optional[jnp.ndarray] = None,
    ):
        """Raysample + multi-pass EA render of one voxel grid into `cameras`.

        voxel_grid: (r, r, r, C). Returns (rendered, ray_bundle).
        """
        sampling_mode = (
            self.sampling_mode_training if training else self.sampling_mode_evaluation
        )
        stratified = (
            self.stratified_point_sampling_training
            if training
            else self.stratified_point_sampling_evaluation
        )
        n_pts = (
            self.n_pts_per_ray_training if training else self.n_pts_per_ray_evaluation
        )
        rng_rays, rng_render = (
            jax.random.split(rng) if rng is not None else (None, None)
        )

        if sampling_mode == "mask_sample":
            assert mask_crop is not None and rng is not None
            ray_bundle = sample_rays_from_mask(
                cameras,
                mask_crop[..., 0] if mask_crop.ndim == 4 else mask_crop,
                self.n_rays_per_image,
                n_pts,
                rng_rays,
                self.scene_center,
                self.scene_extent,
                stratified,
            )
        elif sampling_mode == "full_grid":
            ray_bundle = sample_rays_full_grid(
                cameras,
                self.render_image_height,
                self.render_image_width,
                n_pts,
                self.scene_center,
                self.scene_extent,
                rng_rays if stratified else None,
            )
        else:
            raise ValueError(f"unknown sampling mode {sampling_mode}")

        rendered = self.render_rays(voxel_grid, ray_bundle, training, rng_render)
        return rendered, ray_bundle

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        *,
        camera: PerspectiveCameras,
        image_rgb: Optional[jnp.ndarray] = None,
        fg_probability: Optional[jnp.ndarray] = None,
        mask_crop: Optional[jnp.ndarray] = None,
        depth_map: Optional[jnp.ndarray] = None,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        voxel_features: Optional[jnp.ndarray] = None,
        timesteps: Optional[jnp.ndarray] = None,
        src_image_rgb: Optional[jnp.ndarray] = None,
        src_fg_probability: Optional[jnp.ndarray] = None,
        src_mask_crop: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """The central pipeline (holo_diffusion_model.py:201-540).

        image_rgb: (B, H, W, 3) — first n_targets are render targets, the rest
        are pooling sources (all same sequence; loader contract). Either
        image_rgb or voxel_features (1, r, r, r, C) must be given; sampling
        new grids happens OUTSIDE the forward (see sampling.py) so the
        1000-step loop is not embedded in every eval trace.

        Compact-source mode (data/compact.py): when src_image_rgb is given,
        image_rgb holds ONLY the n_targets target frames and src_* hold the
        pooling sources already host-preprocessed (masked + rescaled to the
        extractor's input resolution); camera still covers all frames,
        targets first.
        """
        compact = src_image_rgb is not None
        image_rgb, fg_probability, depth_map = preprocess_input(
            image_rgb,
            fg_probability,
            depth_map,
            self.mask_images,
            self.mask_depths,
            self.mask_threshold,
            self.bg_color,
        )
        mask_crop = as_unit_float(mask_crop)

        batch_size = camera.batch_size
        if compact:
            # the loader already performed the target/source split with the
            # SAME arithmetic (SourceCompactor.n_targets)
            n_targets = image_rgb.shape[0]
            assert n_targets < batch_size, (
                "compact batch: camera must cover targets + sources"
            )
        elif training:
            n_targets = (
                batch_size
                if self.n_train_target_views <= 0
                else min(self.n_train_target_views, batch_size)
            )
        else:
            n_targets = 1
        if not compact and batch_size <= n_targets:
            n_targets = 1

        def targets(x):
            return None if x is None else x[:n_targets]

        def sources(x):
            if x is None:
                return None
            return x[n_targets:] if batch_size > 1 else x

        target_cameras = camera[:n_targets]

        preds: Dict[str, Any] = {}
        rng_pool = rng_denoise = rng_render = None
        if rng is not None:
            rng_pool, rng_denoise, rng_render = jax.random.split(rng, 3)

        # ---- view pooling (holo_diffusion_model.py:327-374)
        if compact:
            assert self.view_pooler_enabled
            assert voxel_features is None
            # sources arrive host-preprocessed: masking + rescale already
            # applied (data/compact.py mirrors preprocess_input's order), so
            # skip the device-side re-mask and the extractor's resize
            grid = self.pool_features(
                src_image_rgb,
                camera[n_targets:],
                src_fg_probability,
                src_mask_crop,
                prerescaled=True,
            )
            voxel_features = grid[None]
        elif image_rgb is not None:
            assert self.view_pooler_enabled
            assert voxel_features is None
            grid = self.pool_features(
                sources(image_rgb),
                camera[n_targets:] if batch_size > 1 else camera,
                sources(fg_probability),
                sources(mask_crop),
            )
            voxel_features = grid[None]
        if voxel_features is None:
            raise ValueError(
                "Provide image_rgb or voxel_features; sample grids with "
                "holo_diffusion_tpu.sampling.sample_random_voxel_features()."
            )

        # ---- diffusion mechanism
        voxel_features, diffusion_aux = self.denoise(
            voxel_features, training, rng_denoise, timesteps
        )
        preds.update({f"diffusion_{k}": v for k, v in diffusion_aux.items()})
        preds["voxel_features"] = voxel_features

        # ---- render into target cameras
        rendered, ray_bundle = self.render(
            voxel_features[0],
            target_cameras,
            training,
            rng_render,
            targets(mask_crop),
        )
        preds["rendered"] = rendered
        preds["ray_bundle"] = ray_bundle

        # ---- metrics
        preds.update(
            multipass_view_metrics(
                rendered,
                ray_bundle.xys,
                targets(image_rgb),
                targets(depth_map),
                targets(fg_probability),
            )
        )

        # ---- image-space renders
        sampling_mode = (
            self.sampling_mode_training if training else self.sampling_mode_evaluation
        )
        if sampling_mode == "mask_sample":
            if self.output_rasterized_mc:
                (
                    preds["images_render"],
                    preds["depths_render"],
                    preds["masks_render"],
                ) = rasterize_sparse_rays(
                    ray_bundle.xys,
                    rendered.features[..., :3],
                    (self.render_image_height, self.render_image_width),
                    rendered.depths,
                    rendered.masks,
                )
        else:
            H, W = self.render_image_height, self.render_image_width
            preds["images_render"] = rendered.features[..., :3].reshape(
                n_targets, H, W, 3
            )
            preds["depths_render"] = rendered.depths.reshape(n_targets, H, W, 1)
            preds["masks_render"] = rendered.masks.reshape(n_targets, H, W, 1)
            if rendered.normals is not None:
                preds["normals_render"] = rendered.normals.reshape(
                    n_targets, H, W, 3
                )

        weights = (
            self.loss_weights if self.loss_weights is not None else DEFAULT_LOSS_WEIGHTS
        )
        preds["objective"] = get_objective(preds, weights)
        return preds
