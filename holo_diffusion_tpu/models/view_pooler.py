"""View pooling: project 3D points into source views, sample features,
aggregate across views.

TPU-native rebuild of Implicitron's ViewSampler + FeatureAggregator stack
(reference use: holo_diffusion_model.py:358-367 via `self.view_pooler`;
configs select `MLPMeanFeatureAggregator` (hydrant.yaml:184-196, in-repo at
custom_modules.py:162-293) or `AngleWeightedReductionFeatureAggregator`
(AVG+STD, apple/donut/teddybear configs)).

All shapes static; the cameras x points cartesian product of the reference
(custom_modules.py:296-334) becomes a vmap over source views.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.cameras import PerspectiveCameras, camera_centers, project_points_ndc
from ..geometry.harmonic import HarmonicEmbedding
from ..ops.image import bilinear_sample_ndc, bilinear_sample_ndc_matmul

# Feature maps at or below this pixel count are sampled via the MXU matmul
# formulation instead of 4-corner gathers (TPU gathers are row-at-a-time and
# dominate the pooling phase; the triangle-weight matmul is exact — see
# ops/image.py::bilinear_sample_ndc_matmul). 64^2 covers every ResNet stage
# map at the release scale while leaving the full-res images/masks entries
# (256^2-800^2) on the gather path, whose weight rows would not fit.
_MATMUL_SAMPLE_MAX_PIXELS = 64 * 64
from .mlp import MLPWithInputSkips

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


def sample_view_features(
    feats: Dict[str, jnp.ndarray],
    cameras: PerspectiveCameras,
    pts: jnp.ndarray,
    masks: Optional[jnp.ndarray] = None,
    masked_sampling: bool = False,
):
    """Project `pts` into every source view and bilinearly sample features.

    Args:
      feats: dict of (S, Hf, Wf, Cf) per-source feature maps (different
        resolutions allowed — NDC sampling is resolution-independent).
      cameras: S source cameras.
      pts: (N, 3) world points (one scene; voxel_batch_size=1 mirrors
        holo_diffusion_model.py:326).
      masks: optional (S, H, W, 1) mask_crop maps.

    Returns:
      feats_sampled: (S, N, sum(Cf)) concatenated over dict entries,
      masks_sampled: (S, N, 1) sampling validity (ones unless masked_sampling,
        matching `masked_sampling: false`, configs/base.yaml:166-168).
    """
    ndc = project_points_ndc(cameras, pts[None].repeat(cameras.batch_size, 0))
    xy = ndc[..., :2]  # (S, N, 2)
    in_front = (ndc[..., 2:3] > 0.0).astype(jnp.float32)

    parts = []
    for key in sorted(feats.keys()):
        fmap = feats[key]
        sample_fn = (
            bilinear_sample_ndc_matmul
            if fmap.shape[1] * fmap.shape[2] <= _MATMUL_SAMPLE_MAX_PIXELS
            else bilinear_sample_ndc
        )
        sampled = jax.vmap(sample_fn)(fmap, xy)
        parts.append(sampled)
    feats_sampled = jnp.concatenate(parts, axis=-1)

    if masked_sampling and masks is not None:
        m = jax.vmap(bilinear_sample_ndc)(masks, xy)
        masks_sampled = (m > 0.5).astype(jnp.float32) * in_front
    else:
        masks_sampled = in_front
    return feats_sampled, masks_sampled


def point_to_camera_ray_dirs(
    cameras: PerspectiveCameras, pts: jnp.ndarray
) -> jnp.ndarray:
    """Unit dirs camera-center -> point, (S, N, 3)
    (custom_modules.py:296-334, nan-safe center formula)."""
    centers = camera_centers(cameras)  # (S, 3)
    d = pts[None, :, :] - centers[:, None, :]
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


class AngleWeightedReductionFeatureAggregator(nn.Module):
    """Angle-weighted AVG+STD reduction over source views (the release
    apple/donut/teddybear aggregator; Implicitron equivalent).

    Weights: w_s = ((1 + cos(angle between source-ray and reference-ray)) / 2
    + eps)^gamma * mask, reference ray = the first source camera's (Implicitron
    uses the principal camera of the batch; exclude_target_view is forced off,
    holo_diffusion_model.py:114-116).
    """

    reduction_functions: Tuple[str, ...] = ("AVG", "STD")
    weight_by_ray_angle_gamma: float = 1.0
    min_ray_angle_weight: float = 0.1

    def get_aggregated_feature_dim(self, feat_dim: int) -> int:
        return feat_dim * len(self.reduction_functions)

    @nn.compact
    def __call__(self, feats_sampled, masks_sampled, cameras, pts):
        """feats_sampled: (S, N, F); masks_sampled: (S, N, 1); pts: (N, 3).
        Returns (N, F * n_reductions)."""
        ray_dirs = point_to_camera_ray_dirs(cameras, pts)  # (S, N, 3)
        ref = ray_dirs[:1]
        cos = jnp.sum(ray_dirs * ref, axis=-1, keepdims=True)
        w = ((1.0 + cos) / 2.0 + self.min_ray_angle_weight) ** (
            self.weight_by_ray_angle_gamma
        )
        w = w * masks_sampled  # (S, N, 1)
        w_sum = jnp.maximum(jnp.sum(w, axis=0), 1e-6)

        outs = []
        mean = jnp.sum(feats_sampled * w, axis=0) / w_sum
        for red in self.reduction_functions:
            if red == "AVG":
                outs.append(mean)
            elif red == "STD":
                var = jnp.sum(((feats_sampled - mean[None]) ** 2) * w, 0) / w_sum
                outs.append(jnp.sqrt(jnp.maximum(var, 1e-8)))
            elif red == "MAX":
                masked = jnp.where(masks_sampled > 0, feats_sampled, -jnp.inf)
                outs.append(
                    jnp.where(
                        w_sum > 1e-5, jnp.max(masked, axis=0), jnp.zeros_like(mean)
                    )
                )
            else:
                raise ValueError(f"unknown reduction {red}")
        return jnp.concatenate(outs, axis=-1)


class MLPMeanFeatureAggregator(nn.Module):
    """The in-repo "transformer-ish" aggregator (custom_modules.py:162-293):
    per-(point, view) features ++ harmonic ray dirs, masked; mean over views;
    first_sampled(x) + first_mean(mean) -> MLP -> last linear;
    softmax(channel 0 over views)-weighted sum."""

    n_hidden: int = 128
    dim_out: int = 128
    n_layers: int = 1
    n_harmonic_functions_ray: int = 3
    dtype: jnp.dtype = jnp.float32

    def get_aggregated_feature_dim(self, feat_dim: int) -> int:
        return self.dim_out

    @nn.compact
    def __call__(self, feats_sampled, masks_sampled, cameras, pts):
        """feats_sampled: (S, N, F); masks_sampled: (S, N, 1). Returns (N, dim_out)."""
        he = HarmonicEmbedding(self.n_harmonic_functions_ray)
        ray_dirs = he(point_to_camera_ray_dirs(cameras, pts))  # (S, N, 3*(2h+1))

        w = masks_sampled  # (S, N, 1) aggregation weights
        x = jnp.concatenate([feats_sampled, ray_dirs], axis=-1) * w
        denom = jnp.maximum(jnp.sum(w, axis=0), 1e-4)
        mean = jnp.sum(x * w, axis=0, keepdims=True) / denom  # weighted AVG
        mlp_in = nn.Dense(
            self.n_hidden, kernel_init=_xavier, bias_init=_zeros,
            dtype=self.dtype, name="first_sampled",
        )(x) + nn.Dense(
            self.n_hidden, kernel_init=_xavier, bias_init=_zeros,
            dtype=self.dtype, name="first_mean",
        )(mean)
        h = MLPWithInputSkips(
            n_layers=self.n_layers,
            output_dim=self.n_hidden,
            hidden_dim=self.n_hidden,
            input_skips=(),
            hidden_activation="LEAKYRELU",
            last_activation="SOFTPLUS",
            dtype=self.dtype,
            name="mlp",
        )(mlp_in)
        mlp_out = nn.Dense(
            self.dim_out, kernel_init=_xavier, bias_init=_zeros,
            dtype=self.dtype, name="last",
        )(h)
        attn = jax.nn.softmax(mlp_out[..., :1], axis=0)  # over views
        return jnp.sum(mlp_out * attn, axis=0)


class ViewPooler(nn.Module):
    """ViewSampler + FeatureAggregator (Implicitron ViewPooler equivalent)."""

    aggregator_class_type: str = "AngleWeightedReductionFeatureAggregator"
    aggregator_args: dict = None
    masked_sampling: bool = False

    def setup(self):
        args = dict(self.aggregator_args or {})
        if self.aggregator_class_type == "AngleWeightedReductionFeatureAggregator":
            self.aggregator = AngleWeightedReductionFeatureAggregator(**args)
        elif self.aggregator_class_type == "MLPMeanFeatureAggregator":
            self.aggregator = MLPMeanFeatureAggregator(**args)
        else:
            raise ValueError(self.aggregator_class_type)

    def get_aggregated_feature_dim(self, feat_dim: int) -> int:
        if self.aggregator_class_type == "MLPMeanFeatureAggregator":
            return (self.aggregator_args or {}).get("dim_out", 128)
        n_red = len(
            (self.aggregator_args or {}).get("reduction_functions", ("AVG", "STD"))
        )
        return feat_dim * n_red

    def __call__(self, feats, cameras, pts, masks=None):
        feats_sampled, masks_sampled = sample_view_features(
            feats, cameras, pts, masks, self.masked_sampling
        )
        return self.aggregator(feats_sampled, masks_sampled, cameras, pts)
