"""View metrics + input preprocessing.

TPU-native rebuild of Implicitron's ViewMetrics / preprocess_input
(reference use: holo_diffusion_model.py:248-256 (preprocess), 480-497
(view/regularization metrics); log-var names at holo_diffusion_model.py:78-109
with the `loss_prev_stage^k_*` cascade from multi-pass rendering).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.image import bilinear_sample_ndc


def as_unit_float(x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Normalize loader dtypes at the model boundary: uint8 -> f32/255,
    anything else non-f32 (e.g. f16 depth) -> f32. The host scene cache can
    then hold compact uint8 frames (4x less RAM + H2D transfer; the convert
    runs on-device inside the jit). No-op for float32 inputs."""
    if x is None:
        return None
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype != jnp.float32:
        return x.astype(jnp.float32)
    return x


def preprocess_input(
    image_rgb: Optional[jnp.ndarray],
    fg_probability: Optional[jnp.ndarray],
    depth_map: Optional[jnp.ndarray],
    mask_images: bool,
    mask_depths: bool,
    mask_threshold: float = 0.5,
    bg_color=(1.0, 1.0, 1.0),
):
    """Mask images/depths with thresholded fg (white background).

    image_rgb: (B, H, W, 3); fg_probability: (B, H, W, 1); depth: (B, H, W, 1).
    Inputs may arrive as uint8 (image/fg) or float16 (depth) from the compact
    host cache — normalized here (see as_unit_float).
    """
    image_rgb = as_unit_float(image_rgb)
    fg_probability = as_unit_float(fg_probability)
    depth_map = as_unit_float(depth_map)
    fg_mask = None
    if fg_probability is not None:
        fg_mask = (fg_probability > mask_threshold).astype(jnp.float32)
    if mask_images and image_rgb is not None and fg_mask is not None:
        bg = jnp.asarray(bg_color, jnp.float32)
        image_rgb = image_rgb * fg_mask + bg * (1.0 - fg_mask)
    if mask_depths and depth_map is not None and fg_mask is not None:
        depth_map = depth_map * fg_mask
    return image_rgb, fg_mask, depth_map


def _sample_at_rays(image: jnp.ndarray, xys: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, H, W, C) images at per-ray NDC xys (B, N, 2) -> (B, N, C)."""
    return jax.vmap(bilinear_sample_ndc)(image, xys)


def calc_psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _huber(diff_sq: jnp.ndarray, scaling: float = 0.03) -> jnp.ndarray:
    """Implicitron huber on squared error (utils.metric_utils.huber)."""
    diff = jnp.sqrt(diff_sq + 1e-12)
    return jnp.where(
        diff < scaling, diff_sq * 0.5 / scaling, diff - 0.5 * scaling
    )


def _wmean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    if w is None:
        return jnp.mean(x)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w * jnp.ones_like(x)), 1e-6)


def view_metrics(
    features: jnp.ndarray,
    depths: jnp.ndarray,
    masks: jnp.ndarray,
    xys: jnp.ndarray,
    image_rgb: Optional[jnp.ndarray],
    depth_map: Optional[jnp.ndarray],
    fg_probability: Optional[jnp.ndarray],
    prefix: str = "loss_",
) -> Dict[str, jnp.ndarray]:
    """Per-pass photometric/depth/mask metrics (Implicitron ViewMetrics set:
    rgb mse/psnr(_fg)/huber, depth_abs(_fg), mask bce/neg_iou/beta_prior).

    features/depths/masks: (B, N, C/1/1) raymarched renders;
    xys: (B, N, 2) ray NDC positions; image/depth/fg: (B, H, W, *) targets.
    """
    out: Dict[str, jnp.ndarray] = {}
    if image_rgb is not None:
        rgb_gt = _sample_at_rays(image_rgb, xys)
        diff_sq = (features[..., :3] - rgb_gt) ** 2
        mse = jnp.mean(diff_sq)
        out[f"{prefix}rgb_mse"] = mse
        out[f"{prefix}rgb_psnr"] = calc_psnr(mse)
        out[f"{prefix}rgb_huber"] = jnp.mean(_huber(diff_sq))
        if fg_probability is not None:
            fg = _sample_at_rays(fg_probability, xys)
            mse_fg = _wmean(diff_sq, fg)
            out[f"{prefix}rgb_mse_fg"] = mse_fg
            out[f"{prefix}rgb_psnr_fg"] = calc_psnr(mse_fg)

    if fg_probability is not None:
        fg = _sample_at_rays(fg_probability, xys)
        m = jnp.clip(masks, 1e-6, 1.0 - 1e-6)
        bce = -(fg * jnp.log(m) + (1 - fg) * jnp.log(1 - m))
        out[f"{prefix}mask_bce"] = jnp.mean(bce)
        inter = jnp.sum(jnp.minimum(masks, fg))
        union = jnp.sum(jnp.maximum(masks, fg))
        out[f"{prefix}mask_neg_iou"] = -(inter / jnp.maximum(union, 1e-6))
        out[f"{prefix}mask_beta_prior"] = jnp.mean(
            jnp.log(0.1 + masks) + jnp.log(0.1 + 1.0 - masks) - jnp.log(0.1)
        )

    if depth_map is not None:
        d_gt = _sample_at_rays(depth_map, xys)
        valid = (d_gt > 0).astype(jnp.float32)
        abs_err = jnp.abs(depths - d_gt)
        out[f"{prefix}depth_abs"] = _wmean(abs_err, valid)
        if fg_probability is not None:
            fg = _sample_at_rays(fg_probability, xys)
            out[f"{prefix}depth_abs_fg"] = _wmean(abs_err, valid * fg)
    return out


def multipass_view_metrics(
    rendered,
    xys: jnp.ndarray,
    image_rgb,
    depth_map,
    fg_probability,
) -> Dict[str, jnp.ndarray]:
    """Apply view_metrics to every render pass with the `prev_stage` naming
    cascade (holo_diffusion_model.py:64-108)."""
    out: Dict[str, jnp.ndarray] = {}
    stage = rendered
    prefix = "loss_"
    while stage is not None:
        out.update(
            view_metrics(
                stage.features,
                stage.depths,
                stage.masks,
                xys,
                image_rgb,
                depth_map,
                fg_probability,
                prefix=prefix,
            )
        )
        prefix = prefix + "prev_stage_"
        stage = stage.prev_stage
    return out


def get_objective(
    preds: Dict[str, jnp.ndarray], loss_weights: Dict[str, float]
) -> jnp.ndarray:
    """Weighted sum of predicted losses (GenericModel._get_objective
    equivalent; the reference's `0 * sum(params)` DDP hack is unnecessary
    under jax grad)."""
    total = jnp.asarray(0.0)
    for k, w in loss_weights.items():
        if w != 0.0 and k in preds:
            total = total + w * preds[k]
    return total
