"""Monte-Carlo splatting of sparse ray renders onto an image grid.

TPU-native equivalent of pytorch3d `rasterize_sparse_ray_bundle` /
`rasterize_mc` (reference use: holo_diffusion_model.py:499-513) — the
reference bottoms out in a CUDA scatter; here it is a `segment_sum`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rasterize_sparse_rays(
    xys: jnp.ndarray,
    features: jnp.ndarray,
    image_size: Tuple[int, int],
    depths: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
):
    """Splat per-ray values to the nearest pixel and average collisions.

    Args:
      xys: (B, N, 2) NDC positions of the rays (+x left, +y up).
      features: (B, N, C); depths: (B, N, 1); masks: (B, N, 1) weights.
      image_size: (H, W).

    Returns (images (B, H, W, C), depths (B, H, W, 1), masks (B, H, W, 1));
    pixels with no rays are zero.
    """
    H, W = image_size
    B, N, C = features.shape
    # NDC -> pixel index (inverse of pixel_grid_ndc)
    col = jnp.clip(jnp.round((1.0 - xys[..., 0]) * W / 2.0 - 0.5), 0, W - 1)
    row = jnp.clip(jnp.round((1.0 - xys[..., 1]) * H / 2.0 - 0.5), 0, H - 1)
    pix = (row * W + col).astype(jnp.int32)  # (B, N)

    w = jnp.ones((B, N, 1)) if masks is None else masks

    def splat_one(pix_b, vals_b, w_b):
        num = jax.ops.segment_sum(vals_b * w_b, pix_b, num_segments=H * W)
        den = jax.ops.segment_sum(w_b, pix_b, num_segments=H * W)
        return num / jnp.maximum(den, 1e-8), den

    feats_img, den = jax.vmap(splat_one)(pix, features, w)
    images = feats_img.reshape(B, H, W, C)
    mask_img = jnp.minimum(den, 1.0).reshape(B, H, W, 1)
    if depths is not None:
        depth_img, _ = jax.vmap(splat_one)(pix, depths, w)
        depth_img = depth_img.reshape(B, H, W, 1)
    else:
        depth_img = jnp.zeros((B, H, W, 1))
    return images, depth_img, mask_img
