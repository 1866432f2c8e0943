"""Image sampling/resizing ops (host-free, pure XLA).

`bilinear_sample_ndc` is the TPU equivalent of the grid_sample call inside
Implicitron's ViewSampler (reference: configs/base.yaml:166-168,
`sampling_mode: bilinear`): sample 2D feature maps at pytorch3d-NDC locations
(+x left, +y up), align_corners=False, zeros padding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_ndc(
    image: jnp.ndarray, xys: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Sample (H, W, C) at pytorch3d-NDC xys (..., 2) -> (..., C).

    pytorch3d NDC has +x left / +y up; grid_sample coordinates have +x right /
    +y down, so the view sampler negates both (ViewSampler convention). This
    function takes pytorch3d NDC directly and handles the flip internally.
    Outside the image -> 0 (zeros padding).
    """
    H, W, C = image.shape
    # flip to grid_sample orientation, then to continuous pixel coords
    gx = -xys[..., 0]
    gy = -xys[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = (gx + 1.0) * 0.5 * W - 0.5
        fy = (gy + 1.0) * 0.5 * H - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    out = 0.0
    flat = image.reshape(-1, C)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = jnp.where(dx, wx, 1 - wx) * jnp.where(dy, wy, 1 - wy)
            inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            vals = flat[yi_c * W + xi_c]
            out = out + vals * (w * inside)[..., None]
    return out


def resize_image(image: jnp.ndarray, height: int, width: int, method="bilinear"):
    """Resize (..., H, W, C) with jax.image (antialias off, torch-like)."""
    out_shape = (*image.shape[:-3], height, width, image.shape[-1])
    return jax.image.resize(image, out_shape, method=method)
