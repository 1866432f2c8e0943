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


def bilinear_sample_ndc_matmul(
    image: jnp.ndarray, xys: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """`bilinear_sample_ndc` as two MXU matmuls (small feature maps).

    TPU gathers move one tiny row per index and dominate the view-pooling
    phase (bench: gather-bound). Bilinear interpolation is separable:
    sampled[n] = wy[n] @ image @ wx[n]^T with TRIANGLE row weights
    wy[n, y] = max(0, 1 - |fy[n] - y|) — the 2D analog of the Pallas kron
    sampler's wz⊗wy⊗wx formulation (ops/pallas/kron_sample.py). Identical
    values to the gather path (same corner weights; out-of-image weights
    vanish, reproducing zeros padding). Worth it when H*W is small enough
    that the (N, H) weight rows beat N*4 scattered gathers — the ResNet
    stage maps (<= 64^2 at release scale); keep the gather path for the
    full-res images/masks entries.
    """
    H, W, C = image.shape
    gx = -xys[..., 0]
    gy = -xys[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = (gx + 1.0) * 0.5 * W - 0.5
        fy = (gy + 1.0) * 0.5 * H - 0.5
    lead = fx.shape  # (..., ) sample dims
    fx = fx.reshape(-1)
    fy = fy.reshape(-1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - jnp.arange(H)))  # (N, H)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - jnp.arange(W)))  # (N, W)
    # HIGHEST keeps the "identical to the gather path" contract on TPU, where
    # default matmul precision would truncate weights/features to bf16 (the
    # gather path is f32 VPU arithmetic). The maps here are tiny (<= 64^2),
    # so the multi-pass f32 matmul is still far cheaper than the gathers.
    hi = jax.lax.Precision.HIGHEST
    tmp = jax.lax.dot(
        wy, image.reshape(H, W * C), precision=hi
    ).reshape(-1, W, C)
    out = jnp.einsum("nw,nwc->nc", wx, tmp, precision=hi)
    return out.reshape(*lead, C)


def resize_image(image: jnp.ndarray, height: int, width: int, method="bilinear"):
    """Resize (..., H, W, C) with jax.image, antialias OFF.

    The reference rescales with `F.interpolate(mode="bilinear")` (Implicitron
    resnet extractor `image_rescale`), which never antialiases; jax.image's
    default antialias=True filter diverges from it by ~0.2 on 2x downscale,
    so parity (and checkpoint-import fidelity) requires antialias=False —
    bit-equal to torch for both up- and downscaling (verified ≤6e-8).
    """
    out_shape = (*image.shape[:-3], height, width, image.shape[-1])
    return jax.image.resize(image, out_shape, method=method, antialias=False)
