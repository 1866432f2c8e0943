"""Ray sampling — TPU-native rebuild of Implicitron's AdaptiveRaySampler and
RayPointRefiner (reference use sites: holo_diffusion_model.py:442-448,
holo_multipass_ea.py:116, configs/base.yaml:129-143).

Shape-static by construction: MASK_SAMPLE draws a *fixed* `n_rays` per image
via categorical sampling over the mask (the reference's variable-count
multinomial would break jit; see SURVEY.md §7). Ray "lengths" parameterize
z-depth (pytorch3d convention: direction = unproject(xy, 1) - camera_center,
so origin + length * direction has z_cam == length).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .cameras import PerspectiveCameras, camera_centers, unproject_ndc_points


@struct.dataclass
class RayBundle:
    """A bundle of rays. All shapes are (B, n_rays, ...).

    origins: (B, N, 3) world-space ray origins (camera centers).
    directions: (B, N, 3) *unnormalized* directions; unit z-depth per step.
    lengths: (B, N, P) z-depths of sample points along each ray.
    xys: (B, N, 2) NDC xy coordinates of the sampled pixels.
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: jnp.ndarray


def ray_bundle_to_ray_points(bundle: RayBundle) -> jnp.ndarray:
    """(B, N, P, 3) world points: origins + lengths * directions."""
    return (
        bundle.origins[..., None, :]
        + bundle.lengths[..., :, None] * bundle.directions[..., None, :]
    )


def adaptive_depth_bounds(
    cameras: PerspectiveCameras,
    scene_center=(0.0, 0.0, 0.0),
    scene_extent: float = 4.0,
    min_near: float = 0.01,
):
    """Per-camera (near, far) from distance to the scene bounding box.

    Equivalent of Implicitron AdaptiveRaySampler's depth-range heuristic: the
    scene is a box of half-side `scene_extent` centered at `scene_center`; rays
    span [dist - r, dist + r] with r the bounding-sphere radius (extent * √3).
    """
    centers = camera_centers(cameras)
    d = jnp.linalg.norm(centers - jnp.asarray(scene_center, jnp.float32), axis=-1)
    r = scene_extent * jnp.sqrt(3.0)
    near = jnp.maximum(d - r, min_near)
    far = d + r
    return near, far


def stratify_lengths(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_rays: int,
    n_pts: int,
    rng: Optional[jax.Array] = None,
):
    """(B,) near/far -> (B, n_rays, n_pts) lengths; jittered bins if rng given."""
    B = near.shape[0]
    t = jnp.linspace(0.0, 1.0, n_pts)
    lengths = near[:, None, None] + t[None, None, :] * (far - near)[:, None, None]
    lengths = jnp.broadcast_to(lengths, (B, n_rays, n_pts))
    if rng is not None:
        # Stratified: uniform jitter inside each bin (pytorch3d
        # MultinomialRaysampler stratified_sampling).
        mids = 0.5 * (lengths[..., 1:] + lengths[..., :-1])
        upper = jnp.concatenate([mids, lengths[..., -1:]], axis=-1)
        lower = jnp.concatenate([lengths[..., :1], mids], axis=-1)
        u = jax.random.uniform(rng, lengths.shape)
        lengths = lower + (upper - lower) * u
    return lengths


def _xys_to_ray_bundle(
    cameras: PerspectiveCameras, xys: jnp.ndarray, lengths: jnp.ndarray
) -> RayBundle:
    """Build a RayBundle from NDC pixel positions.

    xys: (B, N, 2); lengths: (B, N, P). Directions are chosen so that moving
    `t` along a ray advances camera z-depth by `t` (pytorch3d convention).
    """
    B, N = xys.shape[:2]
    xy1 = jnp.concatenate([xys, jnp.ones((B, N, 1))], axis=-1)
    pts_at_1 = unproject_ndc_points(cameras, xy1)
    origins = jnp.broadcast_to(camera_centers(cameras)[:, None, :], (B, N, 3))
    directions = pts_at_1 - origins
    return RayBundle(origins=origins, directions=directions, lengths=lengths, xys=xys)


def pixel_grid_ndc(H: int, W: int) -> jnp.ndarray:
    """(H, W, 2) NDC coords of pixel centers. Row 0 / col 0 -> (+y, +x)."""
    x = 1.0 - (2.0 * jnp.arange(W) + 1.0) / W
    y = 1.0 - (2.0 * jnp.arange(H) + 1.0) / H
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def sample_rays_full_grid(
    cameras: PerspectiveCameras,
    image_height: int,
    image_width: int,
    n_pts_per_ray: int,
    scene_center=(0.0, 0.0, 0.0),
    scene_extent: float = 4.0,
    rng: Optional[jax.Array] = None,
) -> RayBundle:
    """Dense H*W ray grid (EVALUATION / FULL_GRID mode)."""
    B = cameras.batch_size
    xys = jnp.broadcast_to(
        pixel_grid_ndc(image_height, image_width).reshape(1, -1, 2),
        (B, image_height * image_width, 2),
    )
    near, far = adaptive_depth_bounds(cameras, scene_center, scene_extent)
    lengths = stratify_lengths(near, far, xys.shape[1], n_pts_per_ray, rng)
    return _xys_to_ray_bundle(cameras, xys, lengths)


def sample_rays_from_mask(
    cameras: PerspectiveCameras,
    mask: jnp.ndarray,
    n_rays: int,
    n_pts_per_ray: int,
    rng: jax.Array,
    scene_center=(0.0, 0.0, 0.0),
    scene_extent: float = 4.0,
    stratified: bool = True,
) -> RayBundle:
    """MASK_SAMPLE: fixed `n_rays` pixels per image ~ mask weights (TRAINING).

    mask: (B, H, W) sampling weights (mask_crop in the reference). Sampling is
    with replacement (matches torch.multinomial usage for n > #nonzero) and
    keeps shapes static for jit.
    """
    B, H, W = mask.shape
    rng_pix, rng_len = jax.random.split(rng)
    w = jnp.maximum(mask.reshape(B, -1), 0.0)
    # Degenerate all-zero masks fall back to uniform.
    all_zero = jnp.all(w <= 0, axis=-1, keepdims=True)
    w = jnp.where(all_zero, jnp.ones_like(w), w)
    # Inverse-CDF sampling (what torch.multinomial does), NOT
    # jax.random.categorical: the Gumbel-argmax trick materializes
    # B x n_rays x H*W work — ~2e9 ops at the release scale (3 x 1024 rays
    # over 800^2 masks), measured ~100 ms of a 144 ms step. The CDF pays one
    # cumsum over H*W per image + n_rays binary searches: ~0.1 ms.
    cdf = jnp.cumsum(w, axis=-1)  # (B, HW)
    u = jax.random.uniform(rng_pix, (B, n_rays)) * cdf[:, -1:]
    pix_idx = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right")
    )(cdf, u)
    pix_idx = jnp.minimum(pix_idx, H * W - 1)
    grid = pixel_grid_ndc(H, W).reshape(-1, 2)
    xys = grid[pix_idx]  # (B, n_rays, 2)
    near, far = adaptive_depth_bounds(cameras, scene_center, scene_extent)
    lengths = stratify_lengths(
        near, far, n_rays, n_pts_per_ray, rng_len if stratified else None
    )
    return _xys_to_ray_bundle(cameras, xys, lengths)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array],
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF sampling of `n_samples` points from a piecewise-constant pdf.

    bins: (..., M) bin edges; weights: (..., M-1). Deterministic (midpoints of
    uniform grid) when rng is None. Mirrors pytorch3d `sample_pdf`.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M)

    if rng is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(rng, (*cdf.shape[:-1], n_samples))

    # Searchsorted + 4 gathers, expressed as ONE one-hot matmul: per-lane
    # gathers (take_along_axis) are VPU-serial on TPU — measured 2.65 ms of
    # the train step's refine phase at 3x1024x16 over 65 bins, vs ~0.6 ms as
    # a batched (n_samples, M) @ (M, 4) MXU contraction
    # (scripts/profile_render_residual_r4.py, round 4).
    #
    # cmp[.., n, m] = u_n >= cdf_m is 1 for m <= inds-1; the one-hot of
    # `below = inds - 1` is cmp minus its left-shift (cdf[0] = 0 <= u, so
    # inds >= 1 always; if u lands past cdf[-1] the surviving 1 sits at
    # M-1, matching the reference's clip).
    cmp = (u[..., :, None] >= cdf[..., None, :]).astype(cdf.dtype)
    oh_below = cmp - jnp.concatenate(
        [cmp[..., 1:], jnp.zeros_like(cmp[..., :1])], axis=-1
    )
    # value vectors aligned with `below` = m: x_below[m] = x[m],
    # x_above[m] = x[min(m+1, M-1)] (bins and cdf share length M)
    cdf_a = jnp.concatenate([cdf[..., 1:], cdf[..., -1:]], axis=-1)
    bins_a = jnp.concatenate([bins[..., 1:], bins[..., -1:]], axis=-1)
    vals = jnp.stack([cdf, cdf_a, bins, bins_a], axis=-1)  # (..., M, 4)
    # HIGHEST: TPU-default matmul rounds operands to bf16 — oh_below is
    # exact either way (0/1) but bf16-rounded depth values would break
    # parity with the gather formulation (goldens pin this at 1e-6).
    picked = jnp.einsum(
        "...nm,...mk->...nk", oh_below, vals,
        precision=jax.lax.Precision.HIGHEST,
    )
    cdf_below, cdf_above = picked[..., 0], picked[..., 1]
    bins_below, bins_above = picked[..., 2], picked[..., 3]
    denom = jnp.where(cdf_above - cdf_below < 1e-8, 1.0, cdf_above - cdf_below)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def importance_sample_lengths(
    lengths: jnp.ndarray,
    weights: jnp.ndarray,
    n_fine: int,
    rng: Optional[jax.Array],
    append_coarse: bool = True,
) -> jnp.ndarray:
    """RayPointRefiner: importance-resample ray lengths from coarse weights.

    lengths: (B, N, P) coarse sample depths; weights: (B, N, P) raymarcher
    weights. Returns sorted (B, N, n_fine [+ P]) fine depths. Matches
    pytorch3d RayPointRefiner (bins = midpoints, inner weights).
    """
    mids = 0.5 * (lengths[..., 1:] + lengths[..., :-1])  # (B, N, P-1)
    inner_w = weights[..., 1:-1]  # (B, N, P-2)
    fine = sample_pdf(mids, inner_w, n_fine, rng)
    if append_coarse:
        fine = jnp.concatenate([lengths, fine], axis=-1)
    return jnp.sort(fine, axis=-1)
