"""Synthetic posed-image scenes for tests and the end-to-end overfit demo
(SURVEY.md §7 phase 2 minimum slice). Analytic colored-sphere scenes rendered
with the same camera model the framework uses — no external data needed."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import (
    PerspectiveCameras,
    camera_centers,
    look_at_view_transform,
)
from ..geometry.rays import sample_rays_full_grid
from .frame_data import FrameData


def make_synthetic_scene(
    n_views: int = 10,
    image_size: int = 32,
    radius: float = 1.0,
    dist: float = 4.0,
    seed: int = 0,
    focal: float = 2.5,
) -> FrameData:
    """Ray-traced hard sphere at the origin, colored by surface normal.

    Returns a FrameData batch of `n_views` posed views with fg masks and
    depth maps — a drop-in scene for overfit tests.
    """
    rng = np.random.RandomState(seed)
    azim = jnp.asarray(np.linspace(0, 360, n_views, endpoint=False))
    elev = jnp.asarray(rng.uniform(-30, 45, n_views))
    R, T = look_at_view_transform(dist=dist, elev=elev, azim=azim)
    cams = PerspectiveCameras(
        R=R,
        T=T,
        focal_length=jnp.full((n_views, 2), focal),
        principal_point=jnp.zeros((n_views, 2)),
    )

    rb = sample_rays_full_grid(cams, image_size, image_size, 2, scene_extent=radius)
    o = rb.origins  # (B, N, 3)
    d = rb.directions / jnp.linalg.norm(rb.directions, axis=-1, keepdims=True)

    # analytic ray-sphere intersection
    b = 2.0 * jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - radius**2
    disc = b * b - 4 * c
    hit = disc > 0
    t_hit = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / 2.0
    pts = o + t_hit[..., None] * d
    normals = pts / radius
    color = 0.5 + 0.5 * normals  # normal-colored surface
    white = jnp.ones_like(color)
    img = jnp.where(hit[..., None], color, white)

    # depth = z-depth of the hit point in camera frame
    from ..geometry.cameras import transform_points_world_to_camera

    z = transform_points_world_to_camera(cams, pts)[..., 2]
    depth = jnp.where(hit, z, 0.0)

    H = W = image_size
    return FrameData(
        camera=cams,
        image_rgb=img.reshape(n_views, H, W, 3),
        fg_probability=hit.astype(jnp.float32).reshape(n_views, H, W, 1),
        mask_crop=jnp.ones((n_views, H, W, 1)),
        depth_map=depth.reshape(n_views, H, W, 1),
        sequence_id=jnp.zeros((n_views,), jnp.int32),
    )
