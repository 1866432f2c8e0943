"""Perspective camera model with PyTorch3D conventions, as JAX pytrees.

The reference relies on pytorch3d's `PerspectiveCameras` / `CamerasBase`
(row-vector convention) everywhere (reference:
holo_diffusion/custom_modules.py:296-334, holo_diffusion/utils/render_utils/
flyaround.py:301-350). We rebuild the *used subset* as a pure-functional pytree:

  - world -> camera: ``x_cam = x_world @ R + T``       (row vectors)
  - camera center:   ``C = -T @ R^T``
  - NDC projection:  ``x_ndc = fx * x_cam / z_cam + px`` (+x left, +y up)
  - depth = z_cam (positive in front of the camera)

All functions are jit/vmap-friendly: static shapes, no Python branching on
traced values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_HI = jax.lax.Precision.HIGHEST


@struct.dataclass
class PerspectiveCameras:
    """Batch of perspective cameras (pytorch3d `PerspectiveCameras` subset).

    Attributes:
      R: (B, 3, 3) world-to-camera rotations, row-vector convention.
      T: (B, 3) world-to-camera translations.
      focal_length: (B, 2) focal lengths (fx, fy) in NDC units.
      principal_point: (B, 2) principal points (px, py) in NDC units.
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.R.shape[0]

    def __getitem__(self, idx) -> "PerspectiveCameras":
        # Keep the batch dim: scalar indices become length-1 slices.
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return jax.tree.map(lambda x: x[idx], self)

    @classmethod
    def identity(cls, batch_size: int = 1, focal: float = 1.0) -> "PerspectiveCameras":
        return cls(
            R=jnp.broadcast_to(jnp.eye(3), (batch_size, 3, 3)),
            T=jnp.zeros((batch_size, 3)),
            focal_length=jnp.full((batch_size, 2), focal),
            principal_point=jnp.zeros((batch_size, 2)),
        )


def join_cameras(cams: list) -> PerspectiveCameras:
    """Concatenate camera batches along the batch dimension."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *cams)


def camera_centers(cameras: PerspectiveCameras) -> jnp.ndarray:
    """World-space camera centers ``C = -T @ R^T``, shape (B, 3).

    Matches the reference's nan-safe formulation
    (custom_modules.py:303-311: ``-bmm(T[:, None], R.permute(0, 2, 1))``).
    """
    return -jnp.einsum("bi,bji->bj", cameras.T, cameras.R, precision=_HI)


def transform_points_world_to_camera(
    cameras: PerspectiveCameras, points: jnp.ndarray
) -> jnp.ndarray:
    """``x_cam = x_world @ R + T``. points: (B, ..., 3) -> (B, ..., 3)."""
    extra = points.ndim - 2
    T = cameras.T.reshape(cameras.T.shape[0], *([1] * (extra - 0)), 3) if extra else cameras.T
    return jnp.einsum("b...i,bij->b...j", points, cameras.R, precision=_HI) + T


def transform_points_camera_to_world(
    cameras: PerspectiveCameras, points: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of :func:`transform_points_world_to_camera` (R orthonormal)."""
    extra = points.ndim - 2
    T = cameras.T.reshape(cameras.T.shape[0], *([1] * extra), 3) if extra else cameras.T
    return jnp.einsum("b...i,bji->b...j", points - T, cameras.R, precision=_HI)


def project_points_ndc(
    cameras: PerspectiveCameras, points_world: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Project world points to (x_ndc, y_ndc, depth).

    points_world: (B, ..., 3). Returns (B, ..., 3) with pytorch3d NDC signs
    (+x left, +y up) and depth = z_cam.
    """
    pts_cam = transform_points_world_to_camera(cameras, points_world)
    z = pts_cam[..., 2:3]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, jnp.where(z >= 0, eps, -eps), z)
    extra = points_world.ndim - 2
    f = cameras.focal_length.reshape(cameras.focal_length.shape[0], *([1] * extra), 2)
    p = cameras.principal_point.reshape(
        cameras.principal_point.shape[0], *([1] * extra), 2
    )
    xy = pts_cam[..., :2] * f * inv_z + p
    return jnp.concatenate([xy, z], axis=-1)


def unproject_ndc_points(
    cameras: PerspectiveCameras, xy_depth: jnp.ndarray
) -> jnp.ndarray:
    """Unproject (x_ndc, y_ndc, depth) -> world points. (B, ..., 3)."""
    extra = xy_depth.ndim - 2
    f = cameras.focal_length.reshape(cameras.focal_length.shape[0], *([1] * extra), 2)
    p = cameras.principal_point.reshape(
        cameras.principal_point.shape[0], *([1] * extra), 2
    )
    z = xy_depth[..., 2:3]
    xy_cam = (xy_depth[..., :2] - p) * z / f
    pts_cam = jnp.concatenate([xy_cam, z], axis=-1)
    return transform_points_camera_to_world(cameras, pts_cam)


def so3_exp_map(log_rot: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) via Rodrigues (pytorch3d `so3_exp_map`).

    log_rot: (B, 3) axis-angle vectors. Returns (B, 3, 3).
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
    sin_t = jnp.sin(theta) / theta
    cos_fac = (1.0 - jnp.cos(theta)) / (theta * theta)

    x, y, z = log_rot[..., 0], log_rot[..., 1], log_rot[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    K2 = jnp.einsum("...ij,...jk->...ik", K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return (
        eye
        + sin_t[..., None, None] * K
        + cos_fac[..., None, None] * K2
    )


def look_at_rotation(
    eye: jnp.ndarray, at: jnp.ndarray, up: jnp.ndarray
) -> jnp.ndarray:
    """pytorch3d `look_at_rotation`: R whose *columns* are camera axes.

    eye/at/up: (B, 3). Camera +z points from eye toward `at`, +x = up x z.
    """
    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    # Fall back to an arbitrary orthogonal when up ~ z (pytorch3d replaces
    # degenerate rows with (1, 0, 0)).
    degenerate = jnp.sum(x_axis * x_axis, axis=-1, keepdims=True) < 5e-7
    x_axis = jnp.where(
        degenerate, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), x_axis.shape), x_axis
    )
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    R_rows = jnp.stack([x_axis, y_axis, z_axis], axis=-2)  # rows = axes
    return jnp.swapaxes(R_rows, -1, -2)  # columns = axes


def look_at_view_transform(
    dist=1.0,
    elev=0.0,
    azim=0.0,
    at=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
    degrees: bool = True,
):
    """pytorch3d `look_at_view_transform`: spherical pose -> (R, T).

    All of dist/elev/azim broadcast to a common batch shape (B,).
    """
    dist, elev, azim = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(dist, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(elev, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(azim, jnp.float32)),
    )
    if degrees:
        elev = jnp.deg2rad(elev)
        azim = jnp.deg2rad(azim)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    at = jnp.broadcast_to(jnp.asarray(at, jnp.float32), (dist.shape[0], 3))
    up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), (dist.shape[0], 3))
    eye = at + jnp.stack([x, y, z], axis=-1)
    R = look_at_rotation(eye, at, up)
    T = -jnp.einsum("bi,bij->bj", eye, R, precision=_HI)
    return R, T


def _normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
