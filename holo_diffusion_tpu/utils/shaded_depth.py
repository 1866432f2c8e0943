"""Shaded depth visualization.

Rebuild of the reference's shaded-depth pipeline (render_utils/
shaded_depth_render.py + flyaround.py:400-503): either shade from rendered
normals (`render_normals: true`, the release default — _make_shaded_from_normals,
flyaround.py:400-419) or derive normals from the depth map. The reference's
normal estimation bottoms out in pytorch3d CUDA KNN / mesh rasterization
(host-side visualization, SURVEY.md §2.9); on TPU we estimate normals from
depth-map finite differences of the unprojected point map — equivalent
lambertian look without a rasterizer dependency.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.cameras import PerspectiveCameras, camera_centers, unproject_ndc_points
from ..geometry.rays import pixel_grid_ndc


def depth_laplacian_outlier_mask(depth: jnp.ndarray, thr: float = 0.3) -> jnp.ndarray:
    """Mask out depth discontinuities (shaded_depth_render.py:27-44)."""
    d = depth
    lap = jnp.abs(
        4 * d[1:-1, 1:-1] - d[:-2, 1:-1] - d[2:, 1:-1] - d[1:-1, :-2] - d[1:-1, 2:]
    )
    mask = jnp.pad(lap < thr * jnp.maximum(d[1:-1, 1:-1], 1e-6), 1)
    return mask.astype(jnp.float32)


def _unproject_view_space(depth: jnp.ndarray, camera: PerspectiveCameras):
    """Unproject a depth map with a TRIVIAL camera (R=I, T=0) — the
    reference's view-space pointcloud grid (shaded_depth_render.py:166-183)."""
    H, W = depth.shape
    xys = pixel_grid_ndc(H, W)
    xyd = jnp.concatenate([xys, jnp.maximum(depth, 1e-6)[..., None]], axis=-1)
    trivial = PerspectiveCameras(
        R=jnp.eye(3)[None],
        T=jnp.zeros((1, 3)),
        focal_length=camera.focal_length[:1],
        principal_point=camera.principal_point[:1],
    )
    return unproject_ndc_points(trivial, xyd[None])[0]  # (H, W, 3) view space


def depth_to_shaded(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    camera: PerspectiveCameras,
    ambient: float = 0.25,
    bg_value: float = 1.0,
    method: str = "gradient",  # gradient | pointcloud | mesh
    material: str = "medium",
    knn_k: int = 20,
) -> jnp.ndarray:
    """(H, W) depth + (H, W) mask + 1-camera -> (H, W, 3) shaded render.

    Methods, mirroring the reference's depth_to_shaded dispatch
    (shaded_depth_render.py:142-207):
      * "gradient"   — normals via central differences of the unprojected
                       point map (fast lambertian default; TPU-friendly);
      * "pointcloud" — KNN-PCA normals, light at the camera => shade is the
                       camera-facing normal z (ops/knn.py);
      * "mesh"       — quad-mesh over the depth grid, Gouraud shading, soft
                       rasterization with softmax blending (utils/mesh_render).
    """
    if method == "pointcloud":
        from ..ops.knn import pointcloud_shaded_grid

        pcl = _unproject_view_space(depth, camera)
        valid = (mask > 0.5) & (depth > 1e-2)
        shaded = pointcloud_shaded_grid(pcl, valid, neighborhood_size=knn_k)
        return jnp.where(valid[..., None], shaded, bg_value)
    if method == "mesh":
        from .mesh_render import mesh_render_shaded

        pcl = _unproject_view_space(depth, camera)
        valid = ((mask > 0.5) & (depth > 1e-2)).astype(jnp.float32)
        valid = valid * depth_laplacian_outlier_mask(depth)
        shaded, render_mask, _ = mesh_render_shaded(
            pcl, valid,
            focal_length=camera.focal_length[0],
            principal_point=camera.principal_point[0],
            material=material,
        )
        return jnp.where(render_mask > 0.5, shaded, bg_value)
    assert method == "gradient", method
    H, W = depth.shape
    xys = pixel_grid_ndc(H, W)
    xyd = jnp.concatenate([xys, depth[..., None]], axis=-1)
    pts = unproject_ndc_points(camera, xyd[None])[0]  # (H, W, 3)

    dx = jnp.gradient(pts, axis=1)
    dy = jnp.gradient(pts, axis=0)
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)

    cam_c = camera_centers(camera)[0]
    to_cam = cam_c - pts
    to_cam = to_cam / jnp.maximum(jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-8)
    lambert = jnp.abs(jnp.sum(n * to_cam, axis=-1))  # two-sided
    shade = ambient + (1 - ambient) * lambert

    valid = (mask > 0.5) & (depth > 1e-6)
    valid = valid & (depth_laplacian_outlier_mask(depth) > 0.5)
    out = jnp.where(valid[..., None], shade[..., None], bg_value)
    return jnp.broadcast_to(out, (H, W, 3))


def shaded_from_normals(
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    camera: PerspectiveCameras,
    depth: jnp.ndarray,
    ambient: float = 0.25,
    bg_value: float = 1.0,
) -> jnp.ndarray:
    """Shade directly from rendered normals (flyaround.py:400-419; used when
    `render_normals: true`). normals: (H, W, 3); mask/depth: (H, W)."""
    H, W = mask.shape
    xys = pixel_grid_ndc(H, W)
    xyd = jnp.concatenate([xys, jnp.maximum(depth, 1e-3)[..., None]], axis=-1)
    pts = unproject_ndc_points(camera, xyd[None])[0]
    cam_c = camera_centers(camera)[0]
    to_cam = cam_c - pts
    to_cam = to_cam / jnp.maximum(jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-8)
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-8)
    lambert = jnp.abs(jnp.sum(n * to_cam, axis=-1))
    shade = ambient + (1 - ambient) * lambert
    out = jnp.where((mask > 0.5)[..., None], shade[..., None], bg_value)
    return jnp.broadcast_to(out, (H, W, 3))


def make_depth_image(
    depth: jnp.ndarray, mask: jnp.ndarray, pad_value: float = 0.0
) -> jnp.ndarray:
    """Normalized depth visualization composited over the mask (Implicitron
    vis_utils.make_depth_image equivalent)."""
    d = jnp.where(mask > 0.5, depth, jnp.nan)
    dmin = jnp.nanmin(d)
    dmax = jnp.nanmax(d)
    norm = (depth - dmin) / jnp.maximum(dmax - dmin, 1e-6)
    norm = jnp.clip(1.0 - norm, 0.0, 1.0)  # near = bright
    out = jnp.where(mask > 0.5, norm, pad_value)
    return jnp.broadcast_to(out[..., None], (*depth.shape, 3))
