"""K-nearest-neighbor ops: pointcloud normals via local PCA.

TPU-native replacement for the PyTorch3D CUDA KNN used by the reference's
pointcloud shaded-depth path (`pt3d.ops.estimate_pointcloud_normals`,
shaded_depth_render.py:233-237). Distances are computed blockwise as one
matmul per query block (MXU) + `lax.top_k`; normals are the smallest
eigenvector of each neighborhood's 3x3 covariance (batched `eigh`) — fully
jit-able, static shapes (padding with +inf distances handles N not a
multiple of the block size).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_points(
    query: jnp.ndarray, points: jnp.ndarray, k: int, block_q: int = 1024
) -> jnp.ndarray:
    """Indices of the k nearest `points` for each `query` point.

    query: (Q, 3); points: (N, 3). Returns (Q, k) int32 indices into points.
    """
    Q = query.shape[0]
    n_pad = -Q % block_q
    q = jnp.pad(query, ((0, n_pad), (0, 0)))
    p_sq = jnp.sum(points**2, axis=-1)  # (N,)

    def block(qb):
        # |q - p|^2 = |q|^2 - 2 q.p + |p|^2 ; |q|^2 constant per row
        d = p_sq[None, :] - 2.0 * (qb @ points.T)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    idx = jax.lax.map(block, q.reshape(-1, block_q, 3))
    return idx.reshape(-1, k)[:Q]


def estimate_pointcloud_normals(
    points: jnp.ndarray,
    neighborhood_size: int = 20,
    disambiguate_directions: bool = True,
) -> jnp.ndarray:
    """Per-point normals from the smallest principal axis of the KNN
    neighborhood covariance (the `estimate_pointcloud_normals` contract).

    points: (N, 3) -> (N, 3) unit normals. With disambiguate_directions the
    sign is chosen so normals point toward the origin-facing hemisphere of
    each neighborhood's mean offset (matching pytorch3d's local-frame
    disambiguation closely enough for shading; the reference additionally
    forces camera-facing signs afterwards, shaded_depth_render.py:239-240).
    """
    idx = knn_points(points, points, neighborhood_size)
    neigh = points[idx]  # (N, k, 3)
    mu = neigh.mean(axis=1, keepdims=True)
    centered = neigh - mu
    cov = jnp.einsum("nki,nkj->nij", centered, centered)
    # eigh: ascending eigenvalues -> column 0 is the normal direction
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]
    if disambiguate_directions:
        # orient against the mean viewing offset of the neighborhood center
        toward = -(mu[:, 0])  # vector from point region toward the origin
        sign = jnp.sign(jnp.sum(normals * toward, axis=-1, keepdims=True))
        normals = normals * jnp.where(sign == 0, 1.0, sign)
    return normals


def pointcloud_shaded_grid(
    pcl_grid: jnp.ndarray,
    mask: jnp.ndarray,
    neighborhood_size: int = 20,
    ambient: float = 0.05,
    ambient_color: float = 0.05,
) -> jnp.ndarray:
    """The reference's pointcloud shading (grid_pcl_to_shaded,
    shaded_depth_render.py:209-252): with the light at the camera center the
    shading of a view-space pointcloud is just the z component of the
    camera-facing normal.

    pcl_grid: (H, W, 3) view-space points; mask: (H, W) validity.
    Returns (H, W, 3) shaded image in [0, 1].

    Static-shape note: the reference gathers only masked points into the
    KNN; here all grid points participate (masked-out points sit at their
    unprojection, slightly biasing border neighborhoods) and the result is
    masked afterwards — jit-compatible, visually equivalent.
    """
    H, W, _ = pcl_grid.shape
    normals = estimate_pointcloud_normals(
        pcl_grid.reshape(-1, 3), neighborhood_size
    )
    # all normals camera-facing (shaded_depth_render.py:239-240:
    # normals *= sign(normals_z), then shade with normals_z => |normals_z|)
    nz = jnp.abs(normals[..., 2])
    shaded = (nz.reshape(H, W) * (mask > 0.5))[..., None].repeat(3, axis=-1)
    shaded = ambient * ambient_color + (1.0 - ambient) * shaded
    return jnp.clip(shaded, 0.0, 1.0)
