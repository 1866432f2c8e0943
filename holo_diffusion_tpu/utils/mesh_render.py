"""Soft mesh rasterization with SoftRas-style softmax blending.

TPU-native rebuild of the reference's mesh_render.py (PyTorch3D CUDA
MeshRasterizer + SoftGouraudShader + custom softmax_feature_blend /
softmax_depth_blend, mesh_render.py:16-294) and the mesh branch of
depth_to_shaded (shaded_depth_render.py:47-140). Pure jnp:

  * rasterization is a blockwise pixels x faces sweep — per pixel block, the
    signed squared NDC distance to every face and the barycentric-interpolated
    depth; the K nearest (by z) faces within the blur radius are kept
    (faces_per_pixel=topk, RasterizationSettings semantics with
    perspective_correct=False, mesh_render.py:41-47);
  * blending follows softmax_feature_blend (mesh_render.py:201-294) exactly:
    sigmoid(-dists/sigma) prob map, alpha = 1 - prod(1-prob),
    z-softmax weights exp((z_inv - z_inv_max)/gamma) with the background
    delta term;
  * shading is Gouraud with a point light at the scene center and
    Phong materials (SoftGouraudShader + Materials, mesh_render.py:92-105) —
    per-vertex colors interpolated by the same barycentrics.

This is a visualization path (SURVEY.md §2.9 "mesh rasterizer" row): it runs
anywhere jnp runs, is O(pixels x faces) per frame, and is meant for the
reference's capped render sizes (max_render_size 256 / max_size 200).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

MATERIALS: Dict[str, Dict] = {
    # shaded_depth_render.py:84-100
    "high_contrast": dict(
        ambient_color=(0.5, 0.5, 0.5),
        diffuse_color=(2.0, 2.0, 2.0),
        specular_color=(1.0, 1.0, 0.9),
        shininess=256.0,
    ),
    "medium": dict(
        ambient_color=(1.0, 1.0, 1.0),
        diffuse_color=(1.0, 1.0, 1.0),
        specular_color=(1.0, 1.0, 0.9),
        shininess=128.0,
    ),
}


def grid_mesh_from_points(
    pcl_grid: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quad->tri grid mesh over valid pixels (get_grid_mesh,
    shaded_depth_render.py:255-280), with static shapes: every quad yields
    two faces, and a face validity flag marks quads whose 4 corners are all
    inside the mask (invalid faces get weight 0 at raster time instead of
    being dropped — jit-friendly).

    pcl_grid: (H, W, 3) view-space verts; mask: (H, W).
    Returns (verts (H*W, 3), faces (F, 3) int32, face_ok (F,) bool).
    """
    H, W, _ = pcl_grid.shape
    idx = jnp.arange(H * W).reshape(H, W)
    # quad corners a=(i,j) b=(i,j+1) c=(i+1,j) d=(i+1,j+1)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[:-1, 1:].reshape(-1)
    c = idx[1:, :-1].reshape(-1)
    d = idx[1:, 1:].reshape(-1)
    m = mask > 0.5
    ok = (
        m[:-1, :-1] & m[:-1, 1:] & m[1:, :-1] & m[1:, 1:]
    ).reshape(-1)
    # reference winding: tri1 = (a, c, b); tri2 = (b, c, d)
    # (unfold column order a,b,c,d -> tri1 = [0,2,1], tri2 = [1,2,3])
    tri1 = jnp.stack([a, c, b], axis=-1)
    tri2 = jnp.stack([b, c, d], axis=-1)
    faces = jnp.concatenate([tri1, tri2], axis=0).astype(jnp.int32)
    face_ok = jnp.concatenate([ok, ok], axis=0)
    return pcl_grid.reshape(-1, 3), faces, face_ok


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                   face_ok: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Area-weighted per-vertex normals (pytorch3d verts_normals_packed)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normals
    if face_ok is not None:
        fn = fn * face_ok[:, None]
    out = jnp.zeros_like(verts)
    for i in range(3):
        out = out.at[faces[:, i]].add(fn)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-12)


def gouraud_vertex_colors(
    verts: jnp.ndarray,
    normals: jnp.ndarray,
    textures: jnp.ndarray,
    light_location=(0.0, 0.0, 0.0),
    ambient_color=(1.0, 1.0, 1.0),
    diffuse_color=(1.0, 1.0, 1.0),
    specular_color=(0.0, 0.0, 0.0),
    shininess: float = 128.0,
) -> jnp.ndarray:
    """Phong lighting at the vertices (SoftGouraudShader + PointLights at the
    scene center, mesh_render.py:70-105). Camera at the origin (view space)."""
    l = jnp.asarray(light_location) - verts
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
    v = -verts
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    # ensure normals face the camera for shading stability
    n = normals * jnp.sign(
        jnp.where(
            jnp.sum(normals * v, axis=-1, keepdims=True) == 0,
            1.0,
            jnp.sum(normals * v, axis=-1, keepdims=True),
        )
    )
    cos = jnp.clip(jnp.sum(n * l, axis=-1, keepdims=True), 0.0, 1.0)
    # pytorch3d specular: reflect light about normal, dot with view dir
    r = 2.0 * cos * n - l
    spec_cos = jnp.clip(jnp.sum(r * v, axis=-1, keepdims=True), 0.0, 1.0)
    ambient = jnp.asarray(ambient_color) * textures
    diffuse = jnp.asarray(diffuse_color) * cos * textures
    specular = jnp.asarray(specular_color) * spec_cos**shininess
    return ambient + diffuse + specular


def _edge_dist_sq(p, a, b):
    """Squared distance from points p to segment ab. p: (..., 2)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.sum((p - proj) ** 2, axis=-1)


def soft_rasterize(
    verts_view: jnp.ndarray,
    faces: jnp.ndarray,
    vert_colors: jnp.ndarray,
    image_size: Tuple[int, int],
    focal_length=(1.0, 1.0),
    principal_point=(0.0, 0.0),
    face_ok: Optional[jnp.ndarray] = None,
    topk: int = 10,
    sigma: float = 1e-4,
    gamma: float = 1e-4,
    blur_radius: Optional[float] = None,
    background_color=(0.0, 0.0, 0.0),
    znear: float = 0.01,
    zfar: float = 1000.0,
    min_depth: float = 1e-3,
    block_pixels: int = 512,
):
    """Soft-rasterize a view-space mesh into (image (H,W,C), alpha (H,W,1),
    depth (H,W,1)) with the reference's blending semantics."""
    import math

    H, W = image_size
    if blur_radius is None:
        blur_radius = math.log(1.0 / 1e-4 - 1.0) * sigma  # mesh_render.py:44

    # signed depth clamp (mesh_render.py:16-19,54-61)
    z = verts_view[..., 2:]
    sign = jnp.sign(z) + (z == 0.0)
    z = sign * jnp.maximum(jnp.abs(z), min_depth)
    verts_view = jnp.concatenate([verts_view[..., :2], z], axis=-1)

    # NDC projection with a trivial camera (R=I, T=0; mesh_render.py:63-66)
    f = jnp.asarray(focal_length)
    pp = jnp.asarray(principal_point)
    xy = verts_view[..., :2] * f / verts_view[..., 2:] + pp

    tri_xy = xy[faces]  # (F, 3, 2)
    tri_z = verts_view[..., 2][faces]  # (F, 3)
    valid_face = jnp.all(tri_z > 0, axis=-1)
    if face_ok is not None:
        valid_face = valid_face & face_ok

    # pixel NDC grid (pytorch3d convention: +x left, +y up, pixel centers;
    # shorter side spans [-1, 1], longer side proportionally wider)
    short = min(H, W)
    ys = (1.0 - (2.0 * jnp.arange(H) + 1.0) / H) * (H / short)
    xs = (1.0 - (2.0 * jnp.arange(W) + 1.0) / W) * (W / short)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([px, py], axis=-1).reshape(-1, 2)  # (H*W, 2)
    n_pix = pix.shape[0]
    n_pad = -n_pix % block_pixels
    pix_padded = jnp.pad(pix, ((0, n_pad), (0, 0)))

    a, b, c = tri_xy[:, 0], tri_xy[:, 1], tri_xy[:, 2]
    det = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    C = vert_colors.shape[-1]
    tri_col = vert_colors[faces]  # (F, 3, C)

    def block(pb):
        # barycentrics of each pixel in each face: (block, F)
        pa = pb[:, None, :] - a[None]
        w_b = (
            pa[..., 0] * (c[:, 1] - a[:, 1]) - pa[..., 1] * (c[:, 0] - a[:, 0])
        ) / det_safe
        w_c = (
            pa[..., 1] * (b[:, 0] - a[:, 0]) - pa[..., 0] * (b[:, 1] - a[:, 1])
        ) / det_safe
        w_a = 1.0 - w_b - w_c
        inside = (w_a >= 0) & (w_b >= 0) & (w_c >= 0)

        d_ab = _edge_dist_sq(pb[:, None], a[None], b[None])
        d_bc = _edge_dist_sq(pb[:, None], b[None], c[None])
        d_ca = _edge_dist_sq(pb[:, None], c[None], a[None])
        edge_sq = jnp.minimum(d_ab, jnp.minimum(d_bc, d_ca))
        dists = jnp.where(inside, -edge_sq, edge_sq)  # signed sq NDC distance

        zbuf = w_a * tri_z[:, 0] + w_b * tri_z[:, 1] + w_c * tri_z[:, 2]
        hit = valid_face[None] & (dists < blur_radius) & (zbuf > znear)

        # top-K nearest by depth among hits
        score = jnp.where(hit, -zbuf, -jnp.inf)
        _, top_idx = jax.lax.top_k(score, topk)  # (block, K)
        take = jnp.take_along_axis
        k_hit = take(hit, top_idx, axis=1)
        k_dists = take(dists, top_idx, axis=1)
        k_z = take(zbuf, top_idx, axis=1)
        k_wa = take(w_a, top_idx, axis=1)
        k_wb = take(w_b, top_idx, axis=1)
        k_wc = take(w_c, top_idx, axis=1)
        k_col = (
            k_wa[..., None] * tri_col[top_idx, 0]
            + k_wb[..., None] * tri_col[top_idx, 1]
            + k_wc[..., None] * tri_col[top_idx, 2]
        )

        # --- softmax_feature_blend (mesh_render.py:201-294)
        eps = 1e-10
        prob = jax.nn.sigmoid(-k_dists / sigma) * k_hit
        alpha = 1.0 - jnp.prod(1.0 - prob, axis=-1)
        z_inv = (zfar - k_z) / (zfar - znear) * k_hit
        z_inv_max = jnp.maximum(jnp.max(z_inv, axis=-1, keepdims=True), eps)
        weights_num = prob * jnp.exp((z_inv - z_inv_max) / gamma)
        delta = jnp.maximum(jnp.exp((eps - z_inv_max[..., 0]) / gamma), eps)
        denom = jnp.sum(weights_num, axis=-1) + delta
        col = (
            jnp.sum(weights_num[..., None] * k_col, axis=-2)
            + delta[..., None] * jnp.asarray(background_color)
        ) / denom[..., None]
        depth = (
            jnp.sum(weights_num * k_z, axis=-1) + delta * 0.0
        ) / denom
        return col, alpha, depth

    blocks = pix_padded.reshape(-1, block_pixels, 2)
    col, alpha, depth = jax.lax.map(block, blocks)
    col = col.reshape(-1, C)[:n_pix].reshape(H, W, C)
    alpha = alpha.reshape(-1)[:n_pix].reshape(H, W, 1)
    depth = depth.reshape(-1)[:n_pix].reshape(H, W, 1)
    return col, alpha, depth


def mesh_render_shaded(
    pcl_grid: jnp.ndarray,
    mask: jnp.ndarray,
    focal_length=(1.0, 1.0),
    principal_point=(0.0, 0.0),
    material: str = "medium",
    topk: int = 10,
    background_color=(0.0, 0.0, 0.0),
    scene_center=(0.0, 0.0, 0.0),
):
    """The reference's grid_pcl_to_shaded_mesh (shaded_depth_render.py:47-140):
    view-space depth grid -> quad mesh -> Gouraud shading with a point light
    at the scene center -> soft rasterization.

    pcl_grid: (H, W, 3) view-space unprojected depth; mask: (H, W).
    Returns (shaded (H, W, 3), render_mask (H, W, 1), depth (H, W, 1)).
    """
    H, W, _ = pcl_grid.shape
    verts, faces, face_ok = grid_mesh_from_points(pcl_grid, mask)
    normals = vertex_normals(verts, faces, face_ok)
    mat = MATERIALS[material]
    colors = gouraud_vertex_colors(
        verts, normals, jnp.ones_like(verts),
        light_location=scene_center, **mat,
    )
    shaded, alpha, depth = soft_rasterize(
        verts, faces, colors, (H, W),
        focal_length=focal_length, principal_point=principal_point,
        face_ok=face_ok, topk=topk, background_color=background_color,
    )
    return jnp.clip(shaded, 0.0, 1.0), (alpha > 0.5).astype(jnp.float32), depth
