"""KNN pointcloud normals + soft mesh rasterizer (the reference's
pytorch3d-CUDA visualization path, mesh_render.py + shaded_depth_render.py
:209-280) — analytic test cases."""
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.ops.knn import (
    estimate_pointcloud_normals,
    knn_points,
    pointcloud_shaded_grid,
)
from holo_diffusion_tpu.utils.mesh_render import (
    grid_mesh_from_points,
    mesh_render_shaded,
    soft_rasterize,
    vertex_normals,
)


def test_knn_points_exact():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(200, 3), jnp.float32)
    q = jnp.asarray(rng.randn(37, 3), jnp.float32)
    idx = np.asarray(knn_points(q, pts, k=5, block_q=16))
    d = ((np.asarray(q)[:, None] - np.asarray(pts)[None]) ** 2).sum(-1)
    ref = np.argsort(d, axis=1)[:, :5]
    # same neighbor SETS (ties may reorder)
    for i in range(q.shape[0]):
        assert set(idx[i]) == set(ref[i]), i


def test_pointcloud_normals_of_plane():
    """Points on z = 2 + 0.3x + 0.1y: normals must match the plane normal."""
    rng = np.random.RandomState(1)
    xy = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
    z = 2.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
    pts = jnp.asarray(np.concatenate([xy, z[:, None]], axis=1))
    n = np.asarray(estimate_pointcloud_normals(pts, neighborhood_size=12))
    expect = np.array([-0.3, -0.1, 1.0])
    expect = expect / np.linalg.norm(expect)
    cos = np.abs(n @ expect)
    assert cos.min() > 0.999, cos.min()


def test_pointcloud_shaded_grid_plane():
    """A fronto-parallel plane shades to |n_z| = 1 within the mask."""
    H = W = 16
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    pcl = jnp.asarray(
        np.stack([xx, yy, np.full_like(xx, 3.0)], axis=-1), jnp.float32
    )
    mask = jnp.ones((H, W))
    out = np.asarray(pointcloud_shaded_grid(pcl, mask, neighborhood_size=8))
    assert out.shape == (H, W, 3)
    np.testing.assert_allclose(out[4:-4, 4:-4], 1.0 * 0.95 + 0.05 * 0.05,
                               atol=1e-3)


def test_grid_mesh_faces():
    H = W = 4
    pcl = jnp.asarray(np.random.RandomState(2).randn(H, W, 3), jnp.float32)
    mask = jnp.ones((H, W))
    verts, faces, ok = grid_mesh_from_points(pcl, mask)
    assert verts.shape == (16, 3)
    assert faces.shape == (2 * 9, 3)  # 3x3 quads x 2 tris
    assert bool(jnp.all(ok))
    # masking a corner kills its adjacent quads
    mask2 = mask.at[0, 0].set(0.0)
    _, _, ok2 = grid_mesh_from_points(pcl, mask2)
    assert int(ok2.sum()) == 2 * 8


def test_soft_rasterize_covering_triangle():
    """A huge fronto-parallel triangle at z=2 covers the image: alpha ~ 1,
    depth ~ 2, color = vertex color."""
    verts = jnp.asarray(
        [[-10.0, -10.0, 2.0], [10.0, -10.0, 2.0], [0.0, 20.0, 2.0]],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((3, 3)) * 0.7
    img, alpha, depth = soft_rasterize(
        verts, faces, colors, (16, 16), topk=1, block_pixels=64
    )
    np.testing.assert_allclose(np.asarray(alpha), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img), 0.7, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), 2.0, atol=1e-3)


def test_soft_rasterize_occlusion():
    """A nearer triangle must win the softmax z-blend where it overlaps."""
    big = [[-10.0, -10.0, 4.0], [10.0, -10.0, 4.0], [0.0, 20.0, 4.0]]
    near = [[-10.0, -10.0, 2.0], [10.0, -10.0, 2.0], [0.0, 20.0, 2.0]]
    verts = jnp.asarray(big + near, jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.concatenate(
        [jnp.zeros((3, 3)), jnp.ones((3, 3))], axis=0
    )  # far black, near white
    img, alpha, depth = soft_rasterize(
        verts, faces, colors, (8, 8), topk=2, block_pixels=64
    )
    np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), 2.0, atol=1e-3)


def test_vertex_normals_plane():
    H = W = 5
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    pcl = jnp.asarray(np.stack([xx, yy, np.full_like(xx, 2.0)], -1),
                      jnp.float32)
    verts, faces, ok = grid_mesh_from_points(pcl, jnp.ones((H, W)))
    n = np.asarray(vertex_normals(verts, faces, ok))
    assert np.abs(n[:, 2]).min() > 0.999


def test_mesh_render_shaded_depth_grid():
    """End-to-end mesh shaded-depth: a bumpy depth map renders to a sane
    shaded image with coverage where the mask is on."""
    H = W = 24
    rng = np.random.RandomState(3)
    yy, xx = np.meshgrid(np.linspace(-0.5, 0.5, H), np.linspace(-0.5, 0.5, W),
                         indexing="ij")
    z = 3.0 + 0.2 * np.sin(4 * xx) * np.cos(4 * yy)
    pcl = jnp.asarray(np.stack([xx * z, yy * z, z], -1), jnp.float32)
    mask = jnp.asarray((xx**2 + yy**2) < 0.2).astype(jnp.float32)
    shaded, render_mask, depth = mesh_render_shaded(pcl, mask, topk=4)
    shaded, render_mask, depth = map(np.asarray, (shaded, render_mask, depth))
    assert shaded.shape == (H, W, 3) and np.isfinite(shaded).all()
    assert render_mask.sum() > 20  # real coverage
    inside = render_mask[..., 0] > 0.5
    assert shaded[inside].mean() > 0.05
    d = depth[..., 0][inside]
    assert 2.5 < d.mean() < 3.5


def test_depth_to_shaded_method_dispatch():
    from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras
    from holo_diffusion_tpu.utils.shaded_depth import depth_to_shaded

    H = W = 16
    cam = PerspectiveCameras.identity(1, focal=2.0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    depth = jnp.asarray(3.0 + 0.1 * xx, jnp.float32)
    mask = jnp.asarray((xx**2 + yy**2) < 0.6).astype(jnp.float32)
    for method in ("gradient", "pointcloud", "mesh"):
        out = np.asarray(depth_to_shaded(depth, mask, cam, method=method))
        assert out.shape == (H, W, 3), method
        assert np.isfinite(out).all(), method
