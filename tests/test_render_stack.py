"""Render-stack tests: trilinear voxel sampling (golden parity vs torch
grid_sample), EA raymarcher analytic cases, multipass renderer invariants,
MC splat."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.geometry import (
    PerspectiveCameras,
    look_at_view_transform,
    sample_rays_full_grid,
)
from holo_diffusion_tpu.geometry.rays import RayBundle
from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction
from holo_diffusion_tpu.models.renderer import (
    emission_absorption_raymarcher,
    multipass_ea_render,
)
from holo_diffusion_tpu.ops.splat import rasterize_sparse_rays
from holo_diffusion_tpu.ops.voxel import sample_voxel_grid_world, voxel_coord_grid

GOLD = np.load(
    os.path.join(os.path.dirname(__file__), "goldens", "gridsample_goldens.npz")
)


def test_trilinear_matches_torch_grid_sample():
    grid = jnp.asarray(np.moveaxis(GOLD["grid"][0], 0, -1))  # (D, H, W, C)
    world = jnp.asarray(GOLD["world"])
    out = sample_voxel_grid_world(grid, world, float(GOLD["extent"]))
    np.testing.assert_allclose(np.asarray(out)[0], GOLD["sampled"], atol=1e-5)


def test_trilinear_exact_at_voxel_centers():
    resol, extent = 4, 8.0
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(resol, resol, resol, 3), jnp.float32)
    pts = voxel_coord_grid(resol, extent).reshape(-1, 3)
    out = sample_voxel_grid_world(grid, pts, extent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grid).reshape(-1, 3), atol=1e-5)


def test_trilinear_zero_outside():
    grid = jnp.ones((4, 4, 4, 2))
    far_pts = jnp.array([[100.0, 0.0, 0.0], [0.0, -50.0, 0.0]])
    out = sample_voxel_grid_world(grid, far_pts, 8.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_ea_raymarcher_opaque_surface():
    """A single very dense sample absorbs the ray: weight ~1 at that sample."""
    B, N, P = 1, 3, 8
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 2.0, P), (B, N, P))
    dens = jnp.zeros((B, N, P, 1)).at[:, :, 4, 0].set(1e4)
    feats = jnp.zeros((B, N, P, 3)).at[:, :, 4, :].set(jnp.array([1.0, 0.5, 0.25]))
    f, d, m, w = emission_absorption_raymarcher(dens, feats, lengths)
    np.testing.assert_allclose(np.asarray(w[..., 4]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f[0, 0]), [1.0, 0.5, 0.25], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d[..., 0]), lengths[..., 4], atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-5)


def test_ea_raymarcher_empty_space():
    B, N, P = 2, 4, 16
    lengths = jnp.broadcast_to(jnp.linspace(0.5, 3.0, P), (B, N, P))
    dens = jnp.full((B, N, P, 1), -5.0)  # negative -> ReLU -> 0
    feats = jnp.ones((B, N, P, 3))
    f, d, m, w = emission_absorption_raymarcher(dens, feats, lengths)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-6)


def test_ea_raymarcher_analytic_homogeneous():
    """Constant density sigma: weights follow exp(-sigma (l_i - l_0))."""
    sigma = 2.0
    P = 64
    lengths = jnp.linspace(1.0, 3.0, P)[None, None]
    delta = float(lengths[0, 0, 1] - lengths[0, 0, 0])
    dens = jnp.full((1, 1, P, 1), sigma)
    feats = jnp.ones((1, 1, P, 1))
    f, d, m, w = emission_absorption_raymarcher(
        dens, feats, lengths, background_opacity=1e10
    )
    # analytic: w_i = (1 - e^{-sigma*delta}) e^{-sigma*delta*i}, last absorbs rest
    i = np.arange(P - 1)
    expected = (1 - np.exp(-sigma * delta)) * np.exp(-sigma * delta * i)
    np.testing.assert_allclose(np.asarray(w[0, 0, :-1]), expected, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-5)  # opaque bg delta
    np.testing.assert_allclose(np.asarray(f[0, 0, 0]), 1.0, atol=1e-5)


def test_ea_weights_sum_le_one():
    rng = jax.random.PRNGKey(0)
    lengths = jnp.sort(jax.random.uniform(rng, (2, 8, 32), minval=1, maxval=4), axis=-1)
    dens = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32, 1)) * 2
    feats = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 32, 3))
    f, d, m, w = emission_absorption_raymarcher(dens, feats, lengths)
    assert (np.asarray(jnp.sum(w, -1)) <= 1.0 + 1e-5).all()
    assert (np.asarray(w) >= 0).all()


def _sphere_implicit(points, directions, pass_number):
    """Analytic soft sphere of radius 1 at origin, red color."""
    dist = jnp.linalg.norm(points, axis=-1, keepdims=True)
    dens = 100.0 * (1.0 - dist)  # positive inside
    feats = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0]), points.shape[:-1] + (3,)
    )
    return dens, feats, {}


def test_multipass_render_sphere():
    R, T = look_at_view_transform(dist=3.0, elev=0.0, azim=0.0)
    cams = PerspectiveCameras(
        R=R, T=T, focal_length=jnp.full((1, 2), 2.0), principal_point=jnp.zeros((1, 2))
    )
    rb = sample_rays_full_grid(cams, 16, 16, 32, scene_extent=1.5)
    out = multipass_ea_render(
        _sphere_implicit,
        rb,
        n_pts_per_ray_fine=16,
        rng=None,
        training=False,
        num_passes=2,
    )
    img = np.asarray(out.features).reshape(16, 16, 3)
    mask = np.asarray(out.masks).reshape(16, 16)
    # center pixel hits the sphere (red, opaque); corner pixel misses
    assert mask[8, 8] > 0.99
    assert img[8, 8, 0] > 0.99
    assert mask[0, 0] < 0.01
    # depth at center ~ dist - radius = 2
    depth = np.asarray(out.depths).reshape(16, 16)
    assert abs(depth[8, 8] - 2.0) < 0.2  # soft density ramp penetrates slightly
    # fine pass has a previous stage with same-shape outputs
    assert out.prev_stage is not None
    assert out.prev_stage.features.shape == out.features.shape
    assert out.weights is None  # return_weights=False strips all stages
    assert out.prev_stage.weights is None


def test_multipass_render_training_noise_reproducible():
    R, T = look_at_view_transform(dist=3.0, elev=10.0, azim=20.0)
    cams = PerspectiveCameras(
        R=R, T=T, focal_length=jnp.full((1, 2), 2.0), principal_point=jnp.zeros((1, 2))
    )
    rb = sample_rays_full_grid(cams, 4, 4, 16, scene_extent=1.5)
    out1 = multipass_ea_render(
        _sphere_implicit, rb, 8, jax.random.PRNGKey(3), training=True
    )
    out2 = multipass_ea_render(
        _sphere_implicit, rb, 8, jax.random.PRNGKey(3), training=True
    )
    np.testing.assert_allclose(
        np.asarray(out1.features), np.asarray(out2.features), atol=1e-6
    )


def test_implicit_function_shapes_and_normals():
    fn = VoxelGridImplicitFunction(
        resol=8,
        volume_extent=4.0,
        n_hidden=16,
        feature_dim=0,
        render_normals=True,
        render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
    )
    grid = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 16))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 7, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 3))
    params = fn.init(jax.random.PRNGKey(3), grid, pts, dirs)
    dens, feats, aux = fn.apply(params, grid, pts, dirs)
    assert dens.shape == (2, 5, 7, 1)
    assert feats.shape == (2, 5, 7, 3)
    assert aux["normals"].shape == (2, 5, 7, 3)
    norms = np.linalg.norm(np.asarray(aux["normals"]), axis=-1)
    assert ((norms < 1 + 1e-4)).all()


def test_normals_fast_path_matches_autodiff():
    """The analytic kron-d_points normals (collapsible density net) must be
    EXACTLY the autodiff-through-sampler normals it replaces."""
    from unittest import mock

    from holo_diffusion_tpu.models.render_mlp import RenderMLP

    fn = VoxelGridImplicitFunction(
        resol=8,
        volume_extent=4.0,
        n_hidden=16,
        feature_dim=0,
        render_normals=True,
        render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
    )
    grid = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 16))
    # keep points off exact voxel-boundary planes (the trilinear gradient has
    # a measure-zero subgradient ambiguity there, resolved differently by
    # sign() vs autodiff)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 5, 7, 3), minval=-0.93, maxval=0.97
    )
    dirs = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 3))
    params = fn.init(jax.random.PRNGKey(3), grid, pts, dirs)
    assert fn.bind(params).render_mlp.density_net_is_collapsible
    _, _, aux_fast = fn.apply(params, grid, pts, dirs)
    with mock.patch.object(
        RenderMLP,
        "density_net_is_collapsible",
        new_callable=mock.PropertyMock,
        return_value=False,
    ):
        _, _, aux_ref = fn.apply(params, grid, pts, dirs)
    np.testing.assert_allclose(
        np.asarray(aux_fast["normals"]),
        np.asarray(aux_ref["normals"]),
        atol=1e-5,
    )


def test_normals_fast_path_under_outer_grad():
    """render_normals must not break the train step: differentiating a loss
    through the implicit function while the collapsible-density normals aux
    is computed (the release config's every-forward normals) used to fail
    linearization (nested jax.grad over the first-order custom_vjp sampler)."""
    fn = VoxelGridImplicitFunction(
        resol=8,
        volume_extent=4.0,
        n_hidden=16,
        feature_dim=0,
        render_normals=True,
        render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
    )
    grid = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 16))
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 5, 7, 3), minval=-0.9, maxval=0.9
    )
    dirs = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 3))
    params = fn.init(jax.random.PRNGKey(3), grid, pts, dirs)

    def loss(params, grid):
        dens, feats, aux = fn.apply(params, grid, pts, dirs)
        return (dens ** 2).mean() + (feats ** 2).mean(), aux

    (val, aux), grads = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)
    )(params, grid)
    assert np.isfinite(float(val))
    assert aux["normals"].shape == (2, 5, 7, 3)
    g_leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in g_leaves)
    # the grid gradient must be nonzero (normals stop_gradient must not
    # swallow the real loss path)
    assert float(jnp.abs(grads[1]).sum()) > 0


def test_rasterize_sparse_rays_roundtrip():
    """Splatting dense full-grid xys reproduces the image."""
    from holo_diffusion_tpu.geometry.rays import pixel_grid_ndc

    H = W = 8
    rng = np.random.RandomState(0)
    img = rng.rand(1, H * W, 3).astype(np.float32)
    xys = pixel_grid_ndc(H, W).reshape(1, -1, 2)
    images, depths, masks = rasterize_sparse_rays(xys, jnp.asarray(img), (H, W))
    np.testing.assert_allclose(
        np.asarray(images).reshape(H * W, 3), img[0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(masks), 1.0, atol=1e-6)


def test_packed_sampler_matches_gather():
    from holo_diffusion_tpu.ops.voxel import (
        pack_corner_grid,
        sample_packed_voxel_grid_world,
    )

    rng = np.random.RandomState(3)
    grid = jnp.asarray(rng.randn(6, 6, 6, 5), jnp.float32)
    extent = 8.0
    pts = jnp.asarray(rng.uniform(-5.0, 5.0, (1000, 3)), jnp.float32)
    ref = sample_voxel_grid_world(grid, pts, extent)
    packed = pack_corner_grid(grid)
    assert packed.shape == (6, 6, 6, 40)
    out = sample_packed_voxel_grid_world(packed, pts, extent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # golden cross-check vs torch grid_sample fixtures
    g2 = jnp.asarray(np.moveaxis(GOLD["grid"][0], 0, -1))
    out2 = sample_packed_voxel_grid_world(
        pack_corner_grid(g2), jnp.asarray(GOLD["world"]), float(GOLD["extent"])
    )
    np.testing.assert_allclose(np.asarray(out2)[0], GOLD["sampled"], atol=1e-5)
