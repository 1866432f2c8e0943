"""Pallas kernel tests (interpret mode on CPU): the one-hot MXU trilinear
sampler must agree exactly with the gather-based XLA reference, including the
linear-layer commutation identity used for fusion."""
import jax
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.ops.pallas.fused_render import (
    trilinear_sample_onehot_xla,
    trilinear_sample_pallas,
)
from holo_diffusion_tpu.ops.voxel import sample_voxel_grid_world


def _data(D=8, C=16, n=300, seed=0):
    rng = np.random.RandomState(seed)
    grid = jnp.asarray(rng.randn(D, D, D, C), jnp.float32)
    extent = 4.0
    half = extent * (D - 1) / D / 2 * 1.3  # include out-of-bounds points
    pts = jnp.asarray(rng.uniform(-half, half, (n, 3)), jnp.float32)
    return grid, pts, extent


def test_onehot_xla_matches_gather():
    grid, pts, extent = _data()
    ref = sample_voxel_grid_world(grid, pts, extent)
    out = trilinear_sample_onehot_xla(grid, pts, extent, block_n=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_matches_gather_interpret():
    grid, pts, extent = _data()
    ref = sample_voxel_grid_world(grid, pts, extent)
    out = trilinear_sample_pallas(grid, pts, extent, block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_multidim_points():
    grid, pts, extent = _data(n=256)
    pts3 = pts.reshape(2, 8, 16, 3)
    out = trilinear_sample_pallas(grid, pts3, extent, block_n=64, interpret=True)
    assert out.shape == (2, 8, 16, grid.shape[-1])
    ref = sample_voxel_grid_world(grid, pts3, extent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_linear_layer_commutes_with_trilinear():
    """sample(grid) @ W == sample(grid @ W): the fusion identity that lets the
    implicit function sample first-layer pre-activations directly."""
    grid, pts, extent = _data(C=8)
    Wmat = jnp.asarray(np.random.RandomState(1).randn(8, 24), jnp.float32)
    a = sample_voxel_grid_world(grid, pts, extent) @ Wmat
    proj_grid = jnp.einsum("dhwc,co->dhwo", grid, Wmat)
    b = sample_voxel_grid_world(proj_grid, pts, extent)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
