"""Pallas TPU kernel for the render hot path: world-space trilinear voxel
sampling as a VMEM-resident one-hot MXU matmul.

The reference's hot loop bottoms out in CUDA grid_sample
(holo_voxel_grid_implicit_function.py:217-221, SURVEY.md §3 "hot loops").
A TPU has no fast per-lane gather; random gathers lower to serialized
dynamic-slices. Instead we exploit two structural facts:

  1. the voxel grid is SMALL (16^3 x 64 feats = 1 MB) — it fits in VMEM, so
     every block of ray points can read it at register speed;
  2. trilinear interpolation is LINEAR in the grid: sample(points, grid) =
     W(points) @ grid_flat, where W is a row-stochastic matrix with 8
     nonzeros per row. Materializing W blockwise turns the gather into an
     MXU matmul (8 iota-compares on the VPU + one dot).

Bonus algebraic fusion (used by the implicit function): interpolation also
commutes with the RenderMLP's first Dense layer, so the grid can be projected
ONCE (grid @ W1, a (r^3, hidden) matmul) and the kernel samples first-layer
pre-activations directly — the per-point first layer disappears.

A pure-XLA fallback with identical semantics (`ops.voxel.sample_voxel_grid_world`)
is kept for CPU and for grids too large for VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _to_indices(points, D, H, W, extent):
    """World xyz -> (floor indices, fractional weights, in-bounds corner
    masks); identical arithmetic to ops.voxel.sample_voxel_grid_world."""
    voxel_size = extent / D
    ix = points[..., 0] / voxel_size + (W - 1) / 2.0
    iy = points[..., 1] / voxel_size + (H - 1) / 2.0
    iz = points[..., 2] / voxel_size + (D - 1) / 2.0
    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    return (x0, y0, z0), (ix - x0, iy - y0, iz - z0)


def _corner_terms(x0, y0, z0, fx, fy, fz, D, H, W):
    """Yield (linear index (clipped), weight incl. 0 for out-of-bounds) for
    each of the 8 trilinear corners."""
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                w = (
                    jnp.where(dx, fx, 1.0 - fx)
                    * jnp.where(dy, fy, 1.0 - fy)
                    * jnp.where(dz, fz, 1.0 - fz)
                )
                inside = (
                    (xi >= 0) & (xi <= W - 1)
                    & (yi >= 0) & (yi <= H - 1)
                    & (zi >= 0) & (zi <= D - 1)
                )
                xi = jnp.clip(xi, 0, W - 1)
                yi = jnp.clip(yi, 0, H - 1)
                zi = jnp.clip(zi, 0, D - 1)
                lin = ((zi * H + yi) * W + xi).astype(jnp.int32)
                yield lin, w * inside


def _sample_kernel(points_ref, grid_ref, out_ref, *, D, H, W, extent, block_n):
    """One block of points: build the 8-corner weight matrix in VMEM and hit
    the MXU. points_ref: (block_n, 128) padded xyz; grid_ref: (G, C);
    out_ref: (block_n, C)."""
    G = D * H * W
    pts = points_ref[:, :3]
    (x0, y0, z0), (fx, fy, fz) = _to_indices(pts, D, H, W, extent)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_n, G), 1)
    weight_mat = jnp.zeros((block_n, G), jnp.float32)
    for lin, w in _corner_terms(x0, y0, z0, fx, fy, fz, D, H, W):
        onehot = (col_ids == lin[:, None]).astype(jnp.float32)
        weight_mat = weight_mat + onehot * w[:, None]

    out_ref[:] = jnp.dot(
        weight_mat.astype(grid_ref.dtype),
        grid_ref[:],
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("extent", "block_n", "interpret"))
def trilinear_sample_pallas(
    grid: jnp.ndarray,
    points: jnp.ndarray,
    extent: float,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Trilinear world-space sampling via the one-hot MXU kernel.

    grid: (D, H, W, C) with D*H*W*itemsize small enough for VMEM (<= ~8 MB);
    points: (..., 3) world xyz. Returns (..., C) float32, zeros outside.
    """
    D, H, W, C = grid.shape
    G = D * H * W
    shape = points.shape[:-1]
    n = 1
    for s in shape:
        n *= s
    pts = points.reshape(n, 3)
    n_pad = -n % block_n
    pts = jnp.pad(pts, ((0, n_pad), (0, 0)))
    # pad xyz lane dim to 128 for clean VMEM tiling
    pts = jnp.pad(pts, ((0, 0), (0, 125)))
    grid_flat = grid.reshape(G, C)

    out = pl.pallas_call(
        functools.partial(
            _sample_kernel, D=D, H=H, W=W, extent=extent, block_n=block_n
        ),
        grid=( (n + n_pad) // block_n, ),
        in_specs=[
            pl.BlockSpec((block_n, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, C), jnp.float32),
        interpret=interpret,
    )(pts, grid_flat)
    return out[:n].reshape(*shape, C)


def trilinear_sample_onehot_xla(
    grid: jnp.ndarray, points: jnp.ndarray, extent: float, block_n: int = 1024
) -> jnp.ndarray:
    """Same one-hot-matmul algorithm in pure XLA (lax.map over point blocks) —
    a portable middle ground between the gather fallback and the Pallas
    kernel; useful for benchmarking the three strategies."""
    D, H, W, C = grid.shape
    G = D * H * W
    shape = points.shape[:-1]
    pts = points.reshape(-1, 3)
    n = pts.shape[0]
    n_pad = -n % block_n
    pts = jnp.pad(pts, ((0, n_pad), (0, 0)))
    grid_flat = grid.reshape(G, C)

    def block(p):
        (x0, y0, z0), (fx, fy, fz) = _to_indices(p, D, H, W, extent)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_n, G), 1)
        wm = jnp.zeros((block_n, G), jnp.float32)
        for lin, w in _corner_terms(x0, y0, z0, fx, fy, fz, D, H, W):
            wm = wm + (col == lin[:, None]) * w[:, None]
        return jnp.dot(wm.astype(grid_flat.dtype), grid_flat,
                       preferred_element_type=jnp.float32)

    blocks = pts.reshape(-1, block_n, 3)
    out = jax.lax.map(block, blocks).reshape(-1, C)
    return out[:n].reshape(*shape, C)
