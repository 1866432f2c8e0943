"""Fused trilinear voxel sampling as a Kronecker-factored MXU matmul, with a
custom VJP whose grid cotangent is ACCUMULATED IN VMEM (no HBM scatter).

This is the TPU-native replacement for the render stack's hot op — CUDA
`grid_sample` forward + scatter-add backward in the reference
(holo_voxel_grid_implicit_function.py:217-221; SURVEY.md §3 hot-loop ranking).

Key structure. The trilinear interpolation matrix W (N_pts, D*H*W) is a row-
wise Kronecker product of three tiny 1-D hat-function matrices:

    W[n, (z*H + y)*W + x] = hz[n,z] * hy[n,y] * hx[n,x],
    h*[n, i] = relu(1 - |idx*_n - i|)        (zero-padding falls out: points
                                              outside the grid get all-zero h)

so sampling factorizes into ONE dense MXU matmul per point block plus cheap
VPU outer products — no per-lane gather (TPUs have none), no O(N*G) one-hot
construction on the VPU (the weakness of the iota-one-hot kernel in
fused_render.py):

    forward:   wzy[n, zH+y] = hz*hy                (VPU, block_n x D*H lanes)
               B = wzy @ grid_mat                  (MXU; grid_mat = (D*H, W*C))
               out[n, c] = sum_x hx[n, x] * B[n, x*C + c]   (VPU, W slices)

    backward:  F[n, x*C+c] = hx[n, x] * g[n, c]    (VPU)
               d_grid += wzy^T @ F                 (MXU, accumulated in VMEM
                                                    across point blocks —
                                                    NO scatter, NO HBM traffic)
               d_points (only when needed, e.g. the autodiff normals path
               holo_voxel_grid_implicit_function.py:131-145) from two more
               matmuls reusing B and E2 = F @ grid_mat^T; the d_points kernel
               is a separate pallas_call so XLA dead-code-eliminates it in
               ordinary training (ray points carry no trainable gradient).

Cost: O(N * D*H*W * C) MXU FLOPs — at the RELEASE sampling scale the grid is
16^3 x 64 (the model overrides the implicit function's resol/n_hidden with
resol=16/feature_size=64, holo_diffusion_model.py:152-155; the yaml's
resol:32/n_hidden:128 fields are dead), i.e. ~0.26 MFLOP/point: far below
MXU roofline for the ~0.9M points of a train step, where the gather-based
samplers are issue-bound at ~13 ns/row. For grids too large for this tradeoff
(D^3*C > fused_max_gc) callers should fall back to the packed gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest D*H*W*C for which the kron-matmul beats the packed gather
# (16^3 * 64 = 262144 is the release scale; 8x that is already a wash)
DEFAULT_MAX_GC = 16 ** 3 * 64


def _indices(pts, D, H, W, extent):
    """World xyz -> continuous voxel indices (align_corners semantics,
    identical arithmetic to ops.voxel.sample_voxel_grid_world)."""
    voxel_size = extent / D
    ix = pts[:, 0] / voxel_size + (W - 1) / 2.0
    iy = pts[:, 1] / voxel_size + (H - 1) / 2.0
    iz = pts[:, 2] / voxel_size + (D - 1) / 2.0
    return ix, iy, iz


def _wzy(iz, iy, D, H, block_n):
    """(block_n, D*H) combined z/y hat weights; lane q = z*H + y."""
    q = jax.lax.broadcasted_iota(jnp.int32, (block_n, D * H), 1)
    zq = (q // H).astype(jnp.float32)
    yq = (q % H).astype(jnp.float32)
    hz = jnp.maximum(0.0, 1.0 - jnp.abs(iz[:, None] - zq))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[:, None] - yq))
    return hz * hy


def _hx_lanes(ix, W, C, block_n):
    """(block_n, W*C) x hat weights broadcast over channels; lane l = x*C+c."""
    l = jax.lax.broadcasted_iota(jnp.int32, (block_n, W * C), 1)
    xq = (l // C).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, None] - xq))


def _fwd_kernel(points_ref, grid_ref, out_ref, *, D, H, W, C, extent,
                block_n, precision):
    pts = points_ref[:, :3]
    ix, iy, iz = _indices(pts, D, H, W, extent)
    wzy = _wzy(iz, iy, D, H, block_n)
    B = jnp.dot(wzy, grid_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    xpos = jax.lax.broadcasted_iota(jnp.int32, (block_n, W), 1).astype(
        jnp.float32
    )
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, None] - xpos))  # (block_n, W)
    out = jnp.zeros((block_n, C), jnp.float32)
    for x in range(W):
        out = out + B[:, x * C:(x + 1) * C] * hx[:, x:x + 1]
    out_ref[:] = out


def _dgrid_kernel(
    points_ref, g_ref, dgrid_ref, *, D, H, W, C, extent, block_n, precision
):
    """Accumulates d_grid_mat (D*H, W*C) in VMEM over all point blocks."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dgrid_ref[:] = jnp.zeros_like(dgrid_ref)

    pts = points_ref[:, :3]
    ix, iy, iz = _indices(pts, D, H, W, extent)
    wzy = _wzy(iz, iy, D, H, block_n)
    hxl = _hx_lanes(ix, W, C, block_n)
    g_tiled = jnp.concatenate([g_ref[:]] * W, axis=1)  # (block_n, W*C)
    F = hxl * g_tiled
    dgrid_ref[:] += jax.lax.dot_general(
        wzy, F, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _dpoints_kernel(
    points_ref, g_ref, grid_ref, dpts_ref, *, D, H, W, C, extent, block_n,
    precision
):
    """d(out)/d(points) — exercised only by the autodiff-normals path."""
    pts = points_ref[:, :3]
    ix, iy, iz = _indices(pts, D, H, W, extent)
    wzy = _wzy(iz, iy, D, H, block_n)
    grid_mat = grid_ref[:]
    B = jnp.dot(wzy, grid_mat, preferred_element_type=jnp.float32,
                precision=precision)

    # lane helpers over (block_n, W*C)
    l = jax.lax.broadcasted_iota(jnp.int32, (block_n, W * C), 1)
    xq = (l // C).astype(jnp.float32)
    dx_abs = ix[:, None] - xq
    hxl = jnp.maximum(0.0, 1.0 - jnp.abs(dx_abs))
    # d/d ix of relu(1 - |ix - x|): -sign(ix - x) inside the support
    dhxl = jnp.where(jnp.abs(dx_abs) < 1.0, -jnp.sign(dx_abs), 0.0)
    g_tiled = jnp.concatenate([g_ref[:]] * W, axis=1)
    gB = g_tiled * B
    d_ix = jnp.sum(dhxl * gB, axis=1)

    F = hxl * g_tiled
    # E2[n, q] = sum_{xc} F[n, xc] grid_mat[q, xc]
    E2 = jax.lax.dot_general(
        F, grid_mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    q = jax.lax.broadcasted_iota(jnp.int32, (block_n, D * H), 1)
    zq = (q // H).astype(jnp.float32)
    yq = (q % H).astype(jnp.float32)
    dz_abs = iz[:, None] - zq
    dy_abs = iy[:, None] - yq
    hz = jnp.maximum(0.0, 1.0 - jnp.abs(dz_abs))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy_abs))
    dhz = jnp.where(jnp.abs(dz_abs) < 1.0, -jnp.sign(dz_abs), 0.0)
    dhy = jnp.where(jnp.abs(dy_abs) < 1.0, -jnp.sign(dy_abs), 0.0)
    d_iy = jnp.sum((hz * dhy) * E2, axis=1)
    d_iz = jnp.sum((dhz * hy) * E2, axis=1)

    inv_vs = D / extent  # d idx / d world-coordinate
    # concat, not .at[].set — dynamic-update lowers to scatter (unsupported)
    dpts_ref[:] = jnp.concatenate(
        [
            (d_ix * inv_vs)[:, None],
            (d_iy * inv_vs)[:, None],
            (d_iz * inv_vs)[:, None],
            jnp.zeros((block_n, PT_LANES - 3), jnp.float32),
        ],
        axis=1,
    )


PT_LANES = 8  # xyz + 5 pad lanes — NOT 128: padding points to a full lane
# tile materialized a 42x-amplified HBM buffer (226 MB per pass at the train
# point count), measured as part of the ~7 ms non-kernel overhead (round 3)


def _pad_points(points_flat, block_n):
    n = points_flat.shape[0]
    n_pad = -n % block_n
    pts = jnp.pad(points_flat, ((0, n_pad), (0, PT_LANES - 3)))
    return pts, n, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kron_sample(cfg, grid, points_flat):
    return _kron_fwd_impl(cfg, grid, points_flat)


def _kron_fwd_impl(cfg, grid, points_flat):
    extent, block_n, interpret, precision = cfg
    D, H, W, C = grid.shape
    pts, n, n_pad = _pad_points(points_flat, block_n)
    grid_mat = grid.reshape(D * H, W * C)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, D=D, H=H, W=W, C=C, extent=extent, block_n=block_n,
            precision=precision,
        ),
        grid=((n + n_pad) // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * H, W * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, C), jnp.float32),
        interpret=interpret,
    )(pts, grid_mat)
    return out[:n]


def _kron_fwd(cfg, grid, points_flat):
    return _kron_fwd_impl(cfg, grid, points_flat), (grid, points_flat)


def _kron_bwd(cfg, residuals, g):
    extent, block_n, interpret, precision = cfg
    grid, points_flat = residuals
    D, H, W, C = grid.shape
    pts, n, n_pad = _pad_points(points_flat, block_n)
    g_pad = jnp.pad(g.astype(jnp.float32), ((0, n_pad), (0, 0)))
    n_blocks = (n + n_pad) // block_n

    dgrid_mat = pl.pallas_call(
        functools.partial(
            _dgrid_kernel, D=D, H=H, W=W, C=C, extent=extent,
            block_n=block_n, precision=precision,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D * H, W * C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D * H, W * C), jnp.float32),
        interpret=interpret,
    )(pts, g_pad)
    d_grid = dgrid_mat.reshape(D, H, W, C).astype(grid.dtype)

    # separate pallas_call: DCE'd by XLA whenever the points cotangent is
    # unused (every ordinary train step — ray points have no trainable deps)
    dpts = pl.pallas_call(
        functools.partial(
            _dpoints_kernel, D=D, H=H, W=W, C=C, extent=extent,
            block_n=block_n, precision=precision,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * H, W * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, PT_LANES), jnp.float32),
        interpret=interpret,
    )(pts, g_pad, grid.reshape(D * H, W * C))
    d_points = dpts[:n, :3].astype(points_flat.dtype)
    return d_grid, d_points


_kron_sample.defvjp(_kron_fwd, _kron_bwd)


def trilinear_sample_fused(
    grid: jnp.ndarray,
    points: jnp.ndarray,
    extent: float,
    block_n: int = 512,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Trilinear world-space sampling via the Kronecker-factored MXU kernel.

    grid: (D, H, W, C); points: (..., 3) world xyz. Returns (..., C) float32,
    zeros outside the grid (grid_sample zero padding, align_corners=True) —
    exactly `ops.voxel.sample_voxel_grid_world` semantics, differentiable in
    both grid (VMEM-accumulated, no scatter) and points.

    precision: MXU precision for the kron matmuls — "highest" (3-pass f32,
    matches the f32 VPU gather samplers to ~1e-6) or "default" (one bf16
    pass, ~4e-3 relative error on the sampled features, ~2x kernel speed).
    """
    shape = points.shape[:-1]
    flat = points.reshape(-1, 3).astype(jnp.float32)
    out = _kron_sample(
        (float(extent), int(block_n), bool(interpret), str(precision)),
        grid.astype(jnp.float32),
        flat,
    )
    return out.reshape(*shape, grid.shape[-1])


def trilinear_point_gradient(
    grid: jnp.ndarray,
    points: jnp.ndarray,
    extent: float,
    block_n: int = 512,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Analytic d/d(points) of ``trilinear_sample_fused(grid, points).sum(-1)``
    as a DIRECT `_dpoints_kernel` call — no autodiff involved, so it is safe
    inside an outer `jax.grad` (a nested `jax.grad` over the custom_vjp
    sampler fails linearization when `grid` is parameter-dependent, because
    the VJP is first-order only). Inputs are treated as constants
    (`stop_gradient`): the only consumer is the visualization-only normals
    aux (models/implicit.py), which no training loss reads.

    grid: (D, H, W, C); points: (..., 3) world xyz. Returns (..., 3) f32.
    """
    grid = jax.lax.stop_gradient(grid.astype(jnp.float32))
    points = jax.lax.stop_gradient(points)
    D, H, W, C = grid.shape
    shape = points.shape[:-1]
    flat = points.reshape(-1, 3).astype(jnp.float32)
    pts, n, n_pad = _pad_points(flat, block_n)
    n_blocks = (n + n_pad) // block_n
    g_ones = jnp.ones((n + n_pad, C), jnp.float32)
    dpts = pl.pallas_call(
        functools.partial(
            _dpoints_kernel, D=D, H=H, W=W, C=C, extent=float(extent),
            block_n=int(block_n), precision=str(precision),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * H, W * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, PT_LANES), jnp.float32),
        interpret=interpret,
    )(pts, g_ones, grid.reshape(D * H, W * C))
    return dpts[:n, :3].reshape(*shape, 3)
