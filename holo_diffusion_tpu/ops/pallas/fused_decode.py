"""Fully-fused render decode: trilinear sample + density net + radiance head
in ONE Pallas kernel per point block — the north-star render fusion
(SURVEY.md §2.9 "Pallas fused ray-render kernel"; reference hot loop
holo_voxel_grid_implicit_function.py:217-247).

Builds on two measured facts (BASELINE.md):
  * the Kronecker-factored sampler (kron_sample.py) makes sampling an MXU
    matmul with a VMEM-accumulated backward;
  * the release-config density net is EXACTLY affine in the sampled features
    (RenderMLP.density_net_is_collapsible): pre = s @ A + c with the
    collapsed (C, hidden+1) matrix A — but sampling a grid pre-projected by
    A is 3x slower (channel count dominates the kron matmul), while applying
    A to the VMEM-resident samples inside the kernel costs C*(hidden+1)
    FLOPs/point (~0.1 ms total) and keeps the sampled channels narrow.

So the kernel computes, per block, entirely in VMEM:

    s    = kron_sample(points, grid)                  (MXU)
    h    = leaky_relu(s @ A + c)                      (MXU + VPU)
    rin  = [h[:, :hidden] | pe_dirs]
    rgb  = sigmoid(leaky_relu(rin @ Wr + br))         (MXU + VPU)
    out  = [density = h[:, hidden] | rgb]

writing only 4 floats/point — the per-layer activation round-trips through
HBM (measured 11.5 ms fwd+bwd for the standalone RenderMLP at train-step
point counts) disappear. The custom VJP recomputes the forward per block and
accumulates d_grid, dA, dc, dWr, dbr in VMEM (no HBM scatter); gradients to
the ORIGINAL per-layer density kernels flow through the (tiny, differentiable)
collapse product outside the kernel.

Constraints (checked by the caller): feat_emb_dims=0, collapsible density
net, single-layer radiance head with LEAKYRELU quirk activation + sigmoid,
no vp-independent feature head, no normals autodiff through this op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kron_sample import PT_LANES, _hx_lanes, _indices, _wzy

NEG_SLOPE = 0.2  # torch.nn.LeakyReLU(0.2) (custom_modules.py:80-82)
OUT_LANES = 8  # [density | r | g | b | pad...]


def _lrelu(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _dlrelu(x):
    return jnp.where(x >= 0, 1.0, NEG_SLOPE)


def _sample_block(points_ref, grid_ref, D, H, W, C, extent, block_n, precision):
    pts = points_ref[:, :3]
    ix, iy, iz = _indices(pts, D, H, W, extent)
    wzy = _wzy(iz, iy, D, H, block_n)
    B = jnp.dot(wzy, grid_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    xpos = jax.lax.broadcasted_iota(jnp.int32, (block_n, W), 1).astype(
        jnp.float32
    )
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, None] - xpos))
    s = jnp.zeros((block_n, C), jnp.float32)
    for x in range(W):
        s = s + B[:, x * C:(x + 1) * C] * hx[:, x:x + 1]
    return s, wzy, (ix, iy, iz), hx


def _normals_block(g1_ref, wzy, ix, iy, iz, D, H, extent, block_n, precision):
    """Analytic spatial gradient of the scalar trilinear field g1 at the
    block's points — the same arithmetic as kron_sample._dpoints_kernel with
    C=1 and an all-ones cotangent, but reusing the wzy hat factors this
    kernel already computed. g1_ref: (D*H, Wp) = (grid @ A[:, -1]) reshaped
    (+zero col pad); zero pad lanes contribute nothing to either product."""
    g1 = g1_ref[:]
    Wp = g1.shape[1]
    xpos = jax.lax.broadcasted_iota(jnp.int32, (block_n, Wp), 1).astype(
        jnp.float32
    )
    dx = ix[:, None] - xpos
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    dhx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
    B1 = jnp.dot(wzy, g1, preferred_element_type=jnp.float32,
                 precision=precision)  # (block_n, Wp)
    d_ix = jnp.sum(dhx * B1, axis=1)
    # E1[n, q] = sum_x hx[n, x] * g1[q, x]
    E1 = jax.lax.dot_general(
        hxp, g1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (block_n, D*H)
    q = jax.lax.broadcasted_iota(jnp.int32, (block_n, D * H), 1)
    zq = (q // H).astype(jnp.float32)
    yq = (q % H).astype(jnp.float32)
    dz = iz[:, None] - zq
    dy = iy[:, None] - yq
    hz = jnp.maximum(0.0, 1.0 - jnp.abs(dz))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
    dhz = jnp.where(jnp.abs(dz) < 1.0, -jnp.sign(dz), 0.0)
    dhy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
    d_iy = jnp.sum((hz * dhy) * E1, axis=1)
    d_iz = jnp.sum((dhz * hy) * E1, axis=1)
    inv_vs = D / extent
    return d_ix * inv_vs, d_iy * inv_vs, d_iz * inv_vs


def _decode(s, pe_ref, A_ref, c_ref, Wr_ref, br_ref, hidden, precision):
    pre = jnp.dot(s, A_ref[:], preferred_element_type=jnp.float32,
                  precision=precision) + c_ref[:]
    h_all = _lrelu(pre)
    rin = jnp.concatenate([h_all[:, :hidden], pe_ref[:]], axis=1)
    rpre = jnp.dot(rin, Wr_ref[:], preferred_element_type=jnp.float32,
                   precision=precision) + br_ref[:]
    rgb = jax.nn.sigmoid(_lrelu(rpre))
    return pre, h_all, rin, rpre, rgb


def _fwd_kernel(
    points_ref, pe_ref, grid_ref, A_ref, c_ref, Wr_ref, br_ref, out_ref,
    *, D, H, W, C, extent, block_n, hidden, precision,
):
    s, _, _, _ = _sample_block(
        points_ref, grid_ref, D, H, W, C, extent, block_n, precision
    )
    pre, h_all, rin, rpre, rgb = _decode(
        s, pe_ref, A_ref, c_ref, Wr_ref, br_ref, hidden, precision
    )
    # build by concat — dynamic-update (.at[].set) lowers to scatter, which
    # Pallas TPU does not implement
    out_ref[:] = jnp.concatenate(
        [
            h_all[:, hidden:hidden + 1],
            rgb[:, :3],
            jnp.zeros((block_n, OUT_LANES - 4), jnp.float32),
        ],
        axis=1,
    )


def _fwd_kernel_normals(
    points_ref, pe_ref, grid_ref, A_ref, c_ref, Wr_ref, br_ref, g1_ref,
    out_ref, *, D, H, W, C, extent, block_n, hidden, precision,
):
    """Forward + analytic density-field gradient in lanes 4:7 — replaces the
    separate trilinear_point_gradient pallas_call of the normals path
    (measured ~2 ms of the train step; the hat factors are already here)."""
    s, wzy, (ix, iy, iz), _ = _sample_block(
        points_ref, grid_ref, D, H, W, C, extent, block_n, precision
    )
    pre, h_all, rin, rpre, rgb = _decode(
        s, pe_ref, A_ref, c_ref, Wr_ref, br_ref, hidden, precision
    )
    gx, gy, gz = _normals_block(
        g1_ref, wzy, ix, iy, iz, D, H, extent, block_n, precision
    )
    out_ref[:] = jnp.concatenate(
        [
            h_all[:, hidden:hidden + 1],
            rgb[:, :3],
            gx[:, None],
            gy[:, None],
            gz[:, None],
            jnp.zeros((block_n, OUT_LANES - 7), jnp.float32),
        ],
        axis=1,
    )


def _bwd_kernel(
    points_ref, pe_ref, g_ref, grid_ref, A_ref, c_ref, Wr_ref, br_ref,
    dgrid_ref, dA_ref, dc_ref, dWr_ref, dbr_ref,
    *, D, H, W, C, extent, block_n, hidden, precision,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgrid_ref[:] = jnp.zeros_like(dgrid_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dWr_ref[:] = jnp.zeros_like(dWr_ref)
        dbr_ref[:] = jnp.zeros_like(dbr_ref)

    s, wzy, (ix, _, _), _ = _sample_block(
        points_ref, grid_ref, D, H, W, C, extent, block_n, precision
    )
    pre, h_all, rin, rpre, rgb = _decode(
        s, pe_ref, A_ref, c_ref, Wr_ref, br_ref, hidden, precision
    )
    d_density = g_ref[:, 0:1]
    d_rgb = g_ref[:, 1:4]

    d_rpre = jnp.concatenate(
        [
            d_rgb * rgb[:, :3] * (1.0 - rgb[:, :3]),
            jnp.zeros((block_n, rpre.shape[1] - 3), jnp.float32),
        ],
        axis=1,
    ) * _dlrelu(rpre)
    dWr_ref[:] += jax.lax.dot_general(
        rin, d_rpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dbr_ref[:] += jnp.sum(d_rpre, axis=0, keepdims=True)
    d_rin = jax.lax.dot_general(
        d_rpre, Wr_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    n_pre = pre.shape[1]
    d_h_all = jnp.concatenate(
        [
            d_rin[:, :hidden],
            d_density,
            jnp.zeros((block_n, n_pre - hidden - 1), jnp.float32),
        ],
        axis=1,
    )
    d_pre = d_h_all * _dlrelu(pre)
    dA_ref[:] += jax.lax.dot_general(
        s, d_pre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dc_ref[:] += jnp.sum(d_pre, axis=0, keepdims=True)
    d_s = jax.lax.dot_general(
        d_pre, A_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # d_grid += wzy^T @ (hx-broadcast * tiled d_s)  (kron_sample._dgrid_kernel)
    hxl = _hx_lanes(ix, W, C, block_n)
    F = hxl * jnp.concatenate([d_s] * W, axis=1)
    dgrid_ref[:] += jax.lax.dot_general(
        wzy, F, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _pad_rows(x, block_n):
    n = x.shape[0]
    n_pad = -n % block_n
    return jnp.pad(x, ((0, n_pad), (0, 0))), n, n_pad


def _pad_cols(x, mult):
    c = x.shape[-1]
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, -c % mult),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_decode(cfg, grid, A, c, Wr, br, points, pe_dirs, g1):
    return _fused_fwd_impl(cfg, grid, A, c, Wr, br, points, pe_dirs, g1)


def _prep(cfg, grid, A, c, Wr, br, points, pe_dirs):
    extent, block_n, hidden, interpret, precision = cfg
    D, H, W, C = grid.shape
    pts, n, n_pad = _pad_rows(
        jnp.pad(points.astype(jnp.float32), ((0, 0), (0, PT_LANES - 3))),
        block_n,
    )
    pe, _, _ = _pad_rows(_pad_cols(pe_dirs.astype(jnp.float32), 8), block_n)
    # A: (C, hidden+1) -> pad cols to a lane multiple; c row vector likewise
    Ap = _pad_cols(A.astype(jnp.float32), 8)
    cp = _pad_cols(c.astype(jnp.float32)[None], 8)
    # radiance: rows = hidden + pe_pad, cols -> 8
    pe_pad = pe.shape[1]
    Wrp = jnp.zeros((hidden + pe_pad, 8), jnp.float32)
    Wrp = Wrp.at[:hidden, :3].set(Wr[:hidden].astype(jnp.float32)[:, :3])
    Wrp = Wrp.at[hidden + 0:hidden + pe_dirs.shape[1], :3].set(
        Wr[hidden:].astype(jnp.float32)[:, :3]
    )
    brp = jnp.zeros((1, 8), jnp.float32).at[0, :3].set(br.astype(jnp.float32))
    grid_mat = grid.astype(jnp.float32).reshape(D * H, W * C)
    return (D, H, W, C, pts, pe, Ap, cp, Wrp, brp, grid_mat, n, n_pad,
            extent, block_n, hidden, interpret, precision)


def _fused_fwd_impl(cfg, grid, A, c, Wr, br, points, pe_dirs, g1):
    (D, H, W, C, pts, pe, Ap, cp, Wrp, brp, grid_mat, n, n_pad,
     extent, block_n, hidden, interpret, precision) = _prep(
        cfg, grid, A, c, Wr, br, points, pe_dirs)
    with_normals = g1 is not None
    n_blocks = (n + n_pad) // block_n
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                     memory_space=vm),
        pl.BlockSpec((block_n, pe.shape[1]), lambda i: (i, 0),
                     memory_space=vm),
        pl.BlockSpec(grid_mat.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(Ap.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(cp.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(Wrp.shape, lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec(brp.shape, lambda i: (0, 0), memory_space=vm),
    ]
    operands = [pts, pe, grid_mat, Ap, cp, Wrp, brp]
    kernel = _fwd_kernel
    if with_normals:
        g1_mat = _pad_cols(
            jax.lax.stop_gradient(g1).astype(jnp.float32).reshape(D * H, W), 8
        )
        in_specs.append(
            pl.BlockSpec(g1_mat.shape, lambda i: (0, 0), memory_space=vm)
        )
        operands.append(g1_mat)
        kernel = _fwd_kernel_normals
    out = pl.pallas_call(
        functools.partial(
            kernel, D=D, H=H, W=W, C=C, extent=extent, block_n=block_n,
            hidden=hidden, precision=precision,
        ),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, OUT_LANES), lambda i: (i, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, OUT_LANES), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:n, :7] if with_normals else out[:n, :4]


def _fused_fwd(cfg, grid, A, c, Wr, br, points, pe_dirs, g1):
    out = _fused_fwd_impl(cfg, grid, A, c, Wr, br, points, pe_dirs, g1)
    return out, (grid, A, c, Wr, br, points, pe_dirs)


def _fused_bwd(cfg, residuals, g):
    grid, A, c, Wr, br, points, pe_dirs = residuals
    (D, H, W, C, pts, pe, Ap, cp, Wrp, brp, grid_mat, n, n_pad,
     extent, block_n, hidden, interpret, precision) = _prep(
        cfg, grid, A, c, Wr, br, points, pe_dirs)
    n_blocks = (n + n_pad) // block_n
    g_pad, _, _ = _pad_rows(
        _pad_cols(g.astype(jnp.float32), OUT_LANES), block_n
    )
    vm = pltpu.VMEM
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=vm)
    dgrid_mat, dAp, dcp, dWrp, dbrp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, D=D, H=H, W=W, C=C, extent=extent, block_n=block_n,
            hidden=hidden, precision=precision,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, PT_LANES), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((block_n, pe.shape[1]), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((block_n, OUT_LANES), lambda i: (i, 0),
                         memory_space=vm),
            const(grid_mat.shape),
            const(Ap.shape),
            const(cp.shape),
            const(Wrp.shape),
            const(brp.shape),
        ],
        out_specs=(
            const(grid_mat.shape),
            const(Ap.shape),
            const(cp.shape),
            const(Wrp.shape),
            const(brp.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(grid_mat.shape, jnp.float32),
            jax.ShapeDtypeStruct(Ap.shape, jnp.float32),
            jax.ShapeDtypeStruct(cp.shape, jnp.float32),
            jax.ShapeDtypeStruct(Wrp.shape, jnp.float32),
            jax.ShapeDtypeStruct(brp.shape, jnp.float32),
        ),
        interpret=interpret,
    )(pts, pe, g_pad, grid_mat, Ap, cp, Wrp, brp)

    n_A = A.shape[1]
    pe_dim = pe_dirs.shape[1]
    d_grid = dgrid_mat.reshape(D, H, W, C).astype(grid.dtype)
    d_A = dAp[:, :n_A].astype(A.dtype)
    d_c = dcp[0, :n_A].astype(c.dtype)
    d_Wr = jnp.concatenate(
        [dWrp[:hidden, :3], dWrp[hidden:hidden + pe_dim, :3]], axis=0
    ).astype(Wr.dtype)
    d_br = dbrp[0, :3].astype(br.dtype)
    # g cotangent lanes 4:7 (normals) are intentionally dropped: the analytic
    # gradient lanes are stop_gradient by contract (visualization-only aux,
    # same semantics as kron_sample.trilinear_point_gradient)
    return d_grid, d_A, d_c, d_Wr, d_br, None, None, None


_fused_decode.defvjp(_fused_fwd, _fused_bwd)


def fused_sample_decode(
    grid: jnp.ndarray,
    A: jnp.ndarray,
    c: jnp.ndarray,
    Wr: jnp.ndarray,
    br: jnp.ndarray,
    points: jnp.ndarray,
    pe_dirs: jnp.ndarray,
    extent: float,
    hidden: int,
    block_n: int = 512,
    interpret: bool = False,
    precision: str = "default",
    g1: jnp.ndarray = None,
):
    """One-kernel render decode.

    grid: (D, H, W, C); A: (C, hidden+1) collapsed density affine; c:
    (hidden+1,); Wr: (hidden + pe_dim, 3) radiance kernel; br: (3,);
    points: (..., 3); pe_dirs: (..., pe_dim) harmonic-embedded unit dirs.
    Returns (densities (..., 1), rgb (..., 3)). Differentiable in
    grid/A/c/Wr/br (VMEM-accumulated), NOT in points/pe_dirs.

    g1: optional (D, H, W) scalar density field (grid @ A[:, -1]); when given,
    the kernel also emits its analytic spatial gradient at each point —
    returns (densities, rgb, grads (..., 3)) with grads stop_gradient (the
    normals path, replacing a second trilinear_point_gradient pallas_call).
    """
    shape = points.shape[:-1]
    flat_pts = points.reshape(-1, 3)
    flat_pe = pe_dirs.reshape(-1, pe_dirs.shape[-1])
    out = _fused_decode(
        (float(extent), int(block_n), int(hidden), bool(interpret),
         str(precision)),
        grid, A, c, Wr, br, flat_pts, flat_pe, g1,
    )
    if g1 is not None:
        out = out.reshape(*shape, 7)
        return out[..., 0:1], out[..., 1:4], out[..., 4:7]
    out = out.reshape(*shape, 4)
    return out[..., 0:1], out[..., 1:4]
