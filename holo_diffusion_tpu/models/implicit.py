"""Voxel-grid implicit function: trilinear world-space sampling + RenderMLP
(reference: holo_voxel_grid_implicit_function.py:148-269).

A single shared instance decodes all rendering passes — the reference reuses
one wrapped implicit function so the RenderMLP is not replicated
(holo_diffusion_model.py:165-169); here that falls out naturally from flax
param sharing (one module, many applies).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxel import sample_voxel_grid_world
from .render_mlp import RenderMLP

_HI = jax.lax.Precision.HIGHEST


def _normalize(v, eps=1e-12):
    # torch F.normalize semantics: v / max(||v||, eps)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


class VoxelGridImplicitFunction(nn.Module):
    """forward(grid, points, directions) -> (densities, features, aux).

    grid: (D, H, W, C) voxel features (channels-last; batch of 1 voxel grid
    per device, mirroring holo_diffusion_model.py:326).
    """

    resol: int = 32
    volume_extent: float = 8.0
    n_hidden: int = 128
    feature_dim: int = 0  # forced to 0 by the model (holo_diffusion_model.py:157)
    render_normals: bool = False
    render_mlp_args: dict = None
    # voxel sampling strategy:
    #   "auto"   — fused kron kernel on TPU when the grid is small enough
    #              (the release scale 16^3 x 64 qualifies; the reference
    #              overrides resol/n_hidden with the model's 16/64,
    #              holo_diffusion_model.py:152-155), packed gather otherwise;
    #   "fused"  — Kronecker-factored MXU kernel, custom VJP with the grid
    #              cotangent accumulated in VMEM (ops/pallas/kron_sample.py);
    #   "packed" — corner-packed single gather (ops/voxel.py::pack_corner_grid);
    #   "gather" — plain XLA 8-gather;
    #   "pallas"/"onehot_xla" — one-hot MXU variants (benchmark baselines).
    sampler: str = "auto"
    # MXU precision of the fused sampler's matmuls: "default" = one bf16 pass
    # (~4e-3 relative error on sampled features — the features are tanh-
    # bounded to [-1,1], so absolute error ~4e-3; measured 2.5x faster
    # fwd+bwd than the packed gather on v5e) or "highest" = 3-pass f32
    # (~1e-6, parity with the gather samplers, ~gather speed).
    sampler_precision: str = "default"
    # Collapse the density net into the sampling matmul ("auto"/"on"/"off"):
    # under the release config the density MLP is an affine map of the
    # sampled features (see RenderMLP.density_net_is_collapsible), so instead
    # of sampling C channels and running a 4-layer per-point MLP, project the
    # grid ONCE by the collapsed (C, hidden+1) matrix and sample
    # pre-activations directly — the per-point density net disappears.
    # MEASURED (v5e, 442k pts): kron sampling scales ~linearly in C
    # (C=64: 12.7/12.6 ms fwd/bwd; C=264: 37.5/35.9) so the widened sample
    # (~73 ms f+b) LOSES to sample(64)+MLP (~42 ms) — "auto" therefore
    # resolves to OFF; the exact-equivalence path stays available ("on")
    # for configs with wider grids or narrower hidden dims.
    collapse_density: str = "auto"
    # Fully-fused sample+decode Pallas kernel ("auto"/"on"/"off",
    # ops/pallas/fused_decode.py): applies the collapsed density affine to
    # the VMEM-resident samples INSIDE the kernel (narrow channels, unlike
    # collapse_density) plus the radiance head — only density+rgb leave VMEM.
    fuse_decode: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        args = dict(self.render_mlp_args or {})
        args.update(
            input_dims=self.n_hidden,
            output_feature_dims=3,
            output_vp_independent_feature_dims=self.feature_dim,
            dtype=self.dtype,
        )
        self.render_mlp = RenderMLP(**args)

    def _sample(self, voxel_grid, points):
        sampler = self.sampler
        if sampler == "auto":
            from ..ops.pallas.kron_sample import DEFAULT_MAX_GC

            D, H, W, C = voxel_grid.shape
            on_tpu = jax.default_backend() == "tpu"
            sampler = "fused" if (on_tpu and D * H * W * C <= DEFAULT_MAX_GC) \
                else "packed"
        if sampler == "fused":
            from ..ops.pallas.kron_sample import trilinear_sample_fused

            return trilinear_sample_fused(
                voxel_grid, points, self.volume_extent,
                interpret=jax.default_backend() != "tpu",
                precision=self.sampler_precision,
            )
        if sampler == "packed":
            from ..ops.voxel import (
                pack_corner_grid,
                sample_packed_voxel_grid_world,
            )

            # XLA CSEs the packing across passes inside one jit program
            packed = pack_corner_grid(voxel_grid)
            return sample_packed_voxel_grid_world(
                packed, points, self.volume_extent
            )
        if sampler == "pallas":
            from ..ops.pallas.fused_render import trilinear_sample_pallas

            return trilinear_sample_pallas(
                voxel_grid, points, self.volume_extent
            )
        if sampler == "onehot_xla":
            from ..ops.pallas.fused_render import trilinear_sample_onehot_xla

            return trilinear_sample_onehot_xla(
                voxel_grid, points, self.volume_extent
            )
        return sample_voxel_grid_world(voxel_grid, points, self.volume_extent)

    def __call__(
        self,
        voxel_grid: jnp.ndarray,
        ray_points_world: jnp.ndarray,
        ray_directions: Optional[jnp.ndarray] = None,
    ):
        """voxel_grid: (D, H, W, C); ray_points_world: (..., P, 3);
        ray_directions: (..., 3) per-ray (expanded over P) or None (dummy ones,
        matching the pts_3d path, holo_voxel_grid_implicit_function.py:232-238).
        """
        collapse = self.collapse_density
        if collapse == "auto":
            collapse = "off"  # measured slower at release scale (see field doc)
        if self.is_initializing():
            # init must run the layer-by-layer path so every density-net
            # param gets created before the collapse reads them
            collapse = "off"

        if ray_directions is None:
            dirs_shape = ray_points_world.shape[:-1] + (3,)
            dirs = jnp.ones(dirs_shape, jnp.float32)
        else:
            dirs = jnp.broadcast_to(
                _normalize(ray_directions)[..., None, :],
                ray_points_world.shape[:-1] + (3,),
            )

        fuse = self.fuse_decode
        if fuse == "auto":
            from ..ops.pallas.kron_sample import DEFAULT_MAX_GC

            D_, H_, W_, C_ = voxel_grid.shape
            fuse = (
                "on"
                if (
                    jax.default_backend() == "tpu"
                    and self.render_mlp.decode_is_fusable
                    and D_ * H_ * W_ * C_ <= DEFAULT_MAX_GC
                )
                else "off"
            )
        if self.is_initializing():
            fuse = "off"

        fused_grads = None
        if fuse == "on":
            assert self.render_mlp.decode_is_fusable
            from ..ops.pallas.fused_decode import fused_sample_decode

            A, c = self.render_mlp.density_affine()
            Wr, br = self.render_mlp.radiance_linear()
            # directions are constant along a ray: harmonic-encode the
            # per-RAY unit dirs and broadcast over P — identical values,
            # 1/P the sin/cos transcendentals (P=64-128 at release scale)
            if ray_directions is not None:
                pe_ray = self.render_mlp.encode_dirs(
                    _normalize(ray_directions)
                )
                pe_dirs = jnp.broadcast_to(
                    pe_ray[..., None, :],
                    ray_points_world.shape[:-1] + (pe_ray.shape[-1],),
                )
            else:
                pe_dirs = self.render_mlp.encode_dirs(dirs)
            g1 = None
            if self.render_normals:
                # normals ride the SAME kernel (lanes 4:7): the analytic
                # density-field gradient replaces the separate
                # trilinear_point_gradient pallas_call (~2 ms/step measured,
                # scripts/profile_render_residual_r4.py)
                g1 = jax.lax.stop_gradient(
                    jnp.einsum(
                        "dhwc,c->dhw", voxel_grid, A[:, -1], precision=_HI
                    )
                )
            out = fused_sample_decode(
                voxel_grid, A, c, Wr, br, ray_points_world, pe_dirs,
                extent=self.volume_extent,
                hidden=self.render_mlp.dnet_hidden_dim,
                interpret=jax.default_backend() != "tpu",
                precision=self.sampler_precision,
                g1=g1,
            )
            if g1 is not None:
                densities, colour, fused_grads = out
            else:
                densities, colour = out
            vp_feats = None
        elif collapse == "on":
            assert self.render_mlp.density_net_is_collapsible
            from ..ops.pallas.kron_sample import trilinear_sample_fused

            A, c = self.render_mlp.density_affine()
            grid_proj = jnp.einsum("dhwc,ce->dhwe", voxel_grid, A)
            pre = trilinear_sample_fused(
                grid_proj, ray_points_world, self.volume_extent,
                interpret=jax.default_backend() != "tpu",
                precision=self.sampler_precision,
            ) + c
            densities, colour, vp_feats = (
                self.render_mlp.decode_from_preactivation(pre, dirs)
            )
        else:
            sampled = self._sample(voxel_grid, ray_points_world)
            densities, colour, vp_feats = self.render_mlp(sampled, dirs)

        aux = {}
        if self.render_normals and fused_grads is not None:
            aux["normals"] = _normalize(fused_grads)
        elif self.render_normals:
            # normals = normalize(d density / d p) (get_normals,
            # holo_voxel_grid_implicit_function.py:131-145). Under the release
            # config the density net is EXACTLY affine (density_affine), so
            # the scalar field is a trilinear interpolation of the C=1 grid
            # grid @ A[:, -1] and its spatial gradient is analytic — one kron
            # d_points Pallas kernel instead of re-sampling + re-running the
            # density MLP under jax.grad (measured: the autodiff path undoes
            # most of the fused-decode win at release eval settings).
            if self.render_mlp.density_net_is_collapsible:
                # direct analytic kernel — NOT jax.grad: nesting grad over
                # the custom_vjp sampler fails linearization under the outer
                # train-step grad (the VJP is first-order only). Inputs are
                # stop_gradient'd inside; normals are visualization-only aux
                # so no loss gradient is lost (the reference's
                # create_graph=True normals likewise never reach a loss).
                from ..ops.pallas.kron_sample import trilinear_point_gradient

                A, c = self.render_mlp.density_affine()
                g1 = jnp.einsum(
                    "dhwc,c->dhw", voxel_grid, A[:, -1], precision=_HI
                )[..., None]
                grads = trilinear_point_gradient(
                    g1, ray_points_world, self.volume_extent,
                    interpret=jax.default_backend() != "tpu",
                    precision=self.sampler_precision,
                )
            else:
                def density_at(p):
                    feats = self._sample(voxel_grid, p)
                    return self.render_mlp.density(feats).sum()

                grads = jax.grad(density_at)(ray_points_world)
            aux["normals"] = _normalize(grads)

        features = colour
        if vp_feats is not None:
            features = jnp.concatenate([colour, vp_feats], axis=-1)
        return densities, features, aux
