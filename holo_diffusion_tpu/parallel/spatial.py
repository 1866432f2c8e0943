"""Spatial (tensor-parallel) sharding of the 3D UNet for large voxel grids.

Beyond-reference scale-out (SURVEY.md §5/§7 phase 7: "optional 128^3 grid
with sharded UNet"): the reference is data-parallel only and caps one voxel
grid per GPU (holo_diffusion_model.py:326). Here the latent's spatial D axis
is sharded over the mesh and XLA GSPMD partitions every Conv3d automatically,
inserting the halo exchanges (collective-permutes) a hand-written
NCCL/MPI decomposition would need — the TPU-idiomatic approach: annotate
shardings, let the compiler place collectives on ICI.

Works for denoising (UNet fwd) and the DDPM sampling loop; attention blocks
at ds 4/8 operate on few tokens and are all-gathered by GSPMD where needed.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for (B, D, H, W, C) latents: D sharded over `axis_name`."""
    return NamedSharding(mesh, P(None, axis_name, None, None, None))


def make_sharded_denoiser(
    model,
    mesh: Mesh,
    axis_name: str = "data",
    donate: bool = False,
) -> Callable:
    """jit'd fn(params, x, t) -> eps/x0 with the latent spatially sharded.

    `model` is a UNetModel3D-like flax module (or HoloDiffusionModel —
    dispatched through apply_net_3d). The latent's D extent must be divisible
    by the mesh size.
    """
    from ..models.holo_model import HoloDiffusionModel

    x_sh = spatial_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())

    def fwd(params, x, t):
        if isinstance(model, HoloDiffusionModel):
            return model.apply(
                params, x, t, method=HoloDiffusionModel.apply_net_3d
            )
        return model.apply(params, x, t)

    return jax.jit(
        fwd,
        in_shardings=(rep, x_sh, rep),
        out_shardings=x_sh,
        donate_argnums=(1,) if donate else (),
    )


def sample_random_voxel_features_sharded(
    model,
    params,
    rng: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    max_iter: Optional[int] = None,
) -> jnp.ndarray:
    """DDPM ancestral sampling with the latent sharded over the mesh —
    the multi-chip version of sampling.sample_random_voxel_features: one
    compiled scan, halo-exchanged convs on ICI, grid stays distributed until
    the final device_get."""
    from ..models import diffusion as gd
    from ..models.holo_model import HoloDiffusionModel
    from ..sampling import _schedule

    assert isinstance(model, HoloDiffusionModel)
    assert model.resol % mesh.devices.size == 0, (
        f"resol {model.resol} not divisible by mesh size {mesh.devices.size}"
    )
    shape = (1, model.resol, model.resol, model.resol, model.feature_size)
    sched = _schedule(model)
    x_sh = spatial_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())

    def run(params, rng):
        model_fn = lambda x, t: model.apply(
            params, x, t, method=HoloDiffusionModel.apply_net_3d
        )
        x = gd.p_sample_loop(
            sched, model_fn, shape, rng, clip_denoised=True, max_iter=max_iter
        )
        return jnp.clip(x, -1.0, 1.0)

    fn = jax.jit(run, in_shardings=(rep, rep), out_shardings=x_sh)
    return fn(params, rng)
