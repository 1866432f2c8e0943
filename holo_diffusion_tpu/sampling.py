"""Unconditional voxel-grid sampling via the trained denoiser.

Rebuild of `HoloDiffusionModel.sample_random_voxel_features[_progressive]`
(reference: holo_diffusion_model.py:173-199). Lives outside the model forward
so the 1000-step DDPM loop compiles once as a `lax.scan` (vs the reference's
sequential python loop) and is never embedded in eval traces.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import functools

from .models import diffusion as gd
from .models.holo_model import HoloDiffusionModel


def _schedule(model: HoloDiffusionModel) -> gd.DiffusionSchedule:
    keys = (
        "schedule_name", "num_steps", "beta_start_unscaled",
        "beta_end_unscaled", "model_mean_type", "model_var_type",
    )
    return gd.make_named_schedule(
        **{k: v for k, v in (model.diffusion_args or {}).items() if k in keys}
    )


def sample_random_voxel_features(
    model: HoloDiffusionModel,
    params,
    rng: jax.Array,
    max_iter: Optional[int] = None,
    use_ddim: bool = False,
    n_samples: int = 1,
    mesh=None,
) -> jnp.ndarray:
    """Full ancestral DDPM sampling -> (n_samples, r, r, r, C) in [-1, 1].

    Sampling is trivially data-parallel across samples (one grid per chip —
    the serving-throughput axis): with `mesh`, the batch axis is sharded over
    the mesh's first axis and the whole 1000-step scan runs as one SPMD
    program with ZERO collectives (the UNet is batch-parallel). n_samples
    should be a multiple of the mesh axis size for even sharding.
    """
    assert model.net_3d_enabled and model.diffusion_enabled
    shape = (
        n_samples, model.resol, model.resol, model.resol, model.feature_size
    )
    sched = _schedule(model)
    loop = gd.ddim_sample_loop if use_ddim else gd.p_sample_loop
    # max_iter = number of UNet evaluations in both modes. DDPM: reference
    # `max_iter` truncation (gaussian_diffusion.py:608-609). DDIM: the DDIM
    # paper's strided accelerated sampler (still covers T-1..0).
    kwargs = {"num_steps": max_iter} if use_ddim else {"max_iter": max_iter}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        # checkpoint-restored params arrive COMMITTED to one device; a jit
        # whose body constrains onto the mesh rejects single-device committed
        # args ("incompatible devices") — replicate them over the mesh first
        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, rep)
        rng = jax.device_put(rng, rep)

    # params must be jit ARGUMENTS — closures would embed them as constants
    @functools.partial(jax.jit, static_argnames=())
    def run(params, rng):
        rng_init, rng_loop = jax.random.split(rng)
        noise = jax.random.normal(rng_init, shape)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            noise = jax.lax.with_sharding_constraint(
                noise, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            )
        model_fn = lambda x, t: model.apply(
            params, x, t, method=HoloDiffusionModel.apply_net_3d
        )
        x = loop(
            sched, model_fn, shape, rng_loop, noise=noise,
            clip_denoised=True, **kwargs,
        )
        return jnp.clip(x, -1.0, 1.0)

    return run(params, rng)


def sample_random_voxel_features_progressive(
    model: HoloDiffusionModel,
    params,
    rng: jax.Array,
    max_iter: Optional[int] = None,
):
    """Generator over intermediate samples, each clipped to [-1, 1] — drives
    the progressive-denoise flyaround animation (flyaround.py:224-245)."""
    assert model.net_3d_enabled and model.diffusion_enabled
    shape = (1, model.resol, model.resol, model.resol, model.feature_size)
    sched = _schedule(model)

    @jax.jit
    def step(params, x, t, r):
        model_fn = lambda xx, tt: model.apply(
            params, xx, tt, method=HoloDiffusionModel.apply_net_3d
        )
        return gd.p_sample(sched, model_fn, x, t, r, clip_denoised=True)

    rng, rng_init = jax.random.split(rng)
    x = jax.random.normal(rng_init, shape)
    T = sched.num_timesteps
    if max_iter is None or max_iter >= T:
        ts = list(range(T - 1, -1, -1))
    else:
        ts = list(range(T - 1, T - max_iter, -1)) + [0]
    for t_scalar in ts:
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = step(params, x, t, step_rng)
        x = out["sample"]
        yield jnp.clip(x, -1.0, 1.0)
