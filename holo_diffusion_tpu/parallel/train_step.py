"""The jit'd SPMD train step: pool -> noise -> denoise -> render -> loss ->
psum(grad) -> optimizer, as ONE compiled program over the device mesh.

Replaces the reference's python training iteration (training_loop.py:446-556:
loader -> forward -> accelerator.backward (NCCL all-reduce) -> clip ->
optimizer.step). Data parallelism via `shard_map` over the `data` axis; each
device holds one scene's frame batch (holo_diffusion_model.py:326). With
`schedule_sampler="loss-second-moment"` the sampler state rides in the
TrainState and is synchronized with an in-program all_gather
(parallel/collectives.py), replacing the reference's dist.all_gather
(timestep_sampler.py:89-110).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..data.frame_data import FrameData
from ..models import diffusion as gd
from ..models.holo_model import HoloDiffusionModel


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # mutable model state (batch norm stats of the feature extractor)
    model_state: Any = struct.field(default_factory=dict)
    # loss-second-moment timestep-sampler state (None for uniform sampling);
    # replicated, updated identically on every device (timestep_sampler.py:112-127)
    sampler_state: Any = None
    # optional EMA of params (guided_diffusion's update_ema, nn.py:61-71 —
    # shipped-but-unused in the reference; enable with ema_rate > 0)
    ema_params: Any = None

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation,
               sampler_state: Any = None, ema: bool = False):
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state=model_state,
            sampler_state=sampler_state,
            ema_params=jax.tree.map(jnp.array, params) if ema else None,
        )

    def ema_variables(self):
        """Variables with EMA params swapped in (for sampling/eval)."""
        assert self.ema_params is not None
        return {"params": self.ema_params, **self.model_state}

    def variables(self):
        return {"params": self.params, **self.model_state}


_TRACKED_METRICS = (
    "objective",
    "loss_rgb_mse",
    "loss_rgb_psnr",
    "loss_rgb_psnr_fg",
    "loss_rgb_huber",
    "loss_mask_bce",
    "loss_mask_neg_iou",
    "loss_depth_abs",
    "loss_depth_abs_fg",
    "loss_prev_stage_rgb_mse",
    "loss_prev_stage_rgb_psnr",
    "loss_prev_stage_mask_bce",
    "loss_prev_stage_prev_stage_rgb_mse",
)


def _scalar_metrics(preds: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: preds[k] for k in _TRACKED_METRICS if k in preds}


def ts_validity_mask(take_boot: jnp.ndarray) -> jnp.ndarray:
    """Validity of the (main, bootstrap) sampler-credit pairs: the main
    timestep always entered the loss; the bootstrap one only when the
    bootstrap branch was selected (holo_diffusion_model.py:401-418)."""
    return jnp.stack([jnp.ones((), bool), take_boot.astype(bool)])


def importance_scale(weights: jnp.ndarray, take_boot: jnp.ndarray) -> jnp.ndarray:
    """Importance-sampling loss rescale for the loss-second-moment sampler
    (the ScheduleSampler.sample weights contract, timestep_sampler.py:48-64):
    w[t_main] always; additionally w[t_boot] when the bootstrap branch was
    taken — the two draws are independent, so the unbiased correction is the
    product of the weights that actually entered the loss."""
    return weights[0] * jnp.where(take_boot, weights[1], 1.0)


def make_train_step(
    model: HoloDiffusionModel,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    donate: bool = True,
    steps_per_call: int = 1,
    schedule_sampler: str = "uniform",
    ema_rate: float = 0.0,
    packer=None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    With a mesh: `batch` has a leading device axis (n_dev, B, ...) sharded over
    `axis_name`; params/optimizer state replicated; grads pmean'd over ICI.
    Without a mesh: plain single-device jit.

    steps_per_call > 1: batch leaves carry an extra LEADING step axis
    ((K, B, ...) or (K, n_dev, B, ...)) and K optimizer steps run as ONE
    lax.scan inside a single dispatch — amortizes host->device dispatch
    latency (measured ~30 ms on the tunnel); metrics are averaged over K.

    schedule_sampler: "uniform" (default; model samples t internally) or
    "loss-second-moment" (timestep_sampler.py:130-160): t for both diffusion
    passes is drawn from the sqrt-second-moment weights held in
    `state.sampler_state`, the differentiated objective is rescaled by the
    importance weights 1/(T*p[t]) (the ScheduleSampler.sample contract,
    timestep_sampler.py:48-64 — the bootstrap timestep's weight applies only
    on steps where the bootstrap branch was selected, since only then does
    t_bootstrap enter the loss), and the state is updated every step from the
    all-gathered (t, loss, valid) triples so it stays identical on every
    device. NOTE the reference *selects* this sampler via config
    (diffusion_utils.py:97,113) but its photometric path never feeds it
    (holo_diffusion_model.py:387 discards the weights and never calls
    update_with_local_losses), so there it degenerates to uniform; here the
    photometric objective is importance-corrected and fed back as the
    per-timestep loss signal (credit for t_bootstrap gated on take_boot).
    Reported metrics stay UNweighted; only the grad target is rescaled.

    packer: optional data.packing.BatchPacker — `batch` then arrives as ONE
    flat uint8 buffer (single H2D latency payment on high-latency transports;
    ~11 per-leaf payments otherwise, scripts/profile_e2e_residual_r4.py) and
    is unpacked to the FrameData pytree inside the jit (static slices +
    bitcasts, fused by XLA). Single-device only: under a mesh the batch must
    arrive pre-sharded per device (shard_batch).
    """
    if packer is not None and mesh is not None:
        raise ValueError(
            "packed transfer is single-device (the tunnel-latency lever); "
            "under a mesh, shard_batch places per-device shards directly"
        )
    loss_aware = schedule_sampler == "loss-second-moment"
    if loss_aware:
        sched = gd.make_named_schedule_from_config(model.diffusion_args)

    def _ema(state, new_params):
        if ema_rate <= 0.0 or state.ema_params is None:
            return state.ema_params
        return gd.update_ema(state.ema_params, new_params, rate=ema_rate)

    def _sample_ts(state: TrainState, rng_t: jax.Array):
        """(2,) timesteps + importance weights for (main, bootstrap) passes."""
        return gd.loss_aware_sample_timesteps(sched, state.sampler_state, 2, rng_t)


    def device_step(state: TrainState, batch: FrameData, rng: jax.Array):
        timesteps = weights = None
        if loss_aware:
            rng, rng_t = jax.random.split(rng)
            timesteps, weights = _sample_ts(state, rng_t)

        def loss_fn(params):
            preds, new_model_state = model.apply(
                {"params": params, **state.model_state},
                camera=batch.camera,
                image_rgb=batch.image_rgb,
                fg_probability=batch.fg_probability,
                mask_crop=batch.mask_crop,
                depth_map=batch.depth_map,
                src_image_rgb=batch.src_image_rgb,
                src_fg_probability=batch.src_fg_probability,
                src_mask_crop=batch.src_mask_crop,
                training=True,
                rng=rng,
                timesteps=timesteps,
                mutable=list(state.model_state.keys()),
            )
            take_boot = preds.get("diffusion_take_boot", jnp.zeros((), bool))
            objective = preds["objective"]
            if loss_aware:
                objective = objective * importance_scale(weights, take_boot)
            return objective, (_scalar_metrics(preds), new_model_state, take_boot)

        (_, (metrics, new_model_state, take_boot)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return grads, metrics, new_model_state, timesteps, take_boot

    def _scan_steps(one_step, state, batch, rng):
        """Run K chained optimizer steps over a leading step axis."""
        rngs = jax.random.split(rng, steps_per_call)
        state, metrics = jax.lax.scan(
            lambda st, inp: one_step(st, inp[0], inp[1]), state, (batch, rngs)
        )
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    if mesh is None:

        def one_step(state: TrainState, batch: FrameData, rng: jax.Array):
            grads, metrics, new_model_state, ts, take_boot = device_step(
                state, batch, rng
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_sampler = state.sampler_state
            if loss_aware:
                new_sampler = gd.loss_aware_update(
                    state.sampler_state,
                    ts,
                    jnp.broadcast_to(metrics["objective"], ts.shape),
                    mask=ts_validity_mask(take_boot),
                )
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    opt_state=new_opt,
                    model_state=new_model_state,
                    sampler_state=new_sampler,
                    ema_params=_ema(state, new_params),
                ),
                metrics,
            )

        # (the packed buffer is NOT donated: no output shares its dtype, so
        # XLA cannot alias it and the donation would only warn)

        @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state: TrainState, batch, rng: jax.Array):
            if packer is not None:
                batch = packer.unpack(batch)
            if steps_per_call == 1:
                return one_step(state, batch, rng)
            return _scan_steps(one_step, state, batch, rng)

        return train_step

    # ---- SPMD over the mesh
    def spmd_one_step(state: TrainState, local: FrameData, rng: jax.Array):
        # decorrelate per-device randomness
        idx = jax.lax.axis_index(axis_name)
        rng = jax.random.fold_in(rng, idx)
        timesteps = weights = None
        if loss_aware:
            rng, rng_t = jax.random.split(rng)
            timesteps, weights = _sample_ts(state, rng_t)

        def loss_fn(params):
            preds, new_model_state = model.apply(
                {"params": params, **state.model_state},
                camera=local.camera,
                image_rgb=local.image_rgb,
                fg_probability=local.fg_probability,
                mask_crop=local.mask_crop,
                depth_map=local.depth_map,
                src_image_rgb=local.src_image_rgb,
                src_fg_probability=local.src_fg_probability,
                src_mask_crop=local.src_mask_crop,
                training=True,
                rng=rng,
                timesteps=timesteps,
                mutable=list(state.model_state.keys()),
            )
            take_boot = preds.get("diffusion_take_boot", jnp.zeros((), bool))
            objective = preds["objective"]
            if loss_aware:
                objective = objective * importance_scale(weights, take_boot)
            # pmean the objective BEFORE grad: the cotangent of replicated
            # params is auto-psummed by AD under shard_map, so differentiating
            # the globally-averaged loss yields exactly the mean gradient (the
            # reference's DDP all-reduce, training_loop.py:536-543).
            global_loss = jax.lax.pmean(objective, axis_name)
            return global_loss, (_scalar_metrics(preds), new_model_state, take_boot)

        (_, (metrics, new_model_state, take_boot)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_sampler = state.sampler_state
        if loss_aware:
            # each device pairs ITS timesteps with ITS local objective; the
            # gathered update is identical on all replicas (collectives.py)
            from .collectives import gathered_loss_aware_update

            new_sampler = gathered_loss_aware_update(
                state.sampler_state,
                timesteps,
                metrics["objective"],
                axis_name,
                mask=ts_validity_mask(take_boot),
            )
        metrics = jax.lax.pmean(metrics, axis_name)
        new_model_state = jax.lax.pmean(new_model_state, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                model_state=new_model_state,
                sampler_state=new_sampler,
                ema_params=_ema(state, new_params),
            ),
            metrics,
        )

    def spmd_step(state: TrainState, batch: FrameData, rng: jax.Array):
        if steps_per_call == 1:
            # batch leaves arrive as (1, B, ...) shards -> drop the device axis
            local = jax.tree.map(lambda x: x[0], batch)
            return spmd_one_step(state, local, rng)
        # (K, 1, B, ...) shards -> (K, B, ...)
        local = jax.tree.map(lambda x: x[:, 0], batch)
        return _scan_steps(spmd_one_step, state, local, rng)

    replicated = P()
    sharded = P(axis_name) if steps_per_call == 1 else P(None, axis_name)
    spmd = jax.shard_map(
        spmd_step,
        mesh=mesh,
        in_specs=(replicated, sharded, replicated),
        out_specs=(replicated, replicated),
    )
    return jax.jit(spmd, donate_argnums=(0,) if donate else ())


def make_eval_step(model: HoloDiffusionModel) -> Callable:
    """jit'd EVALUATION forward (single device; full-grid render)."""

    @jax.jit
    def eval_step(state: TrainState, batch: FrameData, rng: jax.Array):
        preds = model.apply(
            state.variables(),
            camera=batch.camera,
            image_rgb=batch.image_rgb,
            fg_probability=batch.fg_probability,
            mask_crop=batch.mask_crop,
            depth_map=batch.depth_map,
            training=False,
            rng=rng,
            src_image_rgb=batch.src_image_rgb,
            src_fg_probability=batch.src_fg_probability,
            src_mask_crop=batch.src_mask_crop,
        )
        return {
            **_scalar_metrics(preds),
            "images_render": preds["images_render"],
            "depths_render": preds["depths_render"],
            "masks_render": preds["masks_render"],
        }

    return eval_step
