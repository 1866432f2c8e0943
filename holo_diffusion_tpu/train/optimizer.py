"""Optimizer + LR-policy factory.

optax rebuild of ImplicitronOptimizerFactory (reference:
trainer/optimizer_factory.py:29-339): Adam/SGD/Adagrad breeds, MultiStepLR /
Exponential / LinearExponential policies, per-group learning rates, optional
gradient clipping (training_loop.py:544-553). LR schedules step per EPOCH in
the reference (training_loop.py:292); pass `steps_per_epoch` to convert.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import optax


def make_lr_schedule(
    lr: float,
    lr_policy: str = "MultiStepLR",
    gamma: float = 0.1,
    multistep_lr_milestones: Sequence[int] = (),
    exponential_lr_step_size: int = 250,
    linear_exponential_lr_milestone: int = 200,
    linear_exponential_start_gamma: float = 0.1,
    max_epochs: int = 1000,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    """Returns an optax schedule over *steps* mirroring the reference's
    per-epoch policies (optimizer_factory.py:164-200)."""
    if lr_policy == "MultiStepLR":
        boundaries = {
            int(m) * steps_per_epoch: gamma for m in multistep_lr_milestones
        }
        return optax.piecewise_constant_schedule(lr, boundaries)
    if lr_policy == "Exponential":
        # lr * gamma ** (epoch / step_size)
        return lambda step: lr * gamma ** (
            (step / steps_per_epoch) / exponential_lr_step_size
        )
    if lr_policy == "LinearExponential":
        # linear ramp from start_gamma*lr to lr over `milestone` epochs, then
        # exponential decay (optimizer_factory.py:177-193)
        def sched(step):
            epoch = step / steps_per_epoch
            m = linear_exponential_lr_milestone
            ramp = linear_exponential_start_gamma + (
                1 - linear_exponential_start_gamma
            ) * (epoch / m)
            decay = gamma ** ((epoch - m) / (max_epochs - m))
            import jax.numpy as jnp

            return lr * jnp.where(epoch < m, jnp.minimum(ramp, 1.0), decay)

        return sched
    raise ValueError(f"unknown lr_policy {lr_policy}")


def make_optimizer(
    breed: str = "Adam",
    lr: float = 5e-5,
    betas=(0.9, 0.999),
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    clip_grad: float = 0.0,
    schedule: Optional[optax.Schedule] = None,
    group_learning_rates: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """Build the optax chain (optimizer_factory.py:137-150 breeds).

    group_learning_rates: {param-path-substring: lr multiplier-base-lr} —
    per-group LRs (optimizer_factory.py:324-339) applied by path match.
    """
    lr_or_sched = schedule if schedule is not None else lr

    def base(breed_lr):
        if breed == "Adam":
            tx = optax.adam(breed_lr, b1=betas[0], b2=betas[1])
        elif breed == "SGD":
            tx = optax.sgd(breed_lr, momentum=momentum)
        elif breed == "Adagrad":
            tx = optax.adagrad(breed_lr)
        else:
            raise ValueError(f"unknown optimizer breed {breed}")
        return tx

    parts = []
    if clip_grad and clip_grad > 0:
        parts.append(optax.clip_by_global_norm(clip_grad))
    if weight_decay and weight_decay > 0 and breed == "Adam":
        parts.append(optax.add_decayed_weights(weight_decay))

    if group_learning_rates:
        import jax

        def label_fn(params):
            def label(path, _):
                path_str = "/".join(str(k.key) for k in path)
                for name in group_learning_rates:
                    if name in path_str:
                        return name
                return "__default__"

            return jax.tree_util.tree_map_with_path(label, params)

        txs = {"__default__": base(lr_or_sched)}
        for name, g_lr in group_learning_rates.items():
            if callable(schedule):
                ratio = g_lr / lr
                g_sched = lambda step, _s=schedule, _r=ratio: _s(step) * _r
            else:
                g_sched = g_lr
            txs[name] = base(g_sched)
        parts.append(optax.multi_transform(txs, label_fn))
    else:
        parts.append(base(lr_or_sched))

    return optax.chain(*parts) if len(parts) > 1 else parts[0]


def with_discriminator_optimizer(
    tx_main: optax.GradientTransformation,
    tx_disc: optax.GradientTransformation,
    path_substring: str = "discriminator",
) -> optax.GradientTransformation:
    """Two-optimizer surface for the reference's vestigial GAN support:
    parameters whose path contains `path_substring` step under `tx_disc`,
    everything else under `tx_main` — the functional equivalent of the
    reference's separate discriminator optimizer stepped each iteration
    (training_loop.py:563-569; param split trainer/utils.py:29-33; state
    persisted like `_opt_disc.pth` inside the single TrainState opt_state).
    No release config instantiates a discriminator; this keeps the surface.
    """
    import jax

    def _mask(want_disc):
        def fn(params):
            def label(path, _):
                p = "/".join(str(getattr(k, "key", k)) for k in path)
                return (path_substring in p) == want_disc

            return jax.tree_util.tree_map_with_path(label, params)

        return fn

    return optax.chain(
        optax.masked(tx_main, _mask(False)),
        optax.masked(tx_disc, _mask(True)),
    )
