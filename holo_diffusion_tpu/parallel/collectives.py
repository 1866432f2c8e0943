"""In-program collectives for training-state synchronization.

The reference's only explicit `torch.distributed` call is the loss-aware
timestep sampler's `dist.all_gather` of per-rank (batch-size, timestep, loss)
triples followed by a deterministic replicated update
(timestep_sampler.py:89-127). Here the same contract runs INSIDE the compiled
SPMD step: `lax.all_gather` over the mesh axis, then the identical
`loss_aware_update` on every replica — no host round-trip, rides ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import diffusion as gd


def gathered_loss_aware_update(
    state: gd.LossSecondMomentState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
    axis_name: str = "data",
    mask: jnp.ndarray = None,
) -> gd.LossSecondMomentState:
    """Replicated-deterministic sampler update from per-device (t, loss) pairs.

    ts: (K,) int32 local timesteps; losses: scalar or (K,) local losses;
    mask: optional (K,) bool validity per local pair (gathered alongside —
    e.g. the bootstrap timestep only counts on steps where the bootstrap
    branch was selected).
    Every device all-gathers the global pairs and applies the SAME update, so
    the replicated LossSecondMomentState stays bit-identical across the mesh
    (the reference's update_with_all_losses, timestep_sampler.py:112-127).
    Must be called inside shard_map/pmap with `axis_name` bound.
    """
    losses = jnp.broadcast_to(losses, ts.shape)
    if mask is None:
        mask = jnp.ones(ts.shape, bool)
    all_ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
    all_losses = jax.lax.all_gather(losses, axis_name).reshape(-1)
    all_mask = jax.lax.all_gather(mask, axis_name).reshape(-1)
    # the replicated state enters as unvarying; the gathered inputs are
    # device-varying (though equal-valued) — align the scan carry types
    state = jax.tree.map(
        lambda x: jax.lax.pcast(x, (axis_name,), to="varying"), state
    )
    new_state = gd.loss_aware_update(state, all_ts, all_losses, all_mask)
    # every device computed the SAME update from the same gathered pairs, but
    # the vma type is still `varying`; a pmax over equal values restores the
    # statically-known replication (invarying) the caller's out_specs need —
    # ~40 KB over ICI, negligible
    return jax.tree.map(lambda x: jax.lax.pmax(x, axis_name), new_state)
