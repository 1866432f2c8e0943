"""Two-REAL-process SPMD rehearsal on a CPU mesh (VERDICT r2 #10).

Turns the multi-host path from notional into executed: launches 2 OS
processes, each seeing 2 local virtual CPU devices (4 global), initializes
`jax.distributed`, builds the global mesh, feeds per-process LOCAL batch
shards through `device_batched_loader(process_index=...)` +
`shard_batch`'s `make_array_from_process_local_data` branch, runs train
steps with `steps_per_call=2` (the `_shard_stepped` (K, n_dev, ...) layout),
and asserts the replicated params are BIT-IDENTICAL on both processes.

This is the TPU-pod launch contract (parallel/launch.py) exercised with real
process boundaries — the reference's multi-proc DDP equivalent
(experiment.py:165-173).

    python scripts/two_process_rehearsal.py            # parent: spawns 2 ranks
    python scripts/two_process_rehearsal.py --rank N   # internal
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 2
PORT = 12923
K = 2  # steps_per_call


def worker(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=rank,
    )
    assert jax.process_count() == N_PROC
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert (n_global, n_local) == (N_PROC * LOCAL_DEVICES, LOCAL_DEVICES)

    import jax.numpy as jnp
    import numpy as np

    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.data.source import device_batched_loader
    from holo_diffusion_tpu.experiment import _shard_stepped
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.parallel import (
        TrainState,
        make_mesh,
        make_train_step,
    )
    from holo_diffusion_tpu.train import make_optimizer

    # tiny model (same shape family as __graft_entry__._TINY)
    model = HoloDiffusionModel(
        resol=8,
        volume_extent=3.0,
        feature_size=32,
        n_train_target_views=1,
        n_pts_per_ray_training=8,
        n_pts_per_ray_fine_training=4,
        n_rays_per_image=32,
        render_image_height=16,
        render_image_width=16,
        scene_extent=1.2,
        net_3d_args=dict(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(2,), use_remat=False,
        ),
        diffusion_args=dict(
            num_steps=16, beta_start_unscaled=1.6e-6, beta_end_unscaled=3.2e-4
        ),
        image_feature_extractor_args=dict(
            name_arch="resnet18", stages=(1,), proj_dim=4, image_rescale=0.5
        ),
        render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
    )

    class _DS:
        """Deterministic same-sequence scenes keyed by the loader RNG."""

        def sample_batch(self, rng: np.random.RandomState, batch_size: int):
            return make_synthetic_scene(
                n_views=batch_size, image_size=16, seed=int(rng.randint(1000))
            )

    mesh = make_mesh(n_global)
    scene0 = make_synthetic_scene(n_views=3, image_size=16, seed=0)
    variables = model.init(
        jax.random.PRNGKey(0),
        camera=scene0.camera,
        image_rgb=scene0.image_rgb,
        fg_probability=scene0.fg_probability,
        mask_crop=scene0.mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    tx = make_optimizer(breed="Adam", lr=5e-5)
    state = TrainState.create(variables, tx)
    step = make_train_step(
        model, tx, mesh=mesh, donate=False, steps_per_call=K
    )

    # per-process LOCAL shards: each host materializes ONLY its devices'
    # slice; determinism is global by construction (data/source.py)
    loader = device_batched_loader(
        _DS(), batch_size=3, n_batches=K * 2, n_devices=n_global, seed=7,
        process_index=rank, process_count=N_PROC,
    )
    local_steps = [next(loader) for _ in range(K)]
    stepped = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *local_steps
    )  # (K, n_local_dev, B, ...)
    batch = _shard_stepped(stepped, mesh)

    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    obj = float(np.asarray(jax.device_get(metrics["objective"])))
    assert np.isfinite(obj), obj
    assert int(jax.device_get(state.step)) == K

    # digest of the replicated params from THIS process's local shards
    leaves = jax.tree.leaves(state.params)
    digest = float(
        sum(np.asarray(jax.device_get(x)).astype(np.float64).sum()
            for x in leaves)
    )
    print(f"RANK{rank} objective={obj:.6f} digest={digest:.10e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is not None:
        worker(args.rank)
        return

    env = dict(os.environ)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(N_PROC)
    ]
    outs = [p.communicate()[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        sys.stdout.write(out)
        if p.returncode != 0:
            raise SystemExit(f"rank {r} failed rc={p.returncode}")
    digests = set()
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RANK")][-1]
        digests.add(line.split("digest=")[1])
    assert len(digests) == 1, f"params diverged across processes: {digests}"
    print(f"two_process_rehearsal: {N_PROC} procs x {LOCAL_DEVICES} devices, "
          f"params bit-identical OK")


if __name__ == "__main__":
    main()
