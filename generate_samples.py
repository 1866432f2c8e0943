#!/usr/bin/env python
"""Sample CLI — parity with the reference `generate_samples.py`: generate N
unconditional samples from a trained checkpoint and render fly-around videos.

    python generate_samples.py exp_dir=./experiments/hydrant_release \
        num_samples=10 render_size=[256,256] output_directory=./samples \
        progressive_sampling_steps_per_render=-1
"""
import argparse
import logging
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("kwargs", nargs="*", help="key=value args (OmegaConf-CLI style)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import yaml

    opts = {}
    for kv in args.kwargs:
        k, _, v = kv.partition("=")
        opts[k] = yaml.safe_load(v)

    exp_dir = opts.pop("exp_dir")
    num_samples = opts.pop("num_samples", 3)
    output_directory = opts.pop("output_directory", os.path.join(exp_dir, "samples"))
    render_size = opts.pop("render_size", [256, 256])
    n_flyaround_poses = opts.pop("n_flyaround_poses", 40)
    trajectory_distance = opts.pop("trajectory_distance", 15.0)
    progressive = opts.pop("progressive_sampling_steps_per_render", -1)
    save_voxel_features = opts.pop("save_voxel_features", False)
    seed = opts.pop("seed", 0)
    video_fps = opts.pop("video_fps", 20)
    # sample through the EMA parameters (requires training with ema_rate > 0)
    use_ema = opts.pop("use_ema", False)
    # grids sampled per SPMD dispatch, sharded over the device mesh (one grid
    # per chip — sampling is data-parallel across samples). 0 = auto: the
    # device count when >1 device is visible and not rendering progressively.
    sample_batch_size = opts.pop("sample_batch_size", 0)
    # DDIM accelerated sampling: use_ddim=true max_iter=50 runs a strided
    # 50-step DDIM scan instead of the 1000-step DDPM loop (~20x fewer UNet
    # evals — the fast-preview/serving path)
    use_ddim = opts.pop("use_ddim", False)
    max_iter = opts.pop("max_iter", None)
    # eval-only occupancy empty-space skip for the flyaround renders
    empty_space_skip = opts.pop("empty_space_skip", False)
    if opts:
        raise ValueError(f"unknown args: {list(opts)}")

    import jax
    import numpy as np

    from holo_diffusion_tpu.utils.checkpoint_utils import load_experiment
    from holo_diffusion_tpu.utils.flyaround import render_flyaround

    exp, state = load_experiment(
        exp_dir, render_size=tuple(render_size), use_ema=use_ema
    )
    model = exp.model
    assert model.net_3d_enabled and model.diffusion_enabled, (
        "generate_samples requires a diffusion model "
        "(generate_samples.py:90-92 in the reference)"
    )
    params = state.variables()

    if sample_batch_size == 0 and progressive <= 0 and jax.device_count() > 1:
        sample_batch_size = min(num_samples, jax.device_count())

    grids = {}
    if sample_batch_size > 1 and progressive <= 0:
        # pre-sample all grids in mesh-sharded batches: the 1000-step DDPM
        # scan runs once per batch as one SPMD program, one grid per device
        from holo_diffusion_tpu.parallel.mesh import make_mesh
        from holo_diffusion_tpu.sampling import sample_random_voxel_features

        mesh = make_mesh(min(sample_batch_size, jax.device_count()))
        for start in range(0, num_samples, sample_batch_size):
            n = min(sample_batch_size, num_samples - start)
            # pad the tail batch to the batch size so the compiled program
            # (and its sharding) is reused; surplus grids are dropped
            batch = sample_random_voxel_features(
                model, params, jax.random.PRNGKey(seed + start),
                n_samples=sample_batch_size, mesh=mesh,
                use_ddim=use_ddim, max_iter=max_iter,
            )
            for j in range(n):
                # pull each grid off the mesh to host — render_flyaround's
                # jit runs single-device and rejects mesh-committed args
                grids[start + j] = np.asarray(batch[j:j + 1])

    for i in range(num_samples):
        name = f"sample_{i:05d}"
        out = render_flyaround(
            model,
            params,
            os.path.join(output_directory, name),
            sample_mode=True,
            n_flyaround_poses=n_flyaround_poses,
            trajectory_distance=trajectory_distance,
            rng=jax.random.PRNGKey(seed + i),
            progressive_sampling_steps_per_render=progressive,
            video_fps=video_fps,
            save_voxel_features=save_voxel_features,
            voxel_features=grids.get(i),
            sample_use_ddim=use_ddim,
            sample_max_iter=max_iter,
            empty_space_skip=empty_space_skip,
        )
        logging.info(f"{name}: {out}")


if __name__ == "__main__":
    main()
