"""Installed console entry points (pyproject.toml [project.scripts]).

The repo-root scripts (`experiment.py`, `generate_samples.py`,
`visualize_reconstruction.py`, `evaluate_samples.py`) keep the reference's
invocation surface (`python experiment.py --config-name ...`); this module
holds the same four mains so an installed package exposes them as
`holo-train`, `holo-generate-samples`, `holo-visualize-reconstruction`,
`holo-evaluate-samples`.
"""


# ---- experiment.py ----
# Train CLI — parity with the reference `experiment.py` hydra entry:
# 
#     python experiment.py --config-name hydrant.yaml exp_dir=./out seed=7 \
#         model_factory_ImplicitronModelFactory_args.model_HoloDiffusionModel_args.resol=16
# 
# Dotted overrides follow the reference's hydra surface; `--config-dir` points
# at a custom config directory (default: holo_diffusion_tpu/configs).
import argparse
import logging
import socket


def train_main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="base.yaml")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--no-mesh", action="store_true",
                        help="force single-device training")
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format=f"%(asctime)s {socket.gethostname()} %(name)s: %(message)s",
    )

    from holo_diffusion_tpu.config import load_config
    from holo_diffusion_tpu.experiment import Experiment

    cfg = load_config(args.config_name, args.overrides, args.config_dir)
    exp = Experiment(cfg)
    exp.run(max_epochs=args.max_epochs, use_mesh=not args.no_mesh)


# ---- generate_samples.py ----
# Sample CLI — parity with the reference `generate_samples.py`: generate N
# unconditional samples from a trained checkpoint and render fly-around videos.
# 
#     python generate_samples.py exp_dir=./experiments/hydrant_release \
#         num_samples=10 render_size=[256,256] output_directory=./samples \
#         progressive_sampling_steps_per_render=-1
import argparse
import logging
import os


def generate_samples_main():
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


# ---- visualize_reconstruction.py ----
# Reconstruction CLI — parity with the reference `visualize_reconstruction.py`:
# render few-view reconstructions from a NON-diffusion checkpoint over dataset
# sequences.
# 
#     python visualize_reconstruction.py exp_dir=./experiments/unet_recon_test \
#         n_eval_sequences=2 trajectory_type=circular_lsq_fit
import argparse
import logging
import os


def visualize_reconstruction_main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("kwargs", nargs="*", help="key=value args")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import yaml

    opts = {}
    for kv in args.kwargs:
        k, _, v = kv.partition("=")
        opts[k] = yaml.safe_load(v)

    exp_dir = opts.pop("exp_dir")
    output_directory = opts.pop(
        "output_directory", os.path.join(exp_dir, "reconstructions")
    )
    render_size = opts.pop("render_size", [256, 256])
    n_eval_sequences = opts.pop("n_eval_sequences", 2)
    n_source_views = opts.pop("n_source_views", 9)
    n_flyaround_poses = opts.pop("n_flyaround_poses", 40)
    trajectory_type = opts.pop("trajectory_type", "circular_lsq_fit")
    seed = opts.pop("seed", 0)
    # render through the EMA parameters (requires training with ema_rate > 0)
    use_ema = opts.pop("use_ema", False)
    # eval-only occupancy empty-space skip for the flyaround renders
    empty_space_skip = opts.pop("empty_space_skip", False)
    if opts:
        raise ValueError(f"unknown args: {list(opts)}")

    from holo_diffusion_tpu.utils.checkpoint_utils import load_experiment
    from holo_diffusion_tpu.utils.flyaround import render_flyaround

    exp, state = load_experiment(
        exp_dir, render_size=tuple(render_size), use_ema=use_ema
    )
    model = exp.model
    assert not model.diffusion_enabled, (
        "visualize_reconstruction requires a NON-diffusion model "
        "(visualize_reconstruction.py:95-99 in the reference)"
    )
    params = state.variables()

    eval_ds = exp.data.val if len(exp.data.val) else exp.data.train
    scenes = eval_ds.first_scenes(n_eval_sequences)
    for si, scene in enumerate(scenes):
        out = render_flyaround(
            model,
            params,
            os.path.join(output_directory, f"sequence_{si:03d}"),
            scene=scene,
            sample_mode=False,
            n_source_views=n_source_views,
            n_flyaround_poses=n_flyaround_poses,
            trajectory_type=trajectory_type,
            seed=seed,
            empty_space_skip=empty_space_skip,
        )
        logging.info(f"sequence_{si:03d}: {out}")


# ---- evaluate_samples.py ----
# Sample-quality CLI — FID/KID of generated renders vs the dataset (the
# paper's headline metric; reference README.md:47).
# 
#     python evaluate_samples.py exp_dir=./experiments/hydrant_release \
#         num_samples=20 poses_per_sample=4 extractor=inception \
#         weights_path=/path/pt_inception-2015-12-05.pth
# 
# extractor=inception + the pytorch-fid pt_inception state_dict produces the
# STANDARD paper-comparable Inception-FID/KID (flax FID-InceptionV3,
# models/inception.py). extractor=vgg + torchvision vgg16 weights reports
# VGG-FID (a different scale, labeled as such). With no weights available,
# `extractor=random_vgg` / `random_inception` exercise the full protocol with
# a randomly initialized extractor (smoke test; numbers are not meaningful
# quality scores).
import argparse
import logging
import os


def evaluate_samples_main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("kwargs", nargs="*", help="key=value args")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import yaml

    opts = {}
    for kv in args.kwargs:
        k, _, v = kv.partition("=")
        opts[k] = yaml.safe_load(v)

    exp_dir = opts.pop("exp_dir")
    num_samples = opts.pop("num_samples", 8)
    poses_per_sample = opts.pop("poses_per_sample", 4)
    trajectory_distance = opts.pop("trajectory_distance", 15.0)
    extractor = opts.pop("extractor", "random_vgg")
    # `weights_path` is the generic name (inception or vgg state_dict);
    # `vgg_weights_path` stays as a back-compat alias
    vgg_weights_path = opts.pop(
        "weights_path", opts.pop("vgg_weights_path", None)
    )
    n_real = opts.pop("n_real", None)
    max_iter = opts.pop("max_iter", None)
    render_size = opts.pop("render_size", None)
    use_ema = opts.pop("use_ema", False)
    seed = opts.pop("seed", 0)
    dump_path = opts.pop(
        "dump_path", os.path.join(exp_dir, "sample_eval_results.json")
    )
    if opts:
        raise ValueError(f"unknown args: {list(opts)}")

    import jax

    from holo_diffusion_tpu.evaluate_samples import evaluate_samples
    from holo_diffusion_tpu.utils.checkpoint_utils import load_experiment

    exp, state = load_experiment(
        exp_dir,
        render_size=tuple(render_size) if render_size else None,
        use_ema=use_ema,
    )
    # lazy iterator: _real_image_set early-breaks at n_real, and the CO3D
    # dataset's LRU host cache stays bounded (materializing `.scenes` would
    # hold every sequence, ~600 MB each at the release scale)
    scenes = exp.data.train.iter_scenes()
    res = evaluate_samples(
        exp.model,
        state.variables(),
        scenes,
        num_samples=num_samples,
        poses_per_sample=poses_per_sample,
        trajectory_distance=trajectory_distance,
        extractor=extractor,
        vgg_weights_path=vgg_weights_path,
        n_real=n_real,
        rng=jax.random.PRNGKey(seed),
        max_iter=max_iter,
        dump_path=dump_path,
    )
    logging.info(f"sample evaluation: {res}")
