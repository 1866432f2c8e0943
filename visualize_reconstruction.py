#!/usr/bin/env python
"""Reconstruction CLI — parity with the reference `visualize_reconstruction.py`:
render few-view reconstructions from a NON-diffusion checkpoint over dataset
sequences.

    python visualize_reconstruction.py exp_dir=./experiments/unet_recon_test \
        n_eval_sequences=2 trajectory_type=circular_lsq_fit
"""
import argparse
import logging
import os


def main():
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


if __name__ == "__main__":
    main()
