#!/usr/bin/env python
"""Sample-quality CLI — FID/KID of generated renders vs the dataset (the
paper's headline metric; reference README.md:47).

    python evaluate_samples.py exp_dir=./experiments/hydrant_release \
        num_samples=20 poses_per_sample=4 extractor=inception \
        weights_path=/path/pt_inception-2015-12-05.pth

extractor=inception + the pytorch-fid pt_inception state_dict produces the
STANDARD paper-comparable Inception-FID/KID (flax FID-InceptionV3,
models/inception.py). extractor=vgg + torchvision vgg16 weights reports
VGG-FID (a different scale, labeled as such). With no weights available,
`extractor=random_vgg` / `random_inception` exercise the full protocol with
a randomly initialized extractor (smoke test; numbers are not meaningful
quality scores).
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


if __name__ == "__main__":
    main()
