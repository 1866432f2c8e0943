#!/usr/bin/env python
"""Sample-quality CLI — FID/KID of generated renders vs the dataset (the
paper's headline metric; reference README.md:47).

    python evaluate_samples.py exp_dir=./experiments/hydrant_release \
        num_samples=20 poses_per_sample=4 extractor=inception \
        weights_path=/path/pt_inception-2015-12-05.pth

Implementation lives in holo_diffusion_tpu/cli.py (also installed as the
`holo-evaluate-samples` console script)."""
from holo_diffusion_tpu.cli import evaluate_samples_main as main

if __name__ == "__main__":
    main()
