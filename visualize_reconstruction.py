#!/usr/bin/env python
"""Reconstruction CLI — parity with the reference `visualize_reconstruction.py`:
render few-view reconstructions from a NON-diffusion checkpoint over dataset
sequences.

    python visualize_reconstruction.py exp_dir=./experiments/unet_recon_test \
        n_eval_sequences=2 trajectory_type=circular_lsq_fit

Implementation lives in holo_diffusion_tpu/cli.py (also installed as the
`holo-visualize-reconstruction` console script)."""
from holo_diffusion_tpu.cli import visualize_reconstruction_main as main

if __name__ == "__main__":
    main()
