#!/usr/bin/env python
"""Sample CLI — parity with the reference `generate_samples.py`: generate N
unconditional samples from a trained checkpoint and render fly-around videos.

    python generate_samples.py exp_dir=./experiments/hydrant_release \
        num_samples=10 render_size=[256,256] output_directory=./samples \
        use_ddim=true max_iter=50 empty_space_skip=true

Implementation lives in holo_diffusion_tpu/cli.py (also installed as the
`holo-generate-samples` console script)."""
from holo_diffusion_tpu.cli import generate_samples_main as main

if __name__ == "__main__":
    main()
