#!/usr/bin/env python
"""Train CLI — parity with the reference `experiment.py` hydra entry:

    python experiment.py --config-name hydrant.yaml exp_dir=./out seed=7 \
        model_factory_ImplicitronModelFactory_args.model_HoloDiffusionModel_args.resol=16

Dotted overrides follow the reference's hydra surface; `--config-dir` points
at a custom config directory (default: holo_diffusion_tpu/configs).
Implementation lives in holo_diffusion_tpu/cli.py (also installed as the
`holo-train` console script)."""
from holo_diffusion_tpu.cli import train_main as main

if __name__ == "__main__":
    main()
