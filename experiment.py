#!/usr/bin/env python
"""Train CLI — parity with the reference `experiment.py` hydra entry:

    python experiment.py --config-name hydrant.yaml exp_dir=./out seed=7 \
        model_factory_ImplicitronModelFactory_args.model_HoloDiffusionModel_args.resol=16

Dotted overrides follow the reference's hydra surface; `--config-dir` points
at a custom config directory (default: holo_diffusion_tpu/configs).
"""
import argparse
import logging
import socket


def main():
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


if __name__ == "__main__":
    main()
