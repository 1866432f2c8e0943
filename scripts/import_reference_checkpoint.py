#!/usr/bin/env python
"""Convert a reference HoloDiffusion `.pth` checkpoint into a framework
checkpoint, so `generate_samples.py` / `visualize_reconstruction.py` /
resumed training work directly on reference-trained weights.

    python scripts/import_reference_checkpoint.py \
        --pth /path/to/model_epoch_00000350.pth \
        --config-name hydrant.yaml \
        --exp-dir ./experiments/imported_hydrant [--epoch 350]

Writes `exp_dir/model_epoch_{epoch:08d}` (orbax) + `expconfig.yaml`; the
weight mapping is `utils/torch_import.convert_holo_model_state_dict`
(golden-tested; see tests/test_render_mlp_parity.py and
tests/test_render_image_parity.py for the pixel-fidelity chain).
The reference saves `{"model": state_dict, ...}` via Implicitron
model_io.safe_save_model; bare state_dicts are accepted too.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--config-name", default="hydrant.yaml")
    ap.add_argument("--config-dir", default=None)
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    import numpy as np
    import torch

    from holo_diffusion_tpu.config import dump_expconfig, load_config
    from holo_diffusion_tpu.experiment import Experiment
    from holo_diffusion_tpu.train.checkpoint import save_checkpoint
    from holo_diffusion_tpu.utils.torch_import import (
        convert_holo_model_state_dict,
    )

    cfg = load_config(args.config_name, args.overrides, args.config_dir)
    cfg["exp_dir"] = args.exp_dir
    exp = Experiment(cfg)
    state = exp.init_state()

    blob = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = {k: np.asarray(v) for k, v in sd.items()}

    net = exp.model_args.get("net_3d_args") or {}
    impl = exp.model_args.get("render_mlp_args") or {}
    fe = exp.model_args.get("image_feature_extractor_args") or {}
    resnet_layers = (
        (2, 2, 2, 2) if "18" in str(fe.get("name_arch", "resnet34"))
        else (3, 4, 6, 3)
    )
    variables = convert_holo_model_state_dict(
        sd,
        {"params": state.params, **state.model_state},
        num_res_blocks=net.get("num_res_blocks", 2),
        channel_mult=tuple(net.get("channel_mult", (1, 1, 2, 4, 8))),
        attention_resolutions=tuple(net.get("attention_resolutions", (4, 8))),
        dnet_num_layers=impl.get("dnet_num_layers", 4),
        rnet_num_layers=impl.get("rnet_num_layers", 1),
        resnet_layers=resnet_layers,
        resnet_stages=tuple(fe.get("stages", (1, 2, 3, 4))),
    )
    state = state.replace(
        params=variables["params"],
        model_state={k: v for k, v in variables.items() if k != "params"},
    )
    os.makedirs(args.exp_dir, exist_ok=True)
    dump_expconfig(cfg, args.exp_dir)
    save_checkpoint(args.exp_dir, args.epoch, state, purge=0)
    print(f"imported {args.pth} -> {args.exp_dir}/model_epoch_{args.epoch:08d}")


if __name__ == "__main__":
    main()
