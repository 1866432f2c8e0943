"""Generate UNet + RenderMLP golden fixtures by running the reference models
(torch CPU) at /root/reference. Run once offline:

    python tests/make_goldens_unet.py

Saves the torch state_dict (flattened) + input/output pairs for a small UNet
config and a RenderMLP so tests validate both our architecture and the
torch-import shim without importing the reference at test time.
"""
import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "goldens")


class _FakeRegistry:
    pass


def main():
    sys.path.insert(0, REF)
    from holo_diffusion.guided_diffusion.unet import UNetModel

    torch.manual_seed(7)

    # Small-but-complete config: 2 levels, attention at ds 2, up/down, skips.
    cfg = dict(
        dims=3,
        image_size=8,
        in_channels=16,
        model_channels=32,
        out_channels=16,
        num_res_blocks=1,
        attention_resolutions=(2,),
        dropout=0.0,
        channel_mult=(1, 2),
        num_classes=None,
        use_checkpoint=False,
        num_heads=2,
        num_head_channels=-1,
        num_heads_upsample=-1,
        use_scale_shift_norm=True,
        resblock_updown=False,
        zero_last_conv=False,
        homogeneous_resample=True,
    )
    net = UNetModel(**cfg).eval()
    # SimpleUnet3D init behavior (diffusion_utils.py:77-80)
    for m in net.modules():
        if isinstance(m, (torch.nn.Conv3d, torch.nn.Linear, torch.nn.Conv1d)):
            torch.nn.init.xavier_uniform_(m.weight)
            m.bias.data[:] = 0.0
    # re-randomize biases a bit so bias import paths are exercised
    for m in net.modules():
        if isinstance(m, (torch.nn.Conv3d, torch.nn.Linear, torch.nn.Conv1d)):
            m.bias.data.normal_(0, 0.02)

    rng = np.random.RandomState(3)
    x = torch.tensor(rng.randn(2, 16, 8, 8, 8), dtype=torch.float32)
    t = torch.tensor([5, 777], dtype=torch.long)
    with torch.no_grad():
        y = net(x, t)

    out = {"unet_x": x.numpy(), "unet_t": t.numpy(), "unet_y": y.numpy()}
    for k, v in net.state_dict().items():
        out[f"sd::{k}"] = v.numpy()

    # --- RenderMLP golden (uses the pytorch3d-free parts only if possible)
    try:
        from holo_diffusion.holo_voxel_grid_implicit_function import RenderMLP

        torch.manual_seed(11)
        mlp = RenderMLP(
            input_dims=32,
            output_feature_dims=3,
            output_vp_independent_feature_dims=0,
            feat_emb_dims=0,
            dir_emb_dims=4,
            dnet_num_layers=4,
            dnet_hidden_dim=64,
            dnet_input_skips=(2,),
            rnet_num_layers=1,
            rnet_hidden_dim=48,
        ).eval()
        feats = torch.tensor(rng.randn(4, 10, 32), dtype=torch.float32)
        dirs = torch.nn.functional.normalize(
            torch.tensor(rng.randn(4, 10, 3), dtype=torch.float32), dim=-1
        )
        with torch.no_grad():
            dens, rad, vp = mlp(feats, dirs)
        out["rmlp_feats"] = feats.numpy()
        out["rmlp_dirs"] = dirs.numpy()
        out["rmlp_densities"] = dens.numpy()
        out["rmlp_radiance"] = rad.numpy()
        for k, v in mlp.state_dict().items():
            out[f"rmlp_sd::{k}"] = v.numpy()
        print("RenderMLP golden: ok")
    except Exception as e:  # pytorch3d missing
        print(f"RenderMLP golden skipped: {e}")

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "unet_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays")


if __name__ == "__main__":
    main()
