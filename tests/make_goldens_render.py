"""Image-space render golden: a full single-pass emission-absorption render
computed on the TORCH side — reference RenderMLP (real reference code, pytorch3d
stubbed; see make_goldens_mlp.py) + torch grid_sample trilinear sampling (the
CUDA kernel under FullResolutionVoxelGrid.evaluate_world) + the reference EA
raymarcher semantics (Implicitron EmissionAbsorptionRaymarcher: deltas with
background_opacity appended, relu density, cap 1-exp(-x), surface_thickness
shift; holo_multipass_ea.py:31-44,96-100) — against which the JAX framework's
imported-checkpoint render must match pixel-for-pixel (the BASELINE.md
north-star "pixel-level fidelity" row).

Ray generation uses the framework's own full-grid raysampler; camera/ray
conventions are separately golden-tested against recorded pytorch3d tensors
(tests/test_cameras.py, tests/test_rays.py), so the torch side consumes the
recorded ray bundle and everything downstream is cross-implementation.

    python tests/make_goldens_render.py
"""
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

OUT = os.path.join(os.path.dirname(__file__), "goldens")
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H_IMG = W_IMG = 24
N_PTS = 12
D = 8
C = 16
EXTENT = 8.0
SCENE_EXTENT = 3.0


def torch_trilinear_world(grid_dhwc, points_world):
    """world -> pytorch3d local -> F.grid_sample (align_corners, zeros)."""
    Dz, Hy, Wx, Cc = grid_dhwc.shape
    voxel_size = EXTENT / Dz
    half = torch.tensor(
        [(Wx - 1) * voxel_size / 2, (Hy - 1) * voxel_size / 2,
         (Dz - 1) * voxel_size / 2]
    )
    local = points_world / half
    grid = grid_dhwc.permute(3, 0, 1, 2)[None]  # (1, C, D, H, W)
    sampled = F.grid_sample(
        grid,
        local.reshape(1, 1, 1, -1, 3),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )
    return sampled[0, :, 0, 0, :].T.reshape(*points_world.shape[:-1], Cc)


def torch_ea_march(raw_density, features, lengths, bg_opacity=1e10,
                   surface_thickness=1):
    """Reference EA semantics (holo_multipass_ea.py docstring 31-44)."""
    sigma = torch.relu(raw_density[..., 0])
    deltas = torch.cat(
        [lengths[..., 1:] - lengths[..., :-1],
         torch.full_like(lengths[..., :1], bg_opacity)], dim=-1,
    )
    weighted = sigma * deltas
    cap = 1.0 - torch.exp(-weighted)
    cumsum = torch.cumsum(weighted, dim=-1)
    trans = torch.exp(-cumsum)
    shifted = torch.cat(
        [torch.ones_like(trans[..., :surface_thickness]),
         trans[..., :-surface_thickness]], dim=-1,
    )
    w = cap * shifted
    feat = (w[..., None] * features).sum(-2)
    depth = (w * lengths).sum(-1, keepdim=True)
    mask = 1.0 - torch.exp(-cumsum[..., -1:])
    return feat, depth, mask


def main():
    from make_goldens_mlp import _install_pytorch3d_stubs

    _install_pytorch3d_stubs()
    sys.path.insert(0, "/root/reference")
    from holo_diffusion.holo_voxel_grid_implicit_function import RenderMLP

    # rays from the framework's full-grid sampler (deterministic, no strat)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from holo_diffusion_tpu.data.synthetic import make_synthetic_scene
    from holo_diffusion_tpu.geometry.rays import sample_rays_full_grid

    scene = make_synthetic_scene(n_views=2, image_size=H_IMG, seed=3)
    bundle = sample_rays_full_grid(
        scene.camera[:1], H_IMG, W_IMG, N_PTS, (0.0, 0.0, 0.0), SCENE_EXTENT
    )
    origins = torch.tensor(np.asarray(bundle.origins))  # (1, N, 3)
    dirs = torch.tensor(np.asarray(bundle.directions))  # (1, N, 3)
    lengths = torch.tensor(np.asarray(bundle.lengths))  # (1, N, P)

    torch.manual_seed(77)
    rng = np.random.RandomState(13)
    grid = torch.tanh(torch.tensor(rng.randn(D, D, D, C), dtype=torch.float32))
    rmlp = RenderMLP(
        input_dims=C,
        output_feature_dims=3,
        output_vp_independent_feature_dims=0,
        feat_emb_dims=0,
        dir_emb_dims=4,
        dnet_num_layers=4,
        dnet_hidden_dim=32,
        dnet_input_skips=(2,),
        rnet_num_layers=1,
        rnet_hidden_dim=24,
    )

    points = origins[..., None, :] + dirs[..., None, :] * lengths[..., None]
    with torch.no_grad():
        feats = torch_trilinear_world(grid, points)
        dirs_n = F.normalize(dirs, dim=-1)
        dirs_exp = dirs_n[..., None, :].expand(*feats.shape[:-1], 3)
        dens, radiance, vp = rmlp(feats, dirs_exp)
        assert vp is None
        img_flat, depth_flat, mask_flat = torch_ea_march(dens, radiance, lengths)

    out = {
        "grid": grid.numpy(),
        "image": img_flat.reshape(H_IMG, W_IMG, 3).numpy(),
        "depth": depth_flat.reshape(H_IMG, W_IMG, 1).numpy(),
        "mask": mask_flat.reshape(H_IMG, W_IMG, 1).numpy(),
        # camera of the recorded bundle, for re-deriving rays in the test
        "cam_R": np.asarray(scene.camera.R[:1]),
        "cam_T": np.asarray(scene.camera.T[:1]),
        "cam_focal": np.asarray(scene.camera.focal_length[:1]),
        "cam_pp": np.asarray(scene.camera.principal_point[:1]),
    }
    for k, v in rmlp.state_dict().items():
        out[f"rmlp_sd::{k}"] = v.numpy()
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "render_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays -> render_goldens.npz")


if __name__ == "__main__":
    main()
