"""Record the TWO-PASS render golden + the MC-splat golden (VERDICT r2 #7).

Extends make_goldens_render.py's single-pass pixel-parity chain to the full
reference render structure (holo_multipass_ea.py:79-123): coarse EA pass ->
RayPointRefiner importance re-sampling (deterministic inverse-CDF, the
pytorch3d `sample_pdf` det branch) with `append_coarse_samples_to_fine` ->
fine pass through the SAME reference RenderMLP -> EA; plus the training-path
MC splat (`rasterize_sparse_ray_bundle` average-collision semantics,
holo_diffusion_model.py:499-513) on recorded sparse rays.

Run from tests/:  python make_goldens_render2pass.py
Writes goldens/render2pass_goldens.npz.
"""
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_goldens_render import torch_ea_march, torch_trilinear_world

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
H_IMG = W_IMG = 16
N_PTS = 10
N_FINE = 6
D, C = 8, 16
SCENE_EXTENT = 3.0


def torch_sample_pdf_det(bins, weights, n_samples, eps=1e-5):
    """Deterministic inverse-CDF sampling (pytorch3d sample_pdf, det branch):
    u = linspace(0, 1, n), piecewise-linear inverse of the bin CDF."""
    weights = weights + eps
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)  # (..., M)
    u = torch.linspace(0.0, 1.0, n_samples).expand(*cdf.shape[:-1], n_samples)
    inds = (u[..., :, None] >= cdf[..., None, :]).sum(-1)
    below = (inds - 1).clamp(0, cdf.shape[-1] - 1)
    above = inds.clamp(0, cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, below.clamp(0, bins.shape[-1] - 1))
    bins_a = torch.gather(bins, -1, above.clamp(0, bins.shape[-1] - 1))
    denom = torch.where(cdf_a - cdf_b < 1e-8, torch.ones_like(cdf_a), cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def torch_ea_weights(raw_density, lengths, bg_opacity=1e10, surface_thickness=1):
    """EA per-point weights (same semantics as torch_ea_march)."""
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
    return cap * shifted


def torch_rasterize_mc(xys, features, depths, masks, H, W):
    """Average-collision MC splat (rasterize_sparse_ray_bundle semantics)."""
    B, N, Cc = features.shape
    col = ((1.0 - xys[..., 0]) * W / 2.0 - 0.5).round().clamp(0, W - 1)
    row = ((1.0 - xys[..., 1]) * H / 2.0 - 0.5).round().clamp(0, H - 1)
    pix = (row * W + col).long()  # (B, N)
    imgs, deps, msks = [], [], []
    for b in range(B):
        num = torch.zeros(H * W, Cc).index_add_(
            0, pix[b], features[b] * masks[b]
        )
        dep = torch.zeros(H * W, 1).index_add_(0, pix[b], depths[b] * masks[b])
        den = torch.zeros(H * W, 1).index_add_(0, pix[b], masks[b])
        imgs.append((num / den.clamp(min=1e-8)).reshape(H, W, Cc))
        deps.append((dep / den.clamp(min=1e-8)).reshape(H, W, 1))
        msks.append(den.clamp(max=1.0).reshape(H, W, 1))
    return torch.stack(imgs), torch.stack(deps), torch.stack(msks)


def main():
    from make_goldens_mlp import _install_pytorch3d_stubs

    _install_pytorch3d_stubs()
    sys.path.insert(0, "/root/reference")
    from holo_diffusion.holo_voxel_grid_implicit_function import RenderMLP

    import jax

    jax.config.update("jax_platforms", "cpu")
    from holo_diffusion_tpu.data.synthetic import make_synthetic_scene
    from holo_diffusion_tpu.geometry.rays import sample_rays_full_grid

    scene = make_synthetic_scene(n_views=2, image_size=H_IMG, seed=5)
    bundle = sample_rays_full_grid(
        scene.camera[:1], H_IMG, W_IMG, N_PTS, (0.0, 0.0, 0.0), SCENE_EXTENT
    )
    origins = torch.tensor(np.asarray(bundle.origins))
    dirs = torch.tensor(np.asarray(bundle.directions))
    lengths0 = torch.tensor(np.asarray(bundle.lengths))

    torch.manual_seed(7)
    rng = np.random.RandomState(31)
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
    dirs_n = F.normalize(dirs, dim=-1)

    def decode(lengths):
        points = origins[..., None, :] + dirs[..., None, :] * lengths[..., None]
        feats = torch_trilinear_world(grid, points)
        dirs_exp = dirs_n[..., None, :].expand(*feats.shape[:-1], 3)
        dens, radiance, vp = rmlp(feats, dirs_exp)
        assert vp is None
        return dens, radiance

    with torch.no_grad():
        dens0, rad0 = decode(lengths0)
        img0, dep0, msk0 = torch_ea_march(dens0, rad0, lengths0)
        w0 = torch_ea_weights(dens0, lengths0)
        mids = 0.5 * (lengths0[..., 1:] + lengths0[..., :-1])
        fine = torch_sample_pdf_det(mids, w0[..., 1:-1], N_FINE)
        lengths1, _ = torch.sort(torch.cat([lengths0, fine], dim=-1), dim=-1)
        dens1, rad1 = decode(lengths1)
        img1, dep1, msk1 = torch_ea_march(dens1, rad1, lengths1)

        # MC-splat golden on the fine-pass sparse outputs (the training path)
        xys = torch.tensor(np.asarray(bundle.xys))  # (1, N, 2)
        splat_img, splat_dep, splat_msk = torch_rasterize_mc(
            xys, img1, dep1, msk1, H_IMG, W_IMG
        )

    out = {
        "grid": grid.numpy(),
        "coarse_image": img0.numpy(),
        "fine_image": img1.reshape(H_IMG, W_IMG, 3).numpy(),
        "fine_depth": dep1.reshape(H_IMG, W_IMG, 1).numpy(),
        "fine_mask": msk1.reshape(H_IMG, W_IMG, 1).numpy(),
        "fine_lengths": lengths1.numpy(),
        "splat_image": splat_img[0].numpy(),
        "splat_depth": splat_dep[0].numpy(),
        "splat_mask": splat_msk[0].numpy(),
        "cam_R": np.asarray(scene.camera.R[:1]),
        "cam_T": np.asarray(scene.camera.T[:1]),
        "cam_focal": np.asarray(scene.camera.focal_length[:1]),
        "cam_pp": np.asarray(scene.camera.principal_point[:1]),
    }
    for k, v in rmlp.state_dict().items():
        out[f"rmlp_sd::{k}"] = v.numpy()
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "render2pass_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays -> render2pass_goldens.npz")


if __name__ == "__main__":
    main()
