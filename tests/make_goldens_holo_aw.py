"""Whole-forward golden for the ANGLE-WEIGHTED aggregator path (VERDICT r4
weak #4): the release apple/donut/teddybear configs select Implicitron's
`AngleWeightedReductionFeatureAggregator` (AVG+STD) instead of MLPMean
(reference category-config diff vs hydrant.yaml), and that path had no
cross-framework golden.

`torch_angle_weighted_avg_std` below is an INDEPENDENTLY-DERIVED torch
implementation of the aggregator's documented semantics (pytorch3d is not
installed in this env — Implicitron's view_pooler/feature_aggregator.py
AngleWeightedReduction: per-source weight
    w_s = ((1 + cos(source-ray, reference-ray)) / 2 + min_ray_angle_weight)
          ** weight_by_ray_angle_gamma  *  mask_s
with the batch's principal (first) camera as the reference, then weighted
AVG and weighted STD across sources). The epsilons (w_sum floor 1e-6, var
floor 1e-8) are implementation choices mirrored on both sides.

The rest of the chain (extractor, projection/sampling, mapper+tanh,
diffusion bootstrap, two-pass render, splat, metrics) reuses the EXACT
helper functions and `sd::` weights of make_goldens_holo_forward.py — only
the aggregator and the (re-dimensioned) pooled mapper differ, so this golden
isolates the aggregator seam.

Run from tests/:  python make_goldens_holo_aw.py
Writes goldens/holo_aw_goldens.npz.
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import make_goldens_render as mgr
from make_goldens_holo_forward import (
    C_VOX,
    N_PTS,
    N_RAYS_TRAIN,
    N_TRAIN_TARGETS,
    N_VIEWS,
    PROJ_DIM,
    REND_H,
    REND_W,
    RESOL,
    RNG_SEED,
    SCENE_EXTENT,
    T_TRAIN,
    UNET_MC,
    VOX_EXTENT,
    REF,
    TorchResNetStem,
    torch_extract_features,
    torch_project_ndc,
    torch_rgb_mse,
    torch_render_two_pass,
    torch_sample_ndc,
    torch_voxel_pts,
)
from make_goldens_holo_backward import _load
from make_goldens_render2pass import torch_rasterize_mc

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
GOLD = np.load(os.path.join(OUT, "holo_forward_goldens.npz"))

GAMMA = 1.0
MIN_W = 0.1
FEAT_DIM = PROJ_DIM + 1 + 3  # res_layer_1 + masks + images


def torch_angle_weighted_avg_std(feats_sampled, masks_sampled, cams, pts):
    """Independently-derived AVG+STD angle-weighted reduction.

    feats_sampled: (S, N, F); masks_sampled: (S, N, 1); pts: (N, 3).
    Returns (N, 2F) = [weighted mean ‖ weighted std] across sources."""
    centers = -torch.einsum("si,sji->sj", cams["T"], cams["R"])  # (S, 3)
    d = pts[None] - centers[:, None]
    d = d / torch.clamp(d.norm(dim=-1, keepdim=True), min=1e-12)
    cos = (d * d[:1]).sum(-1, keepdim=True)  # vs principal (first) camera
    w = ((1.0 + cos) / 2.0 + MIN_W) ** GAMMA
    w = w * masks_sampled
    w_sum = torch.clamp(w.sum(0), min=1e-6)
    mean = (feats_sampled * w).sum(0) / w_sum
    var = (((feats_sampled - mean[None]) ** 2) * w).sum(0) / w_sum
    std = torch.sqrt(torch.clamp(var, min=1e-8))
    return torch.cat([mean, std], dim=-1)


def torch_pool_aw(cams, src_imgs_masked, fg_mask, resnet, proj, mapper):
    """views -> voxel grid via the AngleWeighted (AVG+STD) aggregator
    (holo_diffusion_model.py:327-375 with the release category aggregator)."""
    feats = torch_extract_features(src_imgs_masked, fg_mask, resnet, proj)
    pts = torch_voxel_pts()
    xy, z = torch_project_ndc(
        cams["R"], cams["T"], cams["focal"], cams["pp"], pts
    )
    sampled = torch.cat(
        [torch_sample_ndc(feats[k], xy) for k in sorted(feats)], dim=-1
    )
    in_front = (z > 0).float()
    pooled = torch_angle_weighted_avg_std(sampled, in_front, cams, pts)
    v = torch.tanh(mapper(pooled))
    return v.reshape(RESOL, RESOL, RESOL, C_VOX)


def main():
    from make_goldens_mlp import _install_pytorch3d_stubs

    _install_pytorch3d_stubs()
    sys.path.insert(0, REF)
    from holo_diffusion.guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion,
        LossType,
        ModelMeanType,
        ModelVarType,
        get_named_beta_schedule,
    )
    from holo_diffusion.guided_diffusion.unet import UNetModel
    from holo_diffusion.holo_voxel_grid_implicit_function import RenderMLP

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras
    from holo_diffusion_tpu.geometry.rays import (
        sample_rays_from_mask,
        sample_rays_full_grid,
    )

    # shared weights from the forward golden
    resnet = _load(TorchResNetStem(), "image_feature_extractor.net.").eval()
    proj = torch.nn.Conv2d(64, PROJ_DIM, 1).eval()
    proj.weight.data = torch.tensor(
        np.asarray(GOLD["sd::image_feature_extractor.proj_layers.0.weight"])
    )
    proj.bias.data = torch.tensor(
        np.asarray(GOLD["sd::image_feature_extractor.proj_layers.0.bias"])
    )
    unet = _load(
        UNetModel(
            dims=3, image_size=RESOL, in_channels=C_VOX,
            model_channels=UNET_MC, out_channels=C_VOX, num_res_blocks=1,
            attention_resolutions=(2,), dropout=0.0, channel_mult=(1, 2),
            num_classes=None, use_checkpoint=False, num_heads=2,
            num_head_channels=-1, num_heads_upsample=-1,
            use_scale_shift_norm=True, resblock_updown=False,
            zero_last_conv=False, homogeneous_resample=True,
        ),
        "net_3d._net.",
    ).eval()
    rmlp = _load(
        RenderMLP(
            input_dims=C_VOX, output_feature_dims=3,
            output_vp_independent_feature_dims=0, feat_emb_dims=0,
            dir_emb_dims=4, dnet_num_layers=4, dnet_hidden_dim=16,
            dnet_input_skips=(2,), rnet_num_layers=1, rnet_hidden_dim=16,
        ),
        "_implicit_functions.0._fn.render_mlp.",
    ).eval()

    # the ONLY new learned piece: the pooled mapper over 2F dims
    torch.manual_seed(77)
    mapper = torch.nn.Linear(2 * FEAT_DIM, C_VOX)

    out = {}
    for k, v in mapper.state_dict().items():
        out[f"sd::pooled_feature_mapper.{k}"] = v.numpy()

    gd = GaussianDiffusion(
        betas=get_named_beta_schedule("linear", 1000, 0.0001, 0.02),
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )

    def unet_cl(x_cl, t):
        y = unet(x_cl.permute(0, 4, 1, 2, 3), t)
        return y.permute(0, 2, 3, 4, 1)

    img = GOLD["image_rgb"]
    fg = GOLD["fg_probability"]
    cams = {
        "R": torch.tensor(GOLD["cam_R"]), "T": torch.tensor(GOLD["cam_T"]),
        "focal": torch.tensor(GOLD["cam_focal"]),
        "pp": torch.tensor(GOLD["cam_pp"]),
    }
    camera = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]), T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    fg_mask = torch.tensor((fg > 0.5).astype(np.float32))
    img_masked = torch.tensor(img) * fg_mask + (1.0 - fg_mask)
    mgr.EXTENT = VOX_EXTENT

    # ---- EVAL forward (target 0, sources 1..4)
    with torch.no_grad():
        sub = slice(1, N_VIEWS)
        grid = torch_pool_aw(
            {k: v[sub] for k, v in cams.items()},
            img_masked[sub], fg_mask[sub], resnet, proj, mapper,
        )
        out["eval_grid_pooled"] = grid.numpy()
        t0 = torch.zeros((1,), dtype=torch.long)
        grid_dn = torch.tanh(unet_cl(grid[None], t0))[0]
        bundle_eval = sample_rays_full_grid(
            camera[:1], REND_H, REND_W, N_PTS, (0.0, 0.0, 0.0), SCENE_EXTENT,
        )
        be = {"origins": bundle_eval.origins,
              "directions": bundle_eval.directions,
              "lengths": bundle_eval.lengths}
        (img0, _, _), (img1, dep1, msk1) = torch_render_two_pass(
            grid_dn, be, rmlp
        )
        out["eval_image"] = img1.reshape(1, REND_H, REND_W, 3).numpy()
        out["eval_mask"] = msk1.reshape(1, REND_H, REND_W, 1).numpy()
        mse_f = torch_rgb_mse(img1, img_masked[:1], bundle_eval.xys)
        mse_c = torch_rgb_mse(img0, img_masked[:1], bundle_eval.xys)
        out["eval_objective"] = (mse_f + mse_c).numpy()

    # ---- TRAINING forward (same jax-PRNG chain as the MLPMean golden)
    rng = jax.random.PRNGKey(RNG_SEED)
    _rng_pool, rng_denoise, rng_render = jax.random.split(rng, 3)
    _t, rng_n, _t2, rng_n2, rng_b = jax.random.split(rng_denoise, 5)
    noise = np.asarray(jax.random.normal(rng_n, (1,) + (RESOL,) * 3 + (C_VOX,)))
    noise2 = np.asarray(jax.random.normal(rng_n2, (1,) + (RESOL,) * 3 + (C_VOX,)))
    take_boot = bool(jax.random.uniform(rng_b, ()) < 0.5)
    assert take_boot
    rng_rays, _ = jax.random.split(rng_render)
    mask_crop = np.ones((N_VIEWS,) + img.shape[1:3] + (1,), np.float32)
    bundle_tr = sample_rays_from_mask(
        camera[:N_TRAIN_TARGETS],
        jnp.asarray(mask_crop[:N_TRAIN_TARGETS, ..., 0]),
        N_RAYS_TRAIN, N_PTS, rng_rays,
        (0.0, 0.0, 0.0), SCENE_EXTENT, stratified=False,
    )

    with torch.no_grad():
        sub = slice(N_TRAIN_TARGETS, N_VIEWS)
        grid0 = torch_pool_aw(
            {k: v[sub] for k, v in cams.items()},
            img_masked[sub], fg_mask[sub], resnet, proj, mapper,
        )
        x0 = grid0[None].permute(0, 4, 1, 2, 3)
        t1 = torch.tensor([T_TRAIN[0]], dtype=torch.long)
        x_t = gd.q_sample(
            x0, t1, noise=torch.tensor(noise).permute(0, 4, 1, 2, 3)
        )
        v = gd.p_mean_variance(
            model=unet, x=x_t, t=t1, clip_denoised=True, model_kwargs={}
        )["pred_xstart"]
        t2 = torch.tensor([T_TRAIN[1]], dtype=torch.long)
        x_t2 = gd.q_sample(
            v, t2, noise=torch.tensor(noise2).permute(0, 4, 1, 2, 3)
        )
        v = gd.p_mean_variance(
            model=unet, x=x_t2, t=t2, clip_denoised=True, model_kwargs={}
        )["pred_xstart"]
        grid_tr = v.permute(0, 2, 3, 4, 1)[0]

        bt = {"origins": bundle_tr.origins,
              "directions": bundle_tr.directions,
              "lengths": bundle_tr.lengths}
        (img0_c, _, _), (img1_f, dep1_f, msk1_f) = torch_render_two_pass(
            grid_tr, bt, rmlp
        )
        xys = torch.tensor(np.asarray(bundle_tr.xys))
        spl_img, _, _ = torch_rasterize_mc(
            xys, img1_f, dep1_f, msk1_f, REND_H, REND_W
        )
        out["train_voxel_features"] = grid_tr[None].numpy()
        out["train_images_render"] = spl_img.numpy()
        gt_t = img_masked[:N_TRAIN_TARGETS]
        mse_f = torch_rgb_mse(img1_f, gt_t, bundle_tr.xys)
        mse_c = torch_rgb_mse(img0_c, gt_t, bundle_tr.xys)
        out["train_objective"] = (mse_f + mse_c).numpy()

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "holo_aw_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays -> holo_aw_goldens.npz")


if __name__ == "__main__":
    main()
