"""WHOLE-FORWARD pixel-parity golden (VERDICT r3 missing #2).

Composes ONE torch functional forward over the reference module chain
(holo_diffusion_model.py:201-540): preprocess (mask to white bg) ->
view-pool (project / grid_sample / MLPMean aggregate, custom_modules.py:
162-293) -> pooled mapper + tanh (holo_diffusion_model.py:369-375) ->
diffusion mechanism (reference GaussianDiffusion q_sample + p_mean_variance
pred_xstart at fixed t with fixed noise, + the bootstrap second pass,
holo_diffusion_model.py:385-418; eval: tanh(net_3d(x, t=0)), :420-426) ->
two-pass EA render (reference RenderMLP, holo_multipass_ea.py:79-123) ->
MC splat + view metrics + objective.

The per-leg goldens (make_goldens_unet/mlp/render/render2pass/diffusion/
gridsample) pin each leg; THIS golden pins the cross-leg seams: masking /
normalization order, NDC handoffs, tanh placement, target/source slicing,
the channels-first<->last reshape of the pooled grid, and the metric
sampling convention.

Reference modules are used directly where importable offline (UNetModel,
RenderMLP, MLPWithInputSkips, GaussianDiffusion); the pytorch3d-internal
pieces (grid_sample view sampling, wmean aggregation, EA march) are
composed from the same torch primitives the per-leg generators already
validated.

Randomness: the training forward's noise / bootstrap coin / ray selection
are jax-PRNG driven inside `HoloDiffusionModel.__call__`; this generator
replicates the exact split chain (holo_model.py:499-500 -> denoise :232 ->
render :390) so the torch math runs on the SAME noise and rays the jax
test-side forward will draw. If the split structure in holo_model.py
changes, tests/test_holo_forward_parity.py fails loudly -> regenerate.

Run from tests/:  python make_goldens_holo_forward.py
Writes goldens/holo_forward_goldens.npz.
"""
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import make_goldens_render as mgr
from make_goldens_render import torch_ea_march
from make_goldens_render2pass import (
    torch_ea_weights,
    torch_rasterize_mc,
    torch_sample_pdf_det,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REF = "/root/reference"

# ---- tiny-but-structurally-full config (mirrored in the parity test)
N_VIEWS = 5
IMG = 32                      # input image resolution
RESOL = 8                     # voxel grid resolution
VOX_EXTENT = 3.0              # volume_extent
C_VOX = 8                     # feature_size
PROJ_DIM = 4                  # resnet stage projection dim
AGG_HIDDEN = 16
AGG_OUT = 12
N_HARM_RAY = 3
REND_H = REND_W = 16          # render_image_height/width
N_PTS = 8                     # coarse pts/ray
N_FINE = 4
SCENE_EXTENT = 1.5
N_RAYS_TRAIN = 64
N_TRAIN_TARGETS = 2
T_TRAIN = (700, 123)          # fixed (t, t_bootstrap)
RNG_SEED = 127                # jax PRNGKey for the training forward
                              # (chosen so the bootstrap coin lands True —
                              # uniform(rng_b)=0.035 < 0.5 — to pin the
                              # bootstrapped second denoise pass too)
UNET_MC = 32                  # model_channels (GroupNorm(32) floor)

_IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


# ---------------------------------------------------------------------------
# torch legs
# ---------------------------------------------------------------------------


class TorchBasicBlock(torch.nn.Module):
    """torchvision BasicBlock (conv-bn-relu-conv-bn + id, relu)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class TorchResNetStem(torch.nn.Module):
    """torchvision resnet18 stem + layer1 (the stages=(1,) extractor body),
    with torchvision state_dict key names (conv1, bn1, layer1.{0,1}.*)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.layer1 = torch.nn.Sequential(
            TorchBasicBlock(64, 64), TorchBasicBlock(64, 64)
        )

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        return self.layer1(x)


def torch_extract_features(src_imgs, fg_mask, resnet, proj):
    """ResNetFeatureExtractor semantics (Implicitron; feature_extractor.py):
    dict of maps the view sampler consumes — full-res masked images + masks,
    plus the rescaled->stem->layer1->proj->l2norm stage map."""
    x = src_imgs.permute(0, 3, 1, 2)  # (S, 3, H, W)
    feats = {"images": src_imgs, "masks": fg_mask}  # NHWC entries
    x = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False)
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    f = proj(resnet(x))
    f = f / torch.clamp(f.norm(dim=1, keepdim=True), min=1e-6)
    feats["res_layer_1"] = f.permute(0, 2, 3, 1)  # NHWC
    return feats


def torch_project_ndc(R, T, focal, pp, pts):
    """project_points_ndc mirror: x_cam = x @ R + T (pytorch3d row-vector),
    ndc = xy * f / z + pp (+x left / +y up). Returns (S, N, 2), (S, N, 1)."""
    cam = torch.einsum("ni,sij->snj", pts, R) + T[:, None, :]
    z = cam[..., 2:3]
    xy = cam[..., :2] * focal[:, None, :] / z + pp[:, None, :]
    return xy, z


def torch_sample_ndc(img_nhwc, xy_ndc):
    """bilinear_sample_ndc mirror: flip pytorch3d NDC signs into grid_sample
    coords, align_corners=False, zeros padding. (S,H,W,C),(S,N,2)->(S,N,C)."""
    grid = (-xy_ndc).reshape(xy_ndc.shape[0], 1, -1, 2)
    out = F.grid_sample(
        img_nhwc.permute(0, 3, 1, 2), grid,
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )  # (S, C, 1, N)
    return out[:, :, 0, :].permute(0, 2, 1)


def torch_harmonic(x, n):
    """pytorch3d HarmonicEmbedding (logspace, omega_0=1, append_input)."""
    freqs = 2.0 ** torch.arange(n, dtype=torch.float32)
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return torch.cat([emb.sin(), emb.cos(), x], dim=-1)


def torch_voxel_pts():
    """voxel_coord_grid mirror (VolumeLocator coord grid, z-major flatten)."""
    coords = (torch.arange(RESOL, dtype=torch.float32) - (RESOL - 1) / 2.0) * (
        VOX_EXTENT / RESOL
    )
    zz, yy, xx = torch.meshgrid(coords, coords, coords, indexing="ij")
    return torch.stack([xx, yy, zz], dim=-1).reshape(-1, 3)


def torch_pool(cams, src_imgs_masked, fg_mask, resnet, proj, agg, mapper):
    """views -> (RESOL,)*3 + (C_VOX,) voxel grid in [-1, 1]
    (holo_diffusion_model.py:327-375). cams: dict of (S, ...) arrays."""
    feats = torch_extract_features(src_imgs_masked, fg_mask, resnet, proj)
    pts = torch_voxel_pts()
    xy, z = torch_project_ndc(
        cams["R"], cams["T"], cams["focal"], cams["pp"], pts
    )
    sampled = torch.cat(
        [torch_sample_ndc(feats[k], xy) for k in sorted(feats)], dim=-1
    )  # (S, N, F)
    in_front = (z > 0).float()  # masks_sampled (masked_sampling: false)

    # MLPMean aggregator (custom_modules.py:205-293)
    centers = -torch.einsum("si,sji->sj", cams["T"], cams["R"])
    ray = pts[None] - centers[:, None]
    ray = ray / torch.clamp(ray.norm(dim=-1, keepdim=True), min=1e-12)
    ray = torch_harmonic(ray, N_HARM_RAY)
    w = in_front
    x = torch.cat([sampled, ray], dim=-1) * w
    mean = (x * w).sum(0, keepdim=True) / torch.clamp(
        w.sum(0, keepdim=True), min=1e-4
    )
    mlp_in = agg["first_sampled"](x) + agg["first_mean"](mean)
    mlp_out = agg["last"](agg["mlp"](mlp_in))
    attn = torch.softmax(mlp_out[..., :1], dim=0)
    pooled = (mlp_out * attn).sum(0)  # (N, AGG_OUT)

    v = torch.tanh(mapper(pooled))  # mapper THEN tanh (:369-375)
    return v.reshape(RESOL, RESOL, RESOL, C_VOX)


def torch_decode(grid_dhwc, origins, dirs, lengths, rmlp):
    """trilinear sample + RenderMLP at ray points (render2pass pattern)."""
    pts = origins[..., None, :] + dirs[..., None, :] * lengths[..., None]
    feats = mgr.torch_trilinear_world(grid_dhwc, pts)
    dirs_n = F.normalize(dirs, dim=-1)
    dirs_exp = dirs_n[..., None, :].expand(*feats.shape[:-1], 3)
    dens, radiance, vp = rmlp(feats, dirs_exp)
    assert vp is None
    return dens, radiance


def torch_render_two_pass(grid_dhwc, bundle, rmlp):
    """coarse EA -> det inverse-CDF refine (append coarse) -> fine EA."""
    origins = torch.tensor(np.asarray(bundle["origins"]))
    dirs = torch.tensor(np.asarray(bundle["directions"]))
    lengths0 = torch.tensor(np.asarray(bundle["lengths"]))
    dens0, rad0 = torch_decode(grid_dhwc, origins, dirs, lengths0, rmlp)
    img0, dep0, msk0 = torch_ea_march(dens0, rad0, lengths0)
    w0 = torch_ea_weights(dens0, lengths0)
    mids = 0.5 * (lengths0[..., 1:] + lengths0[..., :-1])
    fine = torch_sample_pdf_det(mids, w0[..., 1:-1], N_FINE)
    lengths1, _ = torch.sort(torch.cat([lengths0, fine], dim=-1), dim=-1)
    dens1, rad1 = torch_decode(grid_dhwc, origins, dirs, lengths1, rmlp)
    img1, dep1, msk1 = torch_ea_march(dens1, rad1, lengths1)
    return (img0, dep0, msk0), (img1, dep1, msk1)


def torch_rgb_mse(img_pred, gt_imgs, xys):
    """view_metrics loss_rgb_mse: gt sampled at ray NDC, plain mean."""
    gt = torch_sample_ndc(gt_imgs, torch.tensor(np.asarray(xys)))
    return ((img_pred - gt) ** 2).mean()


# ---------------------------------------------------------------------------


def main():
    from make_goldens_mlp import _install_pytorch3d_stubs

    _install_pytorch3d_stubs()
    sys.path.insert(0, REF)
    from holo_diffusion.custom_modules import MLPWithInputSkips
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

    from holo_diffusion_tpu.data.synthetic import make_synthetic_scene
    from holo_diffusion_tpu.geometry.rays import (
        sample_rays_from_mask,
        sample_rays_full_grid,
    )

    torch.manual_seed(20)
    out = {}

    # ---- inputs
    scene = make_synthetic_scene(n_views=N_VIEWS, image_size=IMG, seed=11)
    img = np.asarray(scene.image_rgb, np.float32)
    fg = np.asarray(scene.fg_probability, np.float32)
    cams = {
        "R": torch.tensor(np.asarray(scene.camera.R, np.float32)),
        "T": torch.tensor(np.asarray(scene.camera.T, np.float32)),
        "focal": torch.tensor(np.asarray(scene.camera.focal_length, np.float32)),
        "pp": torch.tensor(np.asarray(scene.camera.principal_point, np.float32)),
    }
    out.update(
        image_rgb=img, fg_probability=fg,
        cam_R=cams["R"].numpy(), cam_T=cams["T"].numpy(),
        cam_focal=cams["focal"].numpy(), cam_pp=cams["pp"].numpy(),
    )

    # preprocess_input: threshold fg, composite to WHITE bg
    fg_mask = torch.tensor((fg > 0.5).astype(np.float32))
    img_t = torch.tensor(img)
    img_masked = img_t * fg_mask + (1.0 - fg_mask)

    # ---- torch weights (randomized; saved in reference state_dict layout)
    resnet = TorchResNetStem().eval()
    with torch.no_grad():
        for p in resnet.parameters():
            p.normal_(0, 0.08)
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)
    proj = torch.nn.Conv2d(64, PROJ_DIM, 1).eval()

    cat_dim = (PROJ_DIM + 1 + 3) + 3 * (2 * N_HARM_RAY + 1)
    agg = {
        "first_sampled": torch.nn.Linear(cat_dim, AGG_HIDDEN),
        "first_mean": torch.nn.Linear(cat_dim, AGG_HIDDEN),
        "mlp": MLPWithInputSkips(
            n_layers=1, input_dim=AGG_HIDDEN, output_dim=AGG_HIDDEN,
            skip_dim=AGG_HIDDEN, hidden_dim=AGG_HIDDEN, input_skips=[],
        ),
        "last": torch.nn.Linear(AGG_HIDDEN, AGG_OUT),
    }
    mapper = torch.nn.Linear(AGG_OUT, C_VOX)
    unet = UNetModel(
        dims=3, image_size=RESOL, in_channels=C_VOX, model_channels=UNET_MC,
        out_channels=C_VOX, num_res_blocks=1, attention_resolutions=(2,),
        dropout=0.0, channel_mult=(1, 2), num_classes=None,
        use_checkpoint=False, num_heads=2, num_head_channels=-1,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=False, zero_last_conv=False,
        homogeneous_resample=True,
    ).eval()
    with torch.no_grad():
        for m in unet.modules():
            if isinstance(m, (torch.nn.Conv3d, torch.nn.Linear, torch.nn.Conv1d)):
                torch.nn.init.xavier_uniform_(m.weight)
                m.bias.data.normal_(0, 0.02)
    rmlp = RenderMLP(
        input_dims=C_VOX, output_feature_dims=3,
        output_vp_independent_feature_dims=0, feat_emb_dims=0,
        dir_emb_dims=4, dnet_num_layers=4, dnet_hidden_dim=16,
        dnet_input_skips=(2,), rnet_num_layers=1, rnet_hidden_dim=16,
    ).eval()

    # save the reference-prefixed state_dict the import shim consumes
    # (convert_holo_model_state_dict prefixes, torch_import.py:292-300)
    for k, v in resnet.state_dict().items():
        out[f"sd::image_feature_extractor.net.{k}"] = v.numpy()
    out["sd::image_feature_extractor.proj_layers.0.weight"] = (
        proj.weight.detach().numpy()
    )
    out["sd::image_feature_extractor.proj_layers.0.bias"] = (
        proj.bias.detach().numpy()
    )
    for name, mod in agg.items():
        pref = {"first_sampled": "_first_sampled", "first_mean": "_first_mean",
                "mlp": "_mlp", "last": "_last"}[name]
        for k, v in mod.state_dict().items():
            out[f"sd::view_pooler.feature_aggregator.{pref}.{k}"] = v.numpy()
    for k, v in mapper.state_dict().items():
        out[f"sd::pooled_feature_mapper.{k}"] = v.numpy()
    for k, v in unet.state_dict().items():
        out[f"sd::net_3d._net.{k}"] = v.numpy()
    for k, v in rmlp.state_dict().items():
        out[f"sd::_implicit_functions.0._fn.render_mlp.{k}"] = v.numpy()

    gd = GaussianDiffusion(
        betas=get_named_beta_schedule("linear", 1000, 0.0001, 0.02),
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )

    def unet_cl(x_cl, t):
        """channels-last (1,D,H,W,C) -> reference UNet -> channels-last."""
        y = unet(x_cl.permute(0, 4, 1, 2, 3), t)
        return y.permute(0, 2, 3, 4, 1)

    # =====================================================================
    # EVAL forward: target view 0, sources 1..4
    # =====================================================================
    with torch.no_grad():
        sub = slice(1, N_VIEWS)
        grid = torch_pool(
            {k: v[sub] for k, v in cams.items()},
            img_masked[sub], fg_mask[sub], resnet, proj, agg, mapper,
        )
        out["eval_grid_pooled"] = grid.numpy()
        # eval denoise: tanh(net_3d(x, t=0)) (holo_diffusion_model.py:420-426)
        t0 = torch.zeros((1,), dtype=torch.long)
        grid_dn = torch.tanh(unet_cl(grid[None], t0))[0]
        out["eval_grid_denoised"] = grid_dn.numpy()

        bundle_eval = sample_rays_full_grid(
            scene.camera[:1], REND_H, REND_W, N_PTS,
            (0.0, 0.0, 0.0), SCENE_EXTENT,
        )
        mgr.EXTENT = VOX_EXTENT
        be = {"origins": bundle_eval.origins, "directions": bundle_eval.directions,
              "lengths": bundle_eval.lengths}
        (img0, dep0, msk0), (img1, dep1, msk1) = torch_render_two_pass(
            grid_dn, be, rmlp
        )
        out["eval_image"] = img1.reshape(1, REND_H, REND_W, 3).numpy()
        out["eval_depth"] = dep1.reshape(1, REND_H, REND_W, 1).numpy()
        out["eval_mask"] = msk1.reshape(1, REND_H, REND_W, 1).numpy()
        mse_f = torch_rgb_mse(img1, img_masked[:1], bundle_eval.xys)
        mse_c = torch_rgb_mse(img0, img_masked[:1], bundle_eval.xys)
        out["eval_rgb_mse"] = mse_f.numpy()
        out["eval_prev_rgb_mse"] = mse_c.numpy()
        out["eval_objective"] = (mse_f + mse_c).numpy()

    # =====================================================================
    # TRAINING forward: targets 0..1, sources 2..4, fixed t + noise,
    # bootstrap second pass, mask_sample rays, MC splat.
    # PRNG chain replicated from holo_model.py:499-500, :232, :390.
    # =====================================================================
    rng = jax.random.PRNGKey(RNG_SEED)
    _rng_pool, rng_denoise, rng_render = jax.random.split(rng, 3)
    _t, rng_n, _t2, rng_n2, rng_b = jax.random.split(rng_denoise, 5)
    noise = np.asarray(jax.random.normal(rng_n, (1,) + (RESOL,) * 3 + (C_VOX,)))
    noise2 = np.asarray(jax.random.normal(rng_n2, (1,) + (RESOL,) * 3 + (C_VOX,)))
    take_boot = bool(jax.random.uniform(rng_b, ()) < 0.5)
    rng_rays, _rng_render2 = jax.random.split(rng_render)
    mask_crop = np.ones((N_VIEWS, IMG, IMG, 1), np.float32)
    bundle_tr = sample_rays_from_mask(
        scene.camera[:N_TRAIN_TARGETS],
        jnp.asarray(mask_crop[:N_TRAIN_TARGETS, ..., 0]),
        N_RAYS_TRAIN, N_PTS, rng_rays,
        (0.0, 0.0, 0.0), SCENE_EXTENT, stratified=False,
    )
    out["mask_crop"] = mask_crop
    out["train_take_boot"] = np.asarray(take_boot)
    out["train_timesteps"] = np.asarray(T_TRAIN, np.int64)
    out["train_xys"] = np.asarray(bundle_tr.xys)

    with torch.no_grad():
        sub = slice(N_TRAIN_TARGETS, N_VIEWS)
        grid0 = torch_pool(
            {k: v[sub] for k, v in cams.items()},
            img_masked[sub], fg_mask[sub], resnet, proj, agg, mapper,
        )
        x0 = grid0[None].permute(0, 4, 1, 2, 3)  # channels-first for gd
        t1 = torch.tensor([T_TRAIN[0]], dtype=torch.long)
        x_t = gd.q_sample(x0, t1, noise=torch.tensor(noise).permute(0, 4, 1, 2, 3))
        out["train_x_t"] = x_t.permute(0, 2, 3, 4, 1).numpy()
        v = gd.p_mean_variance(
            model=unet, x=x_t, t=t1, clip_denoised=True, model_kwargs={}
        )["pred_xstart"]
        if take_boot:  # bootstrap pass (holo_diffusion_model.py:401-418)
            t2 = torch.tensor([T_TRAIN[1]], dtype=torch.long)
            x_t2 = gd.q_sample(
                v, t2, noise=torch.tensor(noise2).permute(0, 4, 1, 2, 3)
            )
            v = gd.p_mean_variance(
                model=unet, x=x_t2, t=t2, clip_denoised=True, model_kwargs={}
            )["pred_xstart"]
        grid_tr = v.permute(0, 2, 3, 4, 1)[0]
        out["train_voxel_features"] = grid_tr[None].numpy()

        bt = {"origins": bundle_tr.origins, "directions": bundle_tr.directions,
              "lengths": bundle_tr.lengths}
        (img0_c, dep0_c, msk0_c), (img1_f, dep1_f, msk1_f) = (
            torch_render_two_pass(grid_tr, bt, rmlp)
        )
        xys = torch.tensor(np.asarray(bundle_tr.xys))
        spl_img, spl_dep, spl_msk = torch_rasterize_mc(
            xys, img1_f, dep1_f, msk1_f, REND_H, REND_W
        )
        out["train_images_render"] = spl_img.numpy()
        out["train_depths_render"] = spl_dep.numpy()
        out["train_masks_render"] = spl_msk.numpy()
        gt_t = img_masked[:N_TRAIN_TARGETS]
        mse_f = torch_rgb_mse(img1_f, gt_t, bundle_tr.xys)
        mse_c = torch_rgb_mse(img0_c, gt_t, bundle_tr.xys)
        out["train_rgb_mse"] = mse_f.numpy()
        out["train_prev_rgb_mse"] = mse_c.numpy()
        out["train_objective"] = (mse_f + mse_c).numpy()

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "holo_forward_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays -> holo_forward_goldens.npz "
          f"(take_boot={take_boot})")


if __name__ == "__main__":
    main()
