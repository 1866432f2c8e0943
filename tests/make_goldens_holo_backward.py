"""GRADIENT-parity golden (VERDICT r4 missing #2 / weak #3).

The whole-forward golden (make_goldens_holo_forward.py) pins pixel parity;
THIS golden pins **training dynamics**: torch autograd of the composed
TRAINING objective (reference training_loop.py:533-556 `backward()`; the
objective assembled as in holo_diffusion_model.py:530-538) wrt EVERY
parameter — UNet, RenderMLP, MLPMean aggregator, pooled mapper, extractor
stem + proj — at the same toy config and on the same jax-PRNG randomness,
plus ONE torch Adam step (lr 5e-5, reference optimizer_factory.py:137-150)
to pin the optimizer update semantics against optax.

Subgradient choices this pins that forward parity cannot:
  * clip_denoised clamp [-1,1] boundaries (gaussian_diffusion.py:314-319),
  * gradient flow through BOTH bootstrap denoise passes (no detach in the
    reference, holo_diffusion_model.py:385-418),
  * the importance-refiner's weight detach (pytorch3d RayPointRefiner runs
    sample_pdf under torch.no_grad(); mirrored by the repo's
    renderer.py:127 stop_gradient) — torch side detaches here to match,
  * frozen-BN (eval-mode running stats) backward through the extractor.

Weights are NOT regenerated: they're loaded from the forward golden's
`sd::` arrays, so the two goldens stay consistent by construction.

Run from tests/:  python make_goldens_holo_backward.py
Writes goldens/holo_backward_goldens.npz with
  gd::<reference state_dict name>  — d(objective)/d(param)
  ps::<reference state_dict name>  — param after one Adam(5e-5) step
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import make_goldens_render as mgr
from make_goldens_holo_forward import (
    AGG_HIDDEN,
    AGG_OUT,
    C_VOX,
    N_FINE,
    N_HARM_RAY,
    N_PTS,
    N_RAYS_TRAIN,
    N_TRAIN_TARGETS,
    N_VIEWS,
    IMG,
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
    torch_pool,
    torch_decode,
    torch_rgb_mse,
)
from make_goldens_render import torch_ea_march
from make_goldens_render2pass import (
    torch_ea_weights,
    torch_rasterize_mc,
    torch_sample_pdf_det,
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
GOLD = np.load(os.path.join(OUT, "holo_forward_goldens.npz"))

ADAM_LR = 5e-5  # reference configs/base.yaml:173 (lr), Adam defaults


def torch_render_two_pass_detached_refine(grid_dhwc, bundle, rmlp):
    """Two-pass render with the refine draw DETACHED (pytorch3d
    RayPointRefiner runs sample_pdf inside torch.no_grad(); the repo
    mirrors with stop_gradient at renderer.py:127). Forward-identical to
    make_goldens_holo_forward's path; differs only in the gradient."""
    origins = torch.tensor(np.asarray(bundle["origins"]))
    dirs = torch.tensor(np.asarray(bundle["directions"]))
    lengths0 = torch.tensor(np.asarray(bundle["lengths"]))
    dens0, rad0 = torch_decode(grid_dhwc, origins, dirs, lengths0, rmlp)
    img0, dep0, msk0 = torch_ea_march(dens0, rad0, lengths0)
    with torch.no_grad():
        w0 = torch_ea_weights(dens0.detach(), lengths0)
        mids = 0.5 * (lengths0[..., 1:] + lengths0[..., :-1])
        fine = torch_sample_pdf_det(mids, w0[..., 1:-1], N_FINE)
    lengths1, _ = torch.sort(torch.cat([lengths0, fine], dim=-1), dim=-1)
    dens1, rad1 = torch_decode(grid_dhwc, origins, dirs, lengths1, rmlp)
    img1, dep1, msk1 = torch_ea_march(dens1, rad1, lengths1)
    return (img0, dep0, msk0), (img1, dep1, msk1)


def _load(mod, prefix):
    """Load a torch module's state_dict from the forward golden's sd::
    arrays under `prefix`."""
    sd = {
        k[len("sd::" + prefix):]: torch.tensor(np.asarray(GOLD[k]))
        for k in GOLD.files
        if k.startswith("sd::" + prefix)
    }
    mod.load_state_dict(sd)
    return mod


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

    from holo_diffusion_tpu.geometry.rays import sample_rays_from_mask
    from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras

    # ---- modules rebuilt with the forward golden's exact weights
    resnet = _load(TorchResNetStem(), "image_feature_extractor.net.").eval()
    proj = torch.nn.Conv2d(64, PROJ_DIM, 1).eval()
    proj.weight.data = torch.tensor(
        np.asarray(GOLD["sd::image_feature_extractor.proj_layers.0.weight"])
    )
    proj.bias.data = torch.tensor(
        np.asarray(GOLD["sd::image_feature_extractor.proj_layers.0.bias"])
    )
    cat_dim = (PROJ_DIM + 1 + 3) + 3 * (2 * N_HARM_RAY + 1)
    agg = {
        "first_sampled": _load(
            torch.nn.Linear(cat_dim, AGG_HIDDEN),
            "view_pooler.feature_aggregator._first_sampled.",
        ),
        "first_mean": _load(
            torch.nn.Linear(cat_dim, AGG_HIDDEN),
            "view_pooler.feature_aggregator._first_mean.",
        ),
        "mlp": _load(
            MLPWithInputSkips(
                n_layers=1, input_dim=AGG_HIDDEN, output_dim=AGG_HIDDEN,
                skip_dim=AGG_HIDDEN, hidden_dim=AGG_HIDDEN, input_skips=[],
            ),
            "view_pooler.feature_aggregator._mlp.",
        ),
        "last": _load(
            torch.nn.Linear(AGG_HIDDEN, AGG_OUT),
            "view_pooler.feature_aggregator._last.",
        ),
    }
    mapper = _load(torch.nn.Linear(AGG_OUT, C_VOX), "pooled_feature_mapper.")
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

    named = {}  # reference state_dict name -> torch Parameter
    for k, _ in resnet.named_parameters():
        named[f"image_feature_extractor.net.{k}"] = dict(
            resnet.named_parameters())[k]
    named["image_feature_extractor.proj_layers.0.weight"] = proj.weight
    named["image_feature_extractor.proj_layers.0.bias"] = proj.bias
    for name, mod in agg.items():
        pref = {"first_sampled": "_first_sampled", "first_mean": "_first_mean",
                "mlp": "_mlp", "last": "_last"}[name]
        for k, p in mod.named_parameters():
            named[f"view_pooler.feature_aggregator.{pref}.{k}"] = p
    for k, p in mapper.named_parameters():
        named[f"pooled_feature_mapper.{k}"] = p
    for k, p in unet.named_parameters():
        named[f"net_3d._net.{k}"] = p
    for k, p in rmlp.named_parameters():
        named[f"_implicit_functions.0._fn.render_mlp.{k}"] = p
    params = list(named.values())
    for p in params:
        p.requires_grad_(True)

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

    # ---- inputs: identical to the forward golden (stored there)
    img = GOLD["image_rgb"]
    fg = GOLD["fg_probability"]
    cams = {
        "R": torch.tensor(GOLD["cam_R"]), "T": torch.tensor(GOLD["cam_T"]),
        "focal": torch.tensor(GOLD["cam_focal"]),
        "pp": torch.tensor(GOLD["cam_pp"]),
    }
    fg_mask = torch.tensor((fg > 0.5).astype(np.float32))
    img_masked = torch.tensor(img) * fg_mask + (1.0 - fg_mask)

    # PRNG chain replicated exactly as in the forward generator
    rng = jax.random.PRNGKey(RNG_SEED)
    _rng_pool, rng_denoise, rng_render = jax.random.split(rng, 3)
    _t, rng_n, _t2, rng_n2, rng_b = jax.random.split(rng_denoise, 5)
    noise = np.asarray(jax.random.normal(rng_n, (1,) + (RESOL,) * 3 + (C_VOX,)))
    noise2 = np.asarray(jax.random.normal(rng_n2, (1,) + (RESOL,) * 3 + (C_VOX,)))
    take_boot = bool(jax.random.uniform(rng_b, ()) < 0.5)
    assert take_boot == bool(GOLD["train_take_boot"])
    rng_rays, _rng_render2 = jax.random.split(rng_render)
    camera = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]), T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    bundle_tr = sample_rays_from_mask(
        camera[:N_TRAIN_TARGETS],
        jnp.asarray(GOLD["mask_crop"][:N_TRAIN_TARGETS, ..., 0]),
        N_RAYS_TRAIN, N_PTS, rng_rays,
        (0.0, 0.0, 0.0), SCENE_EXTENT, stratified=False,
    )
    np.testing.assert_allclose(
        np.asarray(bundle_tr.xys), GOLD["train_xys"], atol=1e-6
    )

    # ---- grad-enabled TRAINING forward (mirror of the forward golden)
    mgr.EXTENT = VOX_EXTENT
    sub = slice(N_TRAIN_TARGETS, N_VIEWS)
    grid0 = torch_pool(
        {k: v[sub] for k, v in cams.items()},
        img_masked[sub], fg_mask[sub], resnet, proj, agg, mapper,
    )
    x0 = grid0[None].permute(0, 4, 1, 2, 3)
    t1 = torch.tensor([T_TRAIN[0]], dtype=torch.long)
    x_t = gd.q_sample(x0, t1, noise=torch.tensor(noise).permute(0, 4, 1, 2, 3))
    v = gd.p_mean_variance(
        model=unet, x=x_t, t=t1, clip_denoised=True, model_kwargs={}
    )["pred_xstart"]
    assert take_boot
    t2 = torch.tensor([T_TRAIN[1]], dtype=torch.long)
    x_t2 = gd.q_sample(v, t2, noise=torch.tensor(noise2).permute(0, 4, 1, 2, 3))
    v = gd.p_mean_variance(
        model=unet, x=x_t2, t=t2, clip_denoised=True, model_kwargs={}
    )["pred_xstart"]
    grid_tr = v.permute(0, 2, 3, 4, 1)[0]

    bt = {"origins": bundle_tr.origins, "directions": bundle_tr.directions,
          "lengths": bundle_tr.lengths}
    (img0_c, _, _), (img1_f, dep1_f, msk1_f) = (
        torch_render_two_pass_detached_refine(grid_tr, bt, rmlp)
    )
    gt_t = img_masked[:N_TRAIN_TARGETS]
    mse_f = torch_rgb_mse(img1_f, gt_t, bundle_tr.xys)
    mse_c = torch_rgb_mse(img0_c, gt_t, bundle_tr.xys)
    objective = mse_f + mse_c
    np.testing.assert_allclose(
        objective.detach().numpy(), GOLD["train_objective"], atol=1e-6,
        err_msg="backward generator's forward drifted from the forward golden",
    )
    objective.backward()

    out = {"objective": objective.detach().numpy()}
    n_nograd = 0
    for name, p in named.items():
        g = p.grad
        if g is None:
            g = torch.zeros_like(p)
            n_nograd += 1
        out[f"gd::{name}"] = g.detach().numpy().astype(np.float32)
    print(f"{len(named)} params, {n_nograd} without grad")

    # ---- one Adam step (reference optimizer_factory.py:137-150: torch Adam,
    # default betas (0.9, 0.999), eps 1e-8, lr from config = 5e-5)
    opt = torch.optim.Adam(params, lr=ADAM_LR)
    opt.step()
    for name, p in named.items():
        out[f"ps::{name}"] = p.detach().numpy().astype(np.float32)

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "holo_backward_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays -> holo_backward_goldens.npz")


if __name__ == "__main__":
    main()
