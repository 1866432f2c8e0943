"""Generate golden fixtures by *running* the reference guided_diffusion code
(torch CPU) at /root/reference. Run once offline:

    python tests/make_goldens_diffusion.py

The resulting .npz files are committed; tests compare our JAX implementation
against them and never import the reference at test time.
"""
import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "goldens")


def main():
    sys.path.insert(0, REF)
    from holo_diffusion.guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion,
        ModelMeanType,
        ModelVarType,
        LossType,
        get_named_beta_schedule,
    )
    from holo_diffusion.guided_diffusion.nn import timestep_embedding

    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    out = {}

    # --- schedules
    for name, T in [("linear", 1000), ("linear", 100), ("cosine", 1000)]:
        betas = get_named_beta_schedule(name, T, 0.0001, 0.02)
        out[f"betas_{name}_{T}"] = betas

    # --- schedule-derived arrays + q/p math on the hydrant config (T=1000 linear)
    betas = get_named_beta_schedule("linear", 1000, 0.0001, 0.02)
    gd = GaussianDiffusion(
        betas=betas,
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )
    for k in [
        "alphas_cumprod",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        out[f"sched_{k}"] = getattr(gd, k)

    # --- q_sample / q_posterior on fixed inputs
    x0 = torch.tensor(rng.randn(2, 4, 3, 3, 3), dtype=torch.float32)
    noise = torch.tensor(rng.randn(2, 4, 3, 3, 3), dtype=torch.float32)
    t = torch.tensor([17, 941], dtype=torch.long)
    out["q_x0"] = x0.numpy()
    out["q_noise"] = noise.numpy()
    out["q_t"] = t.numpy()
    x_t = gd.q_sample(x0, t, noise=noise)
    out["q_sample"] = x_t.numpy()
    pm, pv, plv = gd.q_posterior_mean_variance(x0, x_t, t)
    out["q_post_mean"] = pm.numpy()
    out["q_post_logvar"] = plv.numpy()

    # --- p_mean_variance with a deterministic toy "model" (START_X)
    def toy_model(x, tt, **kw):
        return torch.tanh(x * 0.5 + tt.float().view(-1, 1, 1, 1, 1) / 1000.0)

    pmv = gd.p_mean_variance(toy_model, x_t, t, clip_denoised=True)
    out["pmv_mean"] = pmv["mean"].numpy()
    out["pmv_logvar"] = pmv["log_variance"].numpy()
    out["pmv_pred_xstart"] = pmv["pred_xstart"].numpy()

    # EPSILON-mean-type variant
    gd_eps = GaussianDiffusion(
        betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_LARGE,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )
    pmv2 = gd_eps.p_mean_variance(toy_model, x_t, t, clip_denoised=True)
    out["pmv_eps_mean"] = pmv2["mean"].numpy()
    out["pmv_eps_logvar"] = pmv2["log_variance"].numpy()
    out["pmv_eps_pred_xstart"] = pmv2["pred_xstart"].numpy()

    # --- ddim deterministic step
    dd = gd.ddim_sample(toy_model, x_t, t, clip_denoised=True, eta=0.0)
    out["ddim_sample"] = dd["sample"].numpy()

    # --- timestep embedding
    tt = torch.tensor([0, 1, 17, 500, 999], dtype=torch.long)
    out["temb_t"] = tt.numpy()
    out["temb_256"] = timestep_embedding(tt, 256).numpy()
    out["temb_64"] = timestep_embedding(tt, 64).numpy()

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "diffusion_goldens.npz"), **out)
    print(f"wrote {len(out)} arrays")


if __name__ == "__main__":
    main()
