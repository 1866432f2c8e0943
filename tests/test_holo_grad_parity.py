"""TRAINING-DYNAMICS parity vs torch autograd (VERDICT r4 missing #2).

Forward pixel parity (test_holo_forward_parity.py) cannot pin subgradient
choices — the clip_denoised clamp boundaries, gradient flow through both
bootstrap passes, the refiner's weight detach, frozen-BN backward. This
test pins them:

  * `jax.grad` of `HoloDiffusionModel.__call__`'s objective wrt every
    parameter leaf == torch autograd of the composed reference chain
    (goldens from tests/make_goldens_holo_backward.py; reference backward
    at training_loop.py:533-556),
  * one optimizer step through the repo's optax factory == one torch
    Adam(5e-5) step (reference optimizer_factory.py:137-150).

Torch grads are mapped into the flax tree with the SAME import shim used
for weights (convert_holo_model_state_dict) — valid because every mapping
it performs is linear (transposes/reshapes/re-nesting), so gradients
transform identically to parameters. Unmapped leaves come out zero (the
base tree is zeros), which FAILS the comparison if the jax grad is nonzero
— mapping gaps cannot hide.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_holo_forward_parity import _model, GOLD  # noqa: E402

from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras  # noqa: E402
from holo_diffusion_tpu.utils.torch_import import (  # noqa: E402
    convert_holo_model_state_dict,
)

BGOLD = np.load(
    os.path.join(
        os.path.dirname(__file__), "goldens", "holo_backward_goldens.npz"
    )
)

_CONVERT_KW = dict(
    num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
    dnet_num_layers=4, rnet_num_layers=1,
    resnet_layers=(2, 2, 2, 2), resnet_stages=(1,),
)


def _convert(prefix, base_variables):
    """Map `<prefix>::name` golden arrays through the weight-import shim.
    Buffer entries the converter expects (BN running stats) are filled from
    the forward golden's sd:: arrays (they're ignored for params-tree
    comparisons but must exist for the converter to run)."""
    sd = {}
    for k in GOLD.files:
        if k.startswith("sd::"):
            name = k[4:]
            bk = f"{prefix}::{name}"
            sd[name] = (
                np.asarray(BGOLD[bk]) if bk in BGOLD.files
                else np.asarray(GOLD[k])
            )
    return convert_holo_model_state_dict(sd, base_variables, **_CONVERT_KW)


@pytest.fixture(scope="module")
def setup():
    model = _model()
    cams = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]),
        T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    base = model.init(
        jax.random.PRNGKey(0),
        camera=cams,
        image_rgb=jnp.asarray(GOLD["image_rgb"]),
        fg_probability=jnp.asarray(GOLD["fg_probability"]),
        mask_crop=jnp.asarray(GOLD["mask_crop"]),
        training=False,
        rng=None,
    )
    sd = {k[4:]: GOLD[k] for k in GOLD.files if k.startswith("sd::")}
    variables = convert_holo_model_state_dict(sd, base, **_CONVERT_KW)
    variables = dict(variables)
    params = variables.pop("params")

    def objective(p):
        preds = model.apply(
            {**variables, "params": p},
            camera=cams,
            image_rgb=jnp.asarray(GOLD["image_rgb"]),
            fg_probability=jnp.asarray(GOLD["fg_probability"]),
            mask_crop=jnp.asarray(GOLD["mask_crop"]),
            training=True,
            rng=jax.random.PRNGKey(127),
            timesteps=jnp.asarray(GOLD["train_timesteps"], jnp.int32),
        )
        return preds["objective"]

    grads = jax.grad(objective)(params)
    return params, variables, grads


def _leaves(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_grad_parity_every_leaf(setup):
    """d(objective)/d(theta) matches torch autograd on every param leaf."""
    params, variables, grads = setup
    zeros = jax.tree.map(jnp.zeros_like, {**variables, "params": params})
    torch_grads = _convert("gd", zeros)["params"]
    jx, tx = _leaves(grads), _leaves(torch_grads)
    assert set(jx) == set(tx)
    bad = []
    for name in sorted(jx):
        g_j, g_t = jx[name], tx[name]
        scale = float(np.abs(g_t).max())
        if scale == 0.0 and float(np.abs(g_j).max()) > 1e-7:
            bad.append(f"{name}: torch grad unmapped/zero but jax grad "
                       f"max {np.abs(g_j).max():.2e}")
            continue
        atol = max(2e-3 * scale, 1e-8)
        err = float(np.abs(g_j - g_t).max())
        if err > atol:
            bad.append(f"{name}: max|Δ|={err:.3e} vs atol={atol:.3e} "
                       f"(|g| scale {scale:.3e})")
    assert not bad, "gradient mismatches:\n" + "\n".join(bad)


def test_adam_step_parity(setup):
    """One optimizer step through the repo's factory (optax Adam, lr 5e-5)
    lands on the same parameters as torch.optim.Adam."""
    import optax

    from holo_diffusion_tpu.train.optimizer import make_optimizer

    params, variables, grads = setup
    tx = make_optimizer(breed="Adam", lr=5e-5)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    stepped = optax.apply_updates(params, updates)

    torch_stepped = _convert(
        "ps", {**variables, "params": params}
    )["params"]
    sx, tx_ = _leaves(stepped), _leaves(torch_stepped)
    px = _leaves(params)
    bad = []
    for name in sorted(sx):
        # compare the UPDATE (post - pre), not raw params: Adam's first-step
        # update is lr * g/(|g|+eps) — bounded by lr — and comparing updates
        # keeps the tolerance meaningful for large weights
        up_j = sx[name] - px[name]
        up_t = tx_[name] - px[name]
        # Adam's first-step update is lr * g/(|g|+eps): its sensitivity to a
        # grad perturbation dg is eps/(|g|+eps)^2 * dg, which blows up where
        # |g| approaches eps=1e-8. The grad-parity budget is ~2e-3 of the
        # LEAF's grad scale, so the update is well-conditioned only where
        # |g| >> sqrt(eps * scale); mask to 10x that boundary (there the
        # propagated update error is <= lr * 2e-5, far under the 0.5% gate).
        g = np.abs(_leaves_grad(name, grads))
        scale = float(g.max())
        mask = g > 10.0 * np.sqrt(1e-8 * max(scale, 1e-12))
        if not mask.any():
            continue
        err = float(np.abs((up_j - up_t))[mask].max())
        if err > 5e-3 * 5e-5:  # 0.5% of the lr-bounded update
            bad.append(f"{name}: max|Δupdate|={err:.3e}")
    assert not bad, "optimizer-step mismatches:\n" + "\n".join(bad)


def _leaves_grad(name, grads):
    return _leaves(grads)[name]
