"""UNet3D parity vs the reference guided_diffusion UNetModel (golden fixtures
from tests/make_goldens_unet.py) — validates both the flax architecture and
the torch-weight import shim."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.models.unet3d import UNetModel3D, timestep_embedding
from holo_diffusion_tpu.utils.torch_import import convert_unet_state_dict

GOLD = np.load(os.path.join(os.path.dirname(__file__), "goldens", "unet_goldens.npz"))


def test_timestep_embedding_matches_reference():
    gold = np.load(
        os.path.join(os.path.dirname(__file__), "goldens", "diffusion_goldens.npz")
    )
    t = jnp.asarray(gold["temb_t"])
    np.testing.assert_allclose(
        timestep_embedding(t, 256), gold["temb_256"], atol=1e-4
    )
    np.testing.assert_allclose(timestep_embedding(t, 64), gold["temb_64"], atol=1e-5)


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetModel3D(
        in_channels=16,
        model_channels=32,
        out_channels=16,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        num_heads=2,
        use_scale_shift_norm=True,
        zero_last_conv=False,
        homogeneous_resample=True,
        use_remat=False,
        dtype=jnp.float32,
    )
    sd = {k[4:]: GOLD[k] for k in GOLD.files if k.startswith("sd::")}
    params = convert_unet_state_dict(
        sd, num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,)
    )
    return model, params


def test_unet_forward_matches_torch(unet_and_params):
    model, params = unet_and_params
    x = jnp.asarray(np.moveaxis(GOLD["unet_x"], 1, -1))  # NCDHW -> NDHWC
    t = jnp.asarray(GOLD["unet_t"])
    y = model.apply(params, x, t)
    y_ref = np.moveaxis(GOLD["unet_y"], 1, -1)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4, rtol=1e-3)


def test_unet_param_count_matches(unet_and_params):
    model, params = unet_and_params
    x = jnp.zeros((1, 8, 8, 8, 16))
    t = jnp.zeros((1,), jnp.int32)
    init_params = model.init(jax.random.PRNGKey(0), x, t)
    n_init = sum(p.size for p in jax.tree.leaves(init_params))
    n_conv = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    assert n_init == n_conv
    # identical tree structure
    assert jax.tree.structure(jax.tree.map(np.shape, init_params)) == jax.tree.structure(
        jax.tree.map(np.shape, params)
    )


def test_unet_gradients_finite(unet_and_params):
    model, params = unet_and_params
    x = jnp.asarray(np.moveaxis(GOLD["unet_x"], 1, -1))
    t = jnp.asarray(GOLD["unet_t"])

    def loss(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(jax.tree.map(jnp.asarray, params))
    leaves = jax.tree.leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(jnp.abs(l).max() > 0 for l in leaves)


def test_unet_remat_matches_no_remat(unet_and_params):
    model, params = unet_and_params
    model_remat = model.clone(use_remat=True)
    x = jnp.asarray(np.moveaxis(GOLD["unet_x"], 1, -1))
    t = jnp.asarray(GOLD["unet_t"])
    y0 = model.apply(params, x, t)
    y1 = model_remat.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_unet_hydrant_config_shapes():
    """The release config (hydrant.yaml:224-245) at reduced feature size."""
    model = UNetModel3D(
        in_channels=8,
        model_channels=32,
        out_channels=8,
        num_res_blocks=2,
        attention_resolutions=(4, 8),
        channel_mult=(1, 1, 2, 4, 8),
        num_heads=2,
        use_remat=False,
    )
    x = jnp.zeros((1, 16, 16, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == (1, 16, 16, 16, 8)
