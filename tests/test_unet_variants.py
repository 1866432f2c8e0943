"""Tests for the dims-generalized UNet + variant models (SuperRes, EncoderUNet,
AttentionPool, class conditioning)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from holo_diffusion_tpu.models.unet3d import UNetModel3D
from holo_diffusion_tpu.models.unet_variants import (
    AttentionPool2d,
    EncoderUNetModel,
    SuperResModel,
)


def test_unet_2d_mode():
    model = UNetModel3D(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), dims=2,
        use_remat=False,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == (2, 16, 16, 3)


def test_unet_1d_mode():
    model = UNetModel3D(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(), dims=1, use_remat=False,
    )
    x = jnp.zeros((2, 32, 4))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    assert model.apply(params, x, t).shape == (2, 32, 4)


def test_unet_class_conditional():
    model = UNetModel3D(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1,), attention_resolutions=(), dims=2, num_classes=5,
        use_remat=False,
    )
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.array([0, 3])
    params = model.init(jax.random.PRNGKey(0), x, t, y=y)
    out0 = model.apply(params, x, t, y=jnp.array([0, 0]))
    out3 = model.apply(params, x, t, y=jnp.array([3, 3]))
    assert out0.shape == (2, 8, 8, 3)
    assert float(jnp.abs(out0 - out3).max()) > 0  # label changes output


def test_super_res_model():
    unet = UNetModel3D(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(), dims=2, use_remat=False,
    )
    model = SuperResModel(unet=unet)
    x = jnp.zeros((1, 16, 16, 3))
    low = jnp.ones((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, low)
    assert model.apply(params, x, t, low).shape == (1, 16, 16, 3)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial"])
def test_encoder_unet_pools(pool):
    model = EncoderUNetModel(
        in_channels=3, model_channels=32, out_channels=10, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), pool=pool, dims=2,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 10)


def test_attention_pool():
    m = AttentionPool2d(embed_dim=32, num_heads=2, output_dim=7)
    x = jnp.ones((3, 4, 4, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (3, 7)


def test_resblock_gigagan():
    from holo_diffusion_tpu.models.unet_gigagan import ResBlockGigaGAN

    m = ResBlockGigaGAN(out_channels=64, dims=2)
    x = jnp.ones((1, 8, 8, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 8, 8, 64)
    m_down = ResBlockGigaGAN(out_channels=32, dims=2, down=True)
    p2 = m_down.init(jax.random.PRNGKey(0), x)
    assert m_down.apply(p2, x).shape == (1, 4, 4, 32)


def test_local_attention_window():
    from holo_diffusion_tpu.models.unet_gigagan import QKVLocalAttention

    m = QKVLocalAttention(num_heads=2, window=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    # zero-init proj -> residual identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_asymmetric_unet():
    from holo_diffusion_tpu.models.unet_gigagan import AsymmetricUNetModel

    m = AsymmetricUNetModel(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,),
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 16, 16, 3)
