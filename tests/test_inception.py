"""FID InceptionV3 parity: the flax/NHWC implementation + torch-layout weight
converter vs an independent torch functional forward of the same architecture
(pytorch-fid's FID-patched inception_v3), with random weights. Exercises every
block type, the count_include_pad=False avg pools, Mixed_7c's max-pool patch,
the 299x299 bilinear resize, and the [-1,1] input scaling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from holo_diffusion_tpu.models.inception import (
    FIDInceptionV3,
    inception_params_from_torch,
)


def _rand_sd(rng):
    """torch-layout random state_dict for the FID inception feature path."""
    sd = {}

    def cell(name, cin, cout, kh, kw):
        fan_in = cin * kh * kw
        sd[f"{name}.conv.weight"] = rng.normal(
            0, (2.0 / fan_in) ** 0.5, (cout, cin, kh, kw)
        ).astype(np.float32)
        sd[f"{name}.bn.weight"] = rng.uniform(0.9, 1.1, cout).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = rng.normal(0, 0.05, cout).astype(
            np.float32
        )
        sd[f"{name}.bn.running_var"] = rng.uniform(0.8, 1.2, cout).astype(
            np.float32
        )
        return cout

    cell("Conv2d_1a_3x3", 3, 32, 3, 3)
    cell("Conv2d_2a_3x3", 32, 32, 3, 3)
    cell("Conv2d_2b_3x3", 32, 64, 3, 3)
    cell("Conv2d_3b_1x1", 64, 80, 1, 1)
    cell("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(name, cin, pool):
        cell(f"{name}.branch1x1", cin, 64, 1, 1)
        cell(f"{name}.branch5x5_1", cin, 48, 1, 1)
        cell(f"{name}.branch5x5_2", 48, 64, 5, 5)
        cell(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        cell(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        cell(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        cell(f"{name}.branch_pool", cin, pool, 1, 1)
        return 64 + 64 + 96 + pool

    def block_b(name, cin):
        cell(f"{name}.branch3x3", cin, 384, 3, 3)
        cell(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        cell(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        cell(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        return 384 + 96 + cin

    def block_c(name, cin, c7):
        cell(f"{name}.branch1x1", cin, 192, 1, 1)
        cell(f"{name}.branch7x7_1", cin, c7, 1, 1)
        cell(f"{name}.branch7x7_2", c7, c7, 1, 7)
        cell(f"{name}.branch7x7_3", c7, 192, 7, 1)
        cell(f"{name}.branch7x7dbl_1", cin, c7, 1, 1)
        cell(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        cell(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        cell(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        cell(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        cell(f"{name}.branch_pool", cin, 192, 1, 1)
        return 768

    def block_d(name, cin):
        cell(f"{name}.branch3x3_1", cin, 192, 1, 1)
        cell(f"{name}.branch3x3_2", 192, 320, 3, 3)
        cell(f"{name}.branch7x7x3_1", cin, 192, 1, 1)
        cell(f"{name}.branch7x7x3_2", 192, 192, 1, 7)
        cell(f"{name}.branch7x7x3_3", 192, 192, 7, 1)
        cell(f"{name}.branch7x7x3_4", 192, 192, 3, 3)
        return 320 + 192 + cin

    def block_e(name, cin):
        cell(f"{name}.branch1x1", cin, 320, 1, 1)
        cell(f"{name}.branch3x3_1", cin, 384, 1, 1)
        cell(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        cell(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        cell(f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        cell(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        cell(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        cell(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        cell(f"{name}.branch_pool", cin, 192, 1, 1)
        return 2048

    c = block_a("Mixed_5b", 192, 32)
    c = block_a("Mixed_5c", c, 64)
    c = block_a("Mixed_5d", c, 64)
    c = block_b("Mixed_6a", c)
    c = block_c("Mixed_6b", c, 128)
    c = block_c("Mixed_6c", c, 160)
    c = block_c("Mixed_6d", c, 160)
    c = block_c("Mixed_6e", c, 192)
    c = block_d("Mixed_7a", c)
    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    # feature path ignores these — converter must skip them
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    return sd


# ---- torch functional mirror (independent of the flax code) ---------------


def _tcell(sd, p, x, stride=1, padding=0):
    x = F.conv2d(x, torch.from_numpy(sd[f"{p}.conv.weight"]), None, stride,
                 padding)
    x = F.batch_norm(
        x,
        torch.from_numpy(sd[f"{p}.bn.running_mean"]),
        torch.from_numpy(sd[f"{p}.bn.running_var"]),
        torch.from_numpy(sd[f"{p}.bn.weight"]),
        torch.from_numpy(sd[f"{p}.bn.bias"]),
        False, 0.0, 1e-3,
    )
    return F.relu(x)


def _avg(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


def _t_block_a(sd, n, x):
    b1 = _tcell(sd, f"{n}.branch1x1", x)
    b5 = _tcell(sd, f"{n}.branch5x5_2", _tcell(sd, f"{n}.branch5x5_1", x),
                padding=2)
    bd = _tcell(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tcell(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _tcell(sd, f"{n}.branch3x3dbl_3", bd, padding=1)
    bp = _tcell(sd, f"{n}.branch_pool", _avg(x))
    return torch.cat([b1, b5, bd, bp], 1)


def _t_block_b(sd, n, x):
    b3 = _tcell(sd, f"{n}.branch3x3", x, stride=2)
    bd = _tcell(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tcell(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _tcell(sd, f"{n}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _t_block_c(sd, n, x):
    b1 = _tcell(sd, f"{n}.branch1x1", x)
    b7 = _tcell(sd, f"{n}.branch7x7_1", x)
    b7 = _tcell(sd, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = _tcell(sd, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = _tcell(sd, f"{n}.branch7x7dbl_1", x)
    bd = _tcell(sd, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _tcell(sd, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _tcell(sd, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _tcell(sd, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _tcell(sd, f"{n}.branch_pool", _avg(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _t_block_d(sd, n, x):
    b3 = _tcell(sd, f"{n}.branch3x3_2",
                _tcell(sd, f"{n}.branch3x3_1", x), stride=2)
    b7 = _tcell(sd, f"{n}.branch7x7x3_1", x)
    b7 = _tcell(sd, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _tcell(sd, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _tcell(sd, f"{n}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _t_block_e(sd, n, x, use_max_pool=False):
    b1 = _tcell(sd, f"{n}.branch1x1", x)
    b3 = _tcell(sd, f"{n}.branch3x3_1", x)
    b3 = torch.cat(
        [
            _tcell(sd, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
            _tcell(sd, f"{n}.branch3x3_2b", b3, padding=(1, 0)),
        ],
        1,
    )
    bd = _tcell(sd, f"{n}.branch3x3dbl_1", x)
    bd = _tcell(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat(
        [
            _tcell(sd, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _tcell(sd, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0)),
        ],
        1,
    )
    pooled = (
        F.max_pool2d(x, 3, 1, 1) if use_max_pool else _avg(x)
    )
    bp = _tcell(sd, f"{n}.branch_pool", pooled)
    return torch.cat([b1, b3, bd, bp], 1)


def _torch_forward(sd, x_nchw):
    x = F.interpolate(x_nchw, size=(299, 299), mode="bilinear",
                      align_corners=False)
    x = 2.0 * x - 1.0
    x = _tcell(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _tcell(sd, "Conv2d_2a_3x3", x)
    x = _tcell(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _tcell(sd, "Conv2d_3b_1x1", x)
    x = _tcell(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _t_block_a(sd, n, x)
    x = _t_block_b(sd, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _t_block_c(sd, n, x)
    x = _t_block_d(sd, "Mixed_7a", x)
    x = _t_block_e(sd, "Mixed_7b", x)
    x = _t_block_e(sd, "Mixed_7c", x, use_max_pool=True)
    return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_fid_inception_matches_torch_functional():
    rng = np.random.RandomState(0)
    sd = _rand_sd(rng)
    variables = inception_params_from_torch(sd)

    img = rng.uniform(0, 1, (2, 96, 80, 3)).astype(np.float32)
    model = FIDInceptionV3()
    feats = model.apply(variables, jnp.asarray(img))
    assert feats.shape == (2, 2048)

    with torch.no_grad():
        ref = _torch_forward(
            sd, torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy()

    # 94 convs deep; f32 accumulation-order differences compound
    np.testing.assert_allclose(np.asarray(feats), ref, atol=2e-3, rtol=2e-3)


def test_avg_pool_nopad_matches_torch():
    from holo_diffusion_tpu.models.inception import _avg_pool_3x3_s1_nopad

    rng = np.random.RandomState(1)
    x = rng.normal(size=(1, 7, 9, 4)).astype(np.float32)
    ours = _avg_pool_3x3_s1_nopad(jnp.asarray(x))
    with torch.no_grad():
        ref = F.avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 1, 1,
            count_include_pad=False,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
