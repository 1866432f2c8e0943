"""LPIPS + windowed SSIM: architecture/conversion goldens vs torch.

The JAX LPIPS (models/lpips.py) must match a torch-side forward of the SAME
random weights exactly, so that loading the published VGG16/LPIPS checkpoints
yields the standard metric (the reference's calc_lpips_loss surface,
unet_with_no_diffusion.yaml:183-185)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from holo_diffusion_tpu.evaluation import ssim  # noqa: E402
from holo_diffusion_tpu.models.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    LPIPS,
    VGG16_CHANNELS,
    lpips_params_from_torch,
    make_lpips_fn,
)


def _torch_vgg16_features():
    """torchvision-layout vgg16 features stack with random weights."""
    layers = []
    in_ch = 3
    for spec in VGG16_CHANNELS:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, spec, 3, padding=1))
            layers.append(torch.nn.ReLU())
            in_ch = spec
    return torch.nn.Sequential(*layers)


def _torch_lpips(feats, lins, a, b):
    """Reference LPIPS forward in torch (lpips v0.1 'vgg' formulation)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def prep(x):
        x = 2.0 * x - 1.0
        return (x - shift) / scale

    def forward_taps2(x):
        out = []
        conv_i = -1
        for layer in feats:
            x = layer(x)
            if isinstance(layer, torch.nn.Conv2d):
                conv_i += 1
            if isinstance(layer, torch.nn.ReLU) and conv_i in (1, 3, 6, 9, 12):
                out.append(x)
        return out

    ta = forward_taps2(prep(a))
    tb = forward_taps2(prep(b))
    total = 0.0
    for fa, fb, w in zip(ta, tb, lins):
        na = fa / torch.sqrt((fa**2).sum(1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt((fb**2).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        dist = (d * w.abs().view(1, -1, 1, 1)).sum(1)
        total = total + dist.mean(dim=(1, 2))
    return total


def test_lpips_matches_torch_golden():
    torch.manual_seed(0)
    feats = _torch_vgg16_features()
    with torch.no_grad():
        for m in feats:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.2)  # keep activations sane with random weights
    lins = [torch.rand(c) for c in (64, 128, 256, 512, 512)]

    rng = np.random.RandomState(1)
    a = rng.rand(1, 3, 64, 64).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(1, 3, 64, 64).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = _torch_lpips(
            feats, lins, torch.from_numpy(a), torch.from_numpy(b)
        ).numpy()

    sd = {k: v.numpy() for k, v in feats.state_dict().items()}
    variables = lpips_params_from_torch(sd, [l.numpy() for l in lins])
    model = LPIPS()
    got = model.apply(
        variables,
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)

    # identical images -> 0
    zero = model.apply(
        variables,
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(a.transpose(0, 2, 3, 1)),
    )
    assert float(zero[0]) < 1e-6


def test_lpips_fn_in_evaluation():
    """The evaluator accepts an LPIPS perceptual_fn and reports non-null
    lpips on a synthetic fixture."""
    import jax

    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.evaluation import evaluate_new_view_synthesis
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel

    model = HoloDiffusionModel(
        resol=4, feature_size=16, net_3d_enabled=False, diffusion_enabled=False,
        n_pts_per_ray_evaluation=8, n_pts_per_ray_fine_evaluation=4,
        render_image_height=16, render_image_width=16,
        image_feature_extractor_args=dict(
            name_arch="resnet18", stages=(1,), proj_dim=4, image_rescale=0.5
        ),
        render_mlp_args=dict(dnet_hidden_dim=16, rnet_hidden_dim=8),
    )
    scene = make_synthetic_scene(n_views=4, image_size=16, seed=0)
    variables = model.init(
        jax.random.PRNGKey(0), camera=scene.camera, image_rgb=scene.image_rgb,
        fg_probability=scene.fg_probability, mask_crop=scene.mask_crop,
        training=False, rng=jax.random.PRNGKey(1),
    )

    lpips_model = LPIPS()
    lp_vars = lpips_model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3))
    )
    fn = make_lpips_fn(lp_vars)
    res = evaluate_new_view_synthesis(
        model, variables, [scene], n_source_views=3,
        n_eval_targets_per_seq=1, perceptual_fn=fn,
    )
    assert res["records"][0]["lpips"] is not None
    assert np.isfinite(res["records"][0]["lpips"])


def test_windowed_ssim_properties():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(a + 0.2 * rng.randn(32, 32, 3), 0, 1)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.9
    # less noise -> higher ssim (windowed metric is monotone here)
    s2 = ssim(a, np.clip(a + 0.05 * rng.randn(32, 32, 3), 0, 1))
    assert s2 > s


def test_windowed_ssim_matches_skimage_formula():
    """Cross-check against an independent direct (non-separable) computation
    of the same Wang et al. protocol."""
    rng = np.random.RandomState(3)
    a = rng.rand(24, 24, 1)
    b = np.clip(a + 0.1 * rng.randn(24, 24, 1), 0, 1)

    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = g / g.sum()
    K = np.outer(g, g)

    def conv_valid(img):
        H, W = img.shape
        out = np.zeros((H - 10, W - 10))
        for i in range(H - 10):
            for j in range(W - 10):
                out[i, j] = (img[i:i + 11, j:j + 11] * K).sum()
        return out

    x, y = a[..., 0], b[..., 0]
    mu_x, mu_y = conv_valid(x), conv_valid(y)
    sx = conv_valid(x * x) - mu_x**2
    sy = conv_valid(y * y) - mu_y**2
    sxy = conv_valid(x * y) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    ref = (
        ((2 * mu_x * mu_y + C1) * (2 * sxy + C2))
        / ((mu_x**2 + mu_y**2 + C1) * (sx + sy + C2))
    ).mean()
    assert ssim(a, b) == pytest.approx(ref, abs=1e-10)
