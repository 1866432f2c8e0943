"""Utils tests: shaded depth, torchvision resnet import shim, profiling timer,
stats persistence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from holo_diffusion_tpu.geometry import PerspectiveCameras, look_at_view_transform
from holo_diffusion_tpu.utils.shaded_depth import (
    depth_to_shaded,
    make_depth_image,
    shaded_from_normals,
)


def _cam(dist=4.0):
    R, T = look_at_view_transform(dist=dist, elev=10.0, azim=30.0)
    return PerspectiveCameras(
        R=R, T=T, focal_length=jnp.full((1, 2), 2.0), principal_point=jnp.zeros((1, 2))
    )


def test_depth_to_shaded_flat_plane():
    """A frontoparallel plane shades ~uniform; background stays white."""
    H = W = 16
    depth = jnp.full((H, W), 3.0)
    mask = jnp.zeros((H, W)).at[4:12, 4:12].set(1.0)
    out = depth_to_shaded(depth, mask, _cam())
    assert out.shape == (H, W, 3)
    assert np.asarray(out[0, 0]).min() == 1.0  # bg
    inner = np.asarray(out[6:10, 6:10, 0])
    assert inner.std() < 0.05  # flat plane -> near-uniform shade
    assert 0.2 < inner.mean() <= 1.0


def test_shaded_from_normals():
    H = W = 8
    normals = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (H, W, 3))
    mask = jnp.ones((H, W))
    depth = jnp.full((H, W), 3.0)
    out = shaded_from_normals(normals, mask, _cam(), depth)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) > 0.2).all()


def test_make_depth_image():
    depth = jnp.linspace(1, 2, 64).reshape(8, 8)
    mask = jnp.ones((8, 8))
    img = make_depth_image(depth, mask)
    assert img.shape == (8, 8, 3)
    assert float(img.max()) <= 1.0 and float(img.min()) >= 0.0
    # nearest pixel brightest
    assert img[0, 0, 0] > img[-1, -1, 0]


def _fake_torchvision_resnet18_sd(rng):
    """Structurally faithful torchvision resnet18 (layers 2,2,2,2) state_dict
    up to layer2."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    for li, (blocks, width, in_w) in enumerate(
        [(2, 64, 64), (2, 128, 64)], start=1
    ):
        for bi in range(blocks):
            cin = in_w if bi == 0 else width
            base = f"layer{li}.{bi}"
            conv(f"{base}.conv1", width, cin, 3)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            if cin != width:
                conv(f"{base}.downsample.0", width, cin, 1)
                bn(f"{base}.downsample.1", width)
    return sd


def test_resnet_import_shim_matches_torch_stem():
    """Imported stem (conv1+bn1) must match torch functional ops exactly."""
    import torch
    import torch.nn.functional as F

    from holo_diffusion_tpu.models.feature_extractor import ResNetFeatureExtractor
    from holo_diffusion_tpu.utils.torch_import import (
        convert_resnet_state_dict,
        merge_params,
    )

    rng = np.random.RandomState(0)
    sd = _fake_torchvision_resnet18_sd(rng)
    fe = ResNetFeatureExtractor(
        name_arch="resnet18", stages=(1, 2), proj_dim=0, image_rescale=1.0,
        normalize_image=False, add_masks=False, add_images=False, l2_norm=False,
    )
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    variables = fe.init(jax.random.PRNGKey(0), jnp.asarray(x))
    imported = convert_resnet_state_dict(sd, layers=(2, 2, 2, 2), stages=(1, 2))
    variables = merge_params(
        jax.tree.map(np.asarray, jax.device_get(variables)), imported
    )
    out = fe.apply(variables, jnp.asarray(x))

    # torch reference for the full stem + layer1 block 0
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    h = F.conv2d(xt, torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
    h = F.batch_norm(
        h,
        torch.tensor(sd["bn1.running_mean"]),
        torch.tensor(sd["bn1.running_var"]),
        torch.tensor(sd["bn1.weight"]),
        torch.tensor(sd["bn1.bias"]),
        training=False,
        eps=1e-5,
    ).relu()
    h = F.max_pool2d(h, 3, 2, padding=1)

    def torch_block(h, base, stride=1):
        idn = h
        y = F.conv2d(h, torch.tensor(sd[f"{base}.conv1.weight"]), stride=stride, padding=1)
        y = F.batch_norm(
            y,
            torch.tensor(sd[f"{base}.bn1.running_mean"]),
            torch.tensor(sd[f"{base}.bn1.running_var"]),
            torch.tensor(sd[f"{base}.bn1.weight"]),
            torch.tensor(sd[f"{base}.bn1.bias"]),
            training=False, eps=1e-5,
        ).relu()
        y = F.conv2d(y, torch.tensor(sd[f"{base}.conv2.weight"]), padding=1)
        y = F.batch_norm(
            y,
            torch.tensor(sd[f"{base}.bn2.running_mean"]),
            torch.tensor(sd[f"{base}.bn2.running_var"]),
            torch.tensor(sd[f"{base}.bn2.weight"]),
            torch.tensor(sd[f"{base}.bn2.bias"]),
            training=False, eps=1e-5,
        )
        if f"{base}.downsample.0.weight" in sd:
            idn = F.conv2d(idn, torch.tensor(sd[f"{base}.downsample.0.weight"]), stride=stride)
            idn = F.batch_norm(
                idn,
                torch.tensor(sd[f"{base}.downsample.1.running_mean"]),
                torch.tensor(sd[f"{base}.downsample.1.running_var"]),
                torch.tensor(sd[f"{base}.downsample.1.weight"]),
                torch.tensor(sd[f"{base}.downsample.1.bias"]),
                training=False, eps=1e-5,
            )
        return (y + idn).relu()

    h = torch_block(h, "layer1.0")
    h = torch_block(h, "layer1.1")
    ref1 = np.transpose(h.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out["res_layer_1"]), ref1, atol=2e-5)

    h = torch_block(h, "layer2.0", stride=2)
    h = torch_block(h, "layer2.1")
    ref2 = np.transpose(h.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out["res_layer_2"]), ref2, atol=2e-5)


def test_timer_and_stats():
    from holo_diffusion_tpu.train.stats import Stats
    from holo_diffusion_tpu.utils.profiling import Timer

    Timer.reset()
    with Timer("x"):
        pass
    assert "x" in Timer.averages()

    st = Stats()
    st.new_epoch()
    st.update({"objective": 1.0, "loss_rgb_mse": 0.5})
    st.update({"objective": 3.0, "loss_rgb_mse": 0.7})
    avg = st.averages()
    assert avg["objective"] == 2.0
    st.finalize_epoch()
    assert st.history[0]["train"]["loss_rgb_mse"] == pytest.approx(0.6)


def test_dashboard_html(tmp_path):
    from holo_diffusion_tpu.train.stats import Stats
    from holo_diffusion_tpu.utils.vis import write_dashboard_html

    st = Stats()
    for e in range(3):
        st.new_epoch()
        st.update({"objective": 1.0 / (e + 1), "loss_rgb_psnr": 10.0 + e}, "train")
        st.update({"loss_rgb_psnr": 9.0 + e}, "val")
        st.finalize_epoch()
    path = write_dashboard_html(st, str(tmp_path))
    html = open(path).read()
    assert "loss_rgb_psnr" in html and "objective" in html
    assert "polyline" in html  # charts rendered client-side from the payload


def test_denoising_video(tmp_path):
    import jax

    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.utils.vis import denoising_video

    model = HoloDiffusionModel(
        resol=4, feature_size=8, view_pooler_enabled=False,
        n_pts_per_ray_evaluation=4, n_pts_per_ray_fine_evaluation=2,
        render_image_height=8, render_image_width=8,
        net_3d_args=dict(model_channels=32, num_res_blocks=1, channel_mult=(1,),
                         attention_resolutions=(), use_remat=False),
        diffusion_args=dict(num_steps=6, beta_start_unscaled=6e-7,
                            beta_end_unscaled=1.2e-4),
        render_mlp_args=dict(dnet_hidden_dim=8, rnet_hidden_dim=8),
    )
    scene = make_synthetic_scene(n_views=1, image_size=8, seed=0)
    x = jax.numpy.zeros((1, 4, 4, 4, 8))
    variables = model.init(
        jax.random.PRNGKey(0), camera=scene.camera[:1], voxel_features=x,
        training=False, rng=jax.random.PRNGKey(1),
    )
    path = denoising_video(
        model, variables, str(tmp_path / "denoise.mp4"),
        scene.camera[:1], jax.random.PRNGKey(1), steps_per_frame=2,
    )
    import os
    assert path is not None and os.path.exists(path)
