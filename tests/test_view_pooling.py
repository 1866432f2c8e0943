"""View pooling tests: feature extractor shapes, view sampler geometry,
both aggregators, and unconditional sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.geometry import PerspectiveCameras, look_at_view_transform
from holo_diffusion_tpu.models.feature_extractor import ResNetFeatureExtractor
from holo_diffusion_tpu.models.view_pooler import (
    AngleWeightedReductionFeatureAggregator,
    MLPMeanFeatureAggregator,
    ViewPooler,
    point_to_camera_ray_dirs,
    sample_view_features,
)


def _cams(n=3, dist=4.0):
    R, T = look_at_view_transform(
        dist=dist, elev=jnp.linspace(-20, 40, n), azim=jnp.linspace(0, 240, n)
    )
    return PerspectiveCameras(
        R=R, T=T, focal_length=jnp.full((n, 2), 2.0), principal_point=jnp.zeros((n, 2))
    )


def test_feature_extractor_output_keys_and_shapes():
    fe = ResNetFeatureExtractor(
        name_arch="resnet18", stages=(1, 2), proj_dim=8, image_rescale=0.5
    )
    imgs = jnp.ones((2, 32, 32, 3)) * 0.5
    masks = jnp.ones((2, 32, 32, 1))
    vars_ = fe.init(jax.random.PRNGKey(0), imgs, masks)
    out = fe.apply(vars_, imgs, masks)
    assert set(out.keys()) == {"images", "masks", "res_layer_1", "res_layer_2"}
    # rescale 0.5 -> 16, stem /2 -> 8, maxpool /2 -> 4 (layer1), /2 -> 2 (layer2)
    assert out["res_layer_1"].shape == (2, 4, 4, 8)
    assert out["res_layer_2"].shape == (2, 2, 2, 8)
    # l2 normalized
    norms = jnp.linalg.norm(out["res_layer_1"], axis=-1)
    assert (norms <= 1.0 + 1e-4).all()
    assert fe.get_feat_dims() == 2 * 8 + 1 + 3


def test_view_sampler_projects_center_point():
    """The look-at target (origin) projects to the image center in all views:
    sampled feature == the center pixel value."""
    cams = _cams(3)
    H = W = 9
    fmap = jnp.zeros((3, H, W, 3)).at[:, 4, 4, :].set(jnp.arange(3.0))
    feats, masks = sample_view_features(
        {"f": fmap}, cams, jnp.zeros((1, 3))
    )
    np.testing.assert_allclose(
        np.asarray(feats[:, 0]), np.broadcast_to([0.0, 1.0, 2.0], (3, 3)), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(masks), 1.0)


def test_view_sampler_behind_camera_masked():
    cams = _cams(2, dist=2.0)
    # a point far behind all cameras relative to look dir
    from holo_diffusion_tpu.geometry.cameras import camera_centers

    centers = camera_centers(cams)
    behind = centers[0] * 3.0  # beyond the first camera, away from origin
    feats, masks = sample_view_features(
        {"f": jnp.ones((2, 8, 8, 2))}, cams, behind[None]
    )
    assert float(masks[0, 0, 0]) == 0.0  # behind first camera


def test_angle_weighted_aggregator_prefers_near_views():
    agg = AngleWeightedReductionFeatureAggregator()
    cams = _cams(3)
    pts = jnp.zeros((4, 3))
    feats = jnp.stack(
        [jnp.full((4, 2), 1.0), jnp.full((4, 2), 2.0), jnp.full((4, 2), 3.0)]
    )
    masks = jnp.ones((3, 4, 1))
    out = agg.apply({}, feats, masks, cams, pts)
    assert out.shape == (4, 4)  # AVG + STD of 2 dims
    # view 0 is the reference -> highest weight -> mean biased toward 1.0
    assert float(out[0, 0]) < 2.0


def test_mlp_mean_aggregator_shapes_and_grad():
    agg = MLPMeanFeatureAggregator(n_hidden=16, dim_out=24)
    cams = _cams(3)
    pts = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 7))
    masks = jnp.ones((3, 5, 1))
    params = agg.init(jax.random.PRNGKey(2), feats, masks, cams, pts)
    out = agg.apply(params, feats, masks, cams, pts)
    assert out.shape == (5, 24)

    def loss(p):
        return jnp.sum(agg.apply(p, feats, masks, cams, pts) ** 2)

    g = jax.grad(loss)(params)
    assert all(jnp.isfinite(x).all() for x in jax.tree.leaves(g))
    assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g))


def test_view_pooler_mlp_mean_end_to_end():
    vp = ViewPooler(
        aggregator_class_type="MLPMeanFeatureAggregator",
        aggregator_args=dict(n_hidden=16, dim_out=12),
    )
    cams = _cams(2)
    feats = {"a": jnp.ones((2, 6, 6, 4)), "b": jnp.ones((2, 3, 3, 2))}
    pts = jax.random.uniform(jax.random.PRNGKey(0), (10, 3), minval=-0.5, maxval=0.5)
    params = vp.init(jax.random.PRNGKey(1), feats, cams, pts)
    out = vp.apply(params, feats, cams, pts)
    assert out.shape == (10, 12)
    assert vp.get_aggregated_feature_dim(6) == 12


def test_point_to_camera_ray_dirs_unit_and_direction():
    cams = _cams(2)
    from holo_diffusion_tpu.geometry.cameras import camera_centers

    pts = jnp.array([[0.0, 0.0, 0.0]])
    dirs = point_to_camera_ray_dirs(cams, pts)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5)
    centers = np.asarray(camera_centers(cams))
    expected = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(dirs[:, 0]), expected, atol=1e-5)


def test_unconditional_sampling_tiny():
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.sampling import (
        sample_random_voxel_features,
        sample_random_voxel_features_progressive,
    )

    model = HoloDiffusionModel(
        resol=4,
        feature_size=32,
        view_pooler_enabled=False,
        net_3d_args=dict(
            model_channels=32, num_res_blocks=1, channel_mult=(1,),
            attention_resolutions=(), use_remat=False,
        ),
        diffusion_args=dict(num_steps=6, beta_start_unscaled=2e-5, beta_end_unscaled=4e-3),
    )
    v = jnp.zeros((1, 4, 4, 4, 32))
    params = model.init(
        jax.random.PRNGKey(0), v, jnp.zeros((1,), jnp.int32),
        method=HoloDiffusionModel.apply_net_3d,
    )
    x = sample_random_voxel_features(model, params, jax.random.PRNGKey(1))
    assert x.shape == (1, 4, 4, 4, 32)
    assert (jnp.abs(x) <= 1.0).all() and jnp.isfinite(x).all()

    steps = list(
        sample_random_voxel_features_progressive(model, params, jax.random.PRNGKey(2))
    )
    assert len(steps) == 6
    assert all((jnp.abs(s) <= 1.0).all() for s in steps)


def test_bilinear_matmul_matches_gather():
    """The MXU matmul formulation of bilinear sampling (triangle row weights)
    must match the 4-corner gather path exactly, including out-of-image
    zeros padding and both align_corners conventions."""
    from holo_diffusion_tpu.ops.image import (
        bilinear_sample_ndc,
        bilinear_sample_ndc_matmul,
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(13, 9, 5).astype(np.float32))
    # includes far-outside, boundary-straddling and interior points
    xys = jnp.asarray(
        rng.uniform(-1.7, 1.7, size=(257, 2)).astype(np.float32)
    )
    for ac in (False, True):
        a = bilinear_sample_ndc(img, xys, align_corners=ac)
        b = bilinear_sample_ndc_matmul(img, xys, align_corners=ac)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_bilinear_matmul_gradient_matches_gather():
    """The train step differentiates through view sampling (grads reach the
    extractor); the MXU matmul formulation must carry the same gradients as
    the gather path — both wrt the feature map and the sample positions."""
    import jax
    from holo_diffusion_tpu.ops.image import (
        bilinear_sample_ndc,
        bilinear_sample_ndc_matmul,
    )

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(11, 7, 3).astype(np.float32))
    # keep positions away from exact grid lines (kink points of the
    # piecewise-linear interpolant, where subgradients may differ)
    xys = jnp.asarray(
        (rng.uniform(-1.2, 1.2, size=(64, 2)) + 0.0013).astype(np.float32)
    )

    def loss(fn, img, xys):
        out = fn(img, xys)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_img_a, g_xy_a = jax.grad(
        lambda i, x: loss(bilinear_sample_ndc, i, x), argnums=(0, 1)
    )(img, xys)
    g_img_b, g_xy_b = jax.grad(
        lambda i, x: loss(bilinear_sample_ndc_matmul, i, x), argnums=(0, 1)
    )(img, xys)
    np.testing.assert_allclose(
        np.asarray(g_img_a), np.asarray(g_img_b), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_xy_a), np.asarray(g_xy_b), atol=3e-4, rtol=1e-4
    )
