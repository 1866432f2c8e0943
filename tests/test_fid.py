"""FID / KID metric machinery (evaluation_fid.py) — closed-form and
statistical sanity tests."""
import numpy as np
import pytest

from holo_diffusion_tpu.evaluation_fid import (
    compute_feature_stats,
    fid_kid_between_image_sets,
    frechet_distance,
    kid_score,
)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T + np.eye(8)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_closed_form_diagonal():
    """For diagonal Gaussians FID = |dmu|^2 + sum (sqrt(s1) - sqrt(s2))^2."""
    mu1 = np.array([0.0, 0.0])
    mu2 = np.array([1.0, -2.0])
    s1 = np.diag([4.0, 9.0])
    s2 = np.diag([1.0, 16.0])
    expect = 1.0 + 4.0 + (2 - 1) ** 2 + (3 - 4) ** 2
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expect, rel=1e-9)


def test_kid_zero_for_same_distribution_and_positive_for_shifted():
    rng = np.random.RandomState(1)
    a = rng.randn(600, 16)
    b = rng.randn(600, 16)
    c = rng.randn(600, 16) + 1.5
    same_mean, _ = kid_score(a, b, n_subsets=20, subset_size=100)
    diff_mean, _ = kid_score(a, c, n_subsets=20, subset_size=100)
    assert abs(same_mean) < 0.05
    assert diff_mean > 0.5


def test_end_to_end_with_feature_fn():
    rng = np.random.RandomState(2)
    imgs_a = rng.rand(40, 8, 8, 3).astype(np.float32)
    imgs_b = np.clip(imgs_a + 0.3 * rng.randn(40, 8, 8, 3), 0, 1).astype(
        np.float32
    )

    def feature_fn(x):  # a trivial, deterministic extractor
        return x.reshape(len(x), -1) @ rng2_proj

    rng2_proj = np.random.RandomState(3).randn(8 * 8 * 3, 12)
    res_same = fid_kid_between_image_sets(
        imgs_a, imgs_a, feature_fn, kid_subsets=10, kid_subset_size=20
    )
    res_diff = fid_kid_between_image_sets(
        imgs_a, imgs_b, feature_fn, kid_subsets=10, kid_subset_size=20
    )
    assert res_same["fid"] == pytest.approx(0.0, abs=1e-6)
    assert res_diff["fid"] > res_same["fid"]
    assert res_diff["kid_mean"] > res_same["kid_mean"] - 1e-9


def test_vgg_feature_fn_shapes():
    import jax
    import jax.numpy as jnp

    from holo_diffusion_tpu.evaluation_fid import vgg_pooled_feature_fn
    from holo_diffusion_tpu.models.lpips import VGG16Features

    v = VGG16Features().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fn = vgg_pooled_feature_fn(v)
    out = fn(np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32))
    assert out.shape == (3, 512)
    mu, sigma, feats = compute_feature_stats(
        np.random.RandomState(1).rand(5, 32, 32, 3).astype(np.float32),
        fn, batch_size=2,
    )
    assert mu.shape == (512,) and sigma.shape == (512, 512) and feats.shape == (5, 512)


@pytest.mark.slow
def test_evaluate_samples_end_to_end():
    """The sample-quality pipeline (VERDICT r2 #3): sample grids -> render
    poses -> FID/KID vs dataset frames, with the random-VGG extractor."""
    import jax

    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.evaluate_samples import evaluate_samples
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_flyaround import TINY

    model = HoloDiffusionModel(**TINY)
    scenes = [make_synthetic_scene(n_views=3, image_size=12, seed=s)
              for s in range(2)]
    variables = model.init(
        jax.random.PRNGKey(0),
        camera=scenes[0].camera,
        image_rgb=scenes[0].image_rgb,
        fg_probability=scenes[0].fg_probability,
        mask_crop=scenes[0].mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        dump = os.path.join(td, "sample_eval.json")
        res = evaluate_samples(
            model, variables, scenes,
            num_samples=2, poses_per_sample=2,
            extractor="random_vgg", rng=jax.random.PRNGKey(2),
            kid_subset_size=2, dump_path=dump,
        )
        assert os.path.exists(dump)
    assert res["extractor"] == "random_vgg"
    assert res["n_generated"] == 4
    assert res["n_real"] == 6  # 2 scenes x 3 views
    assert np.isfinite(res["random_vgg_fid"]) and res["random_vgg_fid"] >= 0
    assert np.isfinite(res["random_vgg_kid_mean"])
    assert res["comparable_to_inception_fid"] is False


@pytest.mark.slow
def test_evaluate_samples_inception_extractor():
    """The STANDARD-protocol extractor leg: random-init FID-InceptionV3
    (2048-d pool3; real weights swap in via extractor='inception'
    weights_path=pt_inception...). Labels must mark random init as NOT
    paper-comparable."""
    import jax

    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.evaluate_samples import evaluate_samples
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_flyaround import TINY

    model = HoloDiffusionModel(**TINY)
    scenes = [make_synthetic_scene(n_views=2, image_size=12, seed=7)]
    variables = model.init(
        jax.random.PRNGKey(0),
        camera=scenes[0].camera,
        image_rgb=scenes[0].image_rgb,
        fg_probability=scenes[0].fg_probability,
        mask_crop=scenes[0].mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    res = evaluate_samples(
        model, variables, scenes,
        num_samples=1, poses_per_sample=2,
        extractor="random_inception", rng=jax.random.PRNGKey(2),
        kid_subset_size=2,
    )
    assert res["extractor"] == "random_inception"
    assert np.isfinite(res["random_inception_fid"])
    assert res["comparable_to_inception_fid"] is False
