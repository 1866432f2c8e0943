"""View metrics unit tests (Implicitron ViewMetrics parity semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.geometry.rays import pixel_grid_ndc
from holo_diffusion_tpu.models.metrics import (
    calc_psnr,
    get_objective,
    preprocess_input,
    view_metrics,
)


def test_preprocess_input_masks_with_white_bg():
    img = jnp.zeros((1, 4, 4, 3))
    fg = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(0.9)
    depth = jnp.ones((1, 4, 4, 1))
    out_img, out_fg, out_depth = preprocess_input(
        img, fg, depth, True, True, 0.5, (1.0, 1.0, 1.0)
    )
    assert float(out_img[0, 0, 0, 0]) == 1.0  # bg -> white
    assert float(out_img[0, 1, 1, 0]) == 0.0  # fg keeps value
    assert float(out_depth[0, 0, 0, 0]) == 0.0  # bg depth masked
    assert float(out_fg[0, 1, 1, 0]) == 1.0  # thresholded


def test_view_metrics_perfect_prediction():
    H = W = 8
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    xys = pixel_grid_ndc(H, W).reshape(1, -1, 2)
    feats = img.reshape(1, -1, 3)
    depths = jnp.ones((1, H * W, 1)) * 2.0
    masks = jnp.ones((1, H * W, 1)) * 0.999
    fg = jnp.ones((1, H, W, 1))
    d_gt = jnp.ones((1, H, W, 1)) * 2.0
    m = view_metrics(feats, depths, masks, xys, img, d_gt, fg)
    assert m["loss_rgb_mse"] < 1e-10
    assert m["loss_rgb_psnr"] > 90
    assert m["loss_depth_abs"] < 1e-6
    assert m["loss_mask_neg_iou"] == pytest.approx(-1.0, abs=1e-3)


def test_view_metrics_wrong_prediction_has_loss():
    H = W = 4
    img = jnp.zeros((1, H, W, 3))
    xys = pixel_grid_ndc(H, W).reshape(1, -1, 2)
    feats = jnp.ones((1, H * W, 3))
    depths = jnp.zeros((1, H * W, 1))
    masks = jnp.full((1, H * W, 1), 0.5)
    m = view_metrics(feats, depths, masks, xys, img, None, None)
    assert m["loss_rgb_mse"] == pytest.approx(1.0, abs=1e-5)
    assert m["loss_rgb_psnr"] == pytest.approx(0.0, abs=1e-3)
    assert "loss_rgb_huber" in m


def test_get_objective_weighting():
    preds = {"loss_rgb_mse": jnp.asarray(2.0), "loss_mask_bce": jnp.asarray(5.0)}
    obj = get_objective(preds, {"loss_rgb_mse": 1.0, "loss_mask_bce": 0.0,
                                "loss_missing": 3.0})
    assert float(obj) == 2.0


def test_calc_psnr():
    assert float(calc_psnr(jnp.asarray(0.01))) == pytest.approx(20.0, abs=1e-4)
