"""WHOLE-FORWARD pixel parity vs the composed torch reference chain
(goldens from tests/make_goldens_holo_forward.py — VERDICT r3 missing #2).

The per-leg goldens pin each stage; these tests pin the cross-leg SEAMS by
running `HoloDiffusionModel.__call__` end-to-end with torch-imported weights
and comparing against the torch composition:
  * EVAL: preprocess -> pool (extract/project/sample/MLPMean) -> mapper+tanh
    -> tanh(unet(x, t=0)) -> full-grid two-pass EA render -> metrics.
  * TRAINING: same pool -> q_sample at fixed t with the jax-PRNG noise ->
    p_mean_variance pred_xstart -> bootstrap second pass (coin=True) ->
    mask_sample rays -> two-pass render -> MC splat -> objective.
Reference chain: holo_diffusion_model.py:201-540.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
from holo_diffusion_tpu.utils.torch_import import (
    convert_holo_model_state_dict,
)

GOLD = np.load(
    os.path.join(
        os.path.dirname(__file__), "goldens", "holo_forward_goldens.npz"
    )
)

# mirror of make_goldens_holo_forward.py's config block
RESOL = 8
VOX_EXTENT = 3.0
C_VOX = 8
N_TRAIN_TARGETS = 2


def _model(**overrides):
    kw = dict(
        resol=RESOL,
        volume_extent=VOX_EXTENT,
        feature_size=C_VOX,
        num_passes=2,
        net_3d_args=dict(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(2,), num_heads=2,
            use_scale_shift_norm=True, zero_last_conv=False,
            homogeneous_resample=True, use_remat=False,
        ),
        enable_bootstrap=True,
        bootstrap_prob=0.5,
        render_image_height=16,
        render_image_width=16,
        n_train_target_views=N_TRAIN_TARGETS,
        n_pts_per_ray_training=8,
        n_pts_per_ray_evaluation=8,
        n_rays_per_image=64,
        n_pts_per_ray_fine_training=4,
        n_pts_per_ray_fine_evaluation=4,
        stratified_point_sampling_training=False,
        stratified_point_sampling_evaluation=False,
        density_noise_std_train=0.0,
        scene_extent=1.5,
        image_feature_extractor_args=dict(
            name_arch="resnet18", stages=(1,), proj_dim=4,
            image_rescale=0.5, first_max_pool=True, l2_norm=True,
            add_masks=True, add_images=True, normalize_image=True,
        ),
        view_pooler_args=dict(
            aggregator_class_type="MLPMeanFeatureAggregator",
            aggregator_args=dict(
                n_hidden=16, dim_out=12, n_layers=1,
                n_harmonic_functions_ray=3,
            ),
        ),
        render_mlp_args=dict(
            dir_emb_dims=4, dnet_num_layers=4, dnet_hidden_dim=16,
            dnet_input_skips=(2,), rnet_num_layers=1, rnet_hidden_dim=16,
        ),
        sampler="reference",  # exact trilinear (parity, not speed)
        collapse_density="off",
        fuse_decode="off",
    )
    kw.update(overrides)
    return HoloDiffusionModel(**kw)


@pytest.fixture(scope="module")
def model_and_vars():
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
    variables = convert_holo_model_state_dict(
        sd, base,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        dnet_num_layers=4, rnet_num_layers=1,
        resnet_layers=(2, 2, 2, 2), resnet_stages=(1,),
    )
    return model, variables, cams


def test_whole_forward_eval_parity(model_and_vars):
    """pool -> tanh -> t=0 denoise -> full-grid two-pass render, end to end."""
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
        np.asarray(preds["voxel_features"][0]),
        GOLD["eval_grid_denoised"], atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(preds["images_render"]), GOLD["eval_image"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(preds["depths_render"]), GOLD["eval_depth"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(preds["masks_render"]), GOLD["eval_mask"], atol=1e-4
    )
    np.testing.assert_allclose(
        float(preds["loss_rgb_mse"]), float(GOLD["eval_rgb_mse"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(preds["loss_prev_stage_rgb_mse"]),
        float(GOLD["eval_prev_rgb_mse"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        float(preds["objective"]), float(GOLD["eval_objective"]), atol=2e-5
    )


def test_pooled_grid_parity(model_and_vars):
    """The pool->mapper->tanh half alone (seam into the diffusion leg)."""
    model, variables, cams = model_and_vars
    img, fg, _ = _preprocessed()
    grid = model.apply(
        variables, img[1:], cams[1:], fg[1:], None,
        method=HoloDiffusionModel.pool_features,
    )
    np.testing.assert_allclose(
        np.asarray(grid), GOLD["eval_grid_pooled"], atol=1e-4
    )


def _preprocessed():
    from holo_diffusion_tpu.models.metrics import preprocess_input

    return preprocess_input(
        jnp.asarray(GOLD["image_rgb"]),
        jnp.asarray(GOLD["fg_probability"]),
        None, True, True, 0.5, (1.0, 1.0, 1.0),
    )


def test_whole_forward_training_parity(model_and_vars):
    """Training mechanism end to end on the SAME jax-PRNG randomness the
    golden generator replicated: fixed timesteps, q_sample noise, bootstrap
    coin (True), mask_sample rays, splat, objective."""
    model, variables, cams = model_and_vars
    assert bool(GOLD["train_take_boot"])  # generator pinned the boot branch
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
    # the ray selection must reproduce the generator's replicated PRNG chain
    np.testing.assert_allclose(
        np.asarray(preds["ray_bundle"].xys), GOLD["train_xys"], atol=1e-6
    )
    assert bool(preds["diffusion_take_boot"])
    np.testing.assert_allclose(
        np.asarray(preds["diffusion_x_t"]), GOLD["train_x_t"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(preds["voxel_features"]),
        GOLD["train_voxel_features"], atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(preds["images_render"]),
        GOLD["train_images_render"], atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(preds["masks_render"]),
        GOLD["train_masks_render"], atol=2e-4,
    )
    np.testing.assert_allclose(
        float(preds["loss_rgb_mse"]), float(GOLD["train_rgb_mse"]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(preds["loss_prev_stage_rgb_mse"]),
        float(GOLD["train_prev_rgb_mse"]), atol=1e-4,
    )
    np.testing.assert_allclose(
        float(preds["objective"]), float(GOLD["train_objective"]), atol=2e-4
    )


def test_import_cli_composed_checkpoint(tmp_path):
    """End-to-end on the COMPOSED checkpoint: torch.save the golden's
    reference-layout state_dict as a .pth, run the import CLI against a YAML
    config mirroring the golden model, `load_experiment` the result, and
    re-verify whole-forward eval pixel parity through that pipeline."""
    import importlib
    import sys

    import torch
    import yaml

    sd = {
        k[4:]: torch.tensor(np.asarray(GOLD[k]))
        for k in GOLD.files
        if k.startswith("sd::")
    }
    pth = tmp_path / "composed_ref.pth"
    torch.save({"model": sd}, pth)

    m = dict(
        resol=RESOL, volume_extent=VOX_EXTENT, feature_size=C_VOX,
        num_passes=2, render_image_height=16, render_image_width=16,
        n_train_target_views=N_TRAIN_TARGETS,
        net_3d_SimpleUnet3D_args=dict(
            model_channels=32, num_res_blocks=1, channel_mult=[1, 2],
            attention_resolutions=[2], num_heads=2,
        ),
        raysampler_AdaptiveRaySampler_args=dict(
            n_pts_per_ray_training=8, n_pts_per_ray_evaluation=8,
            n_rays_per_image_sampled_from_mask=64, scene_extent=1.5,
            stratified_point_sampling_training=False,
            stratified_point_sampling_evaluation=False,
        ),
        renderer_HoloMultiPassEmissionAbsorptionRenderer_args=dict(
            n_pts_per_ray_fine_training=4, n_pts_per_ray_fine_evaluation=4,
            density_noise_std_train=0.0,
        ),
        image_feature_extractor_ResNetFeatureExtractor_args=dict(
            name="resnet18", stages=[1], proj_dim=4, image_rescale=0.5,
        ),
        feature_aggregator_class_type="MLPMeanFeatureAggregator",
        feature_aggregator_MLPMeanFeatureAggregator_args=dict(
            n_hidden=16, dim_out=12, n_layers=1, n_harmonic_functions_ray=3,
        ),
        implicit_function_HoloVoxelGridImplicitFunction_args=dict(
            render_mlp_args=dict(
                dir_emb_dims=4, dnet_num_layers=4, dnet_hidden_dim=16,
                dnet_input_skips=[2], rnet_num_layers=1, rnet_hidden_dim=16,
            ),
        ),
    )
    cfg = dict(
        exp_dir=str(tmp_path / "exp"),
        data_source_ImplicitronDataSource_args=dict(
            dataset_map_provider_class_type="SyntheticDataProvider",
            dataset_map_provider_SyntheticDataProvider_args=dict(
                n_scenes=1, n_views_per_scene=5, image_size=32,
            ),
            data_loader_map_provider_SequenceDataLoaderMapProvider_args=dict(
                batch_size=5, dataset_length_train=2, dataset_length_val=1,
            ),
        ),
        model_factory_ImplicitronModelFactory_args=dict(
            model_HoloDiffusionModel_args=m,
        ),
    )
    cfg_path = tmp_path / "composed_golden.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    exp_dir = tmp_path / "imported"
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    try:
        import_cli = importlib.import_module("import_reference_checkpoint")
    finally:
        sys.path.pop(0)
    import_cli.main([
        "--pth", str(pth), "--config-name", str(cfg_path),
        "--exp-dir", str(exp_dir), "--epoch", "5",
    ])

    from holo_diffusion_tpu.utils.checkpoint_utils import load_experiment

    exp, state = load_experiment(str(exp_dir))
    cams = PerspectiveCameras(
        R=jnp.asarray(GOLD["cam_R"]),
        T=jnp.asarray(GOLD["cam_T"]),
        focal_length=jnp.asarray(GOLD["cam_focal"]),
        principal_point=jnp.asarray(GOLD["cam_pp"]),
    )
    preds = exp.model.apply(
        jax.device_get(state.variables()),
        camera=cams,
        image_rgb=jnp.asarray(GOLD["image_rgb"]),
        fg_probability=jnp.asarray(GOLD["fg_probability"]),
        mask_crop=jnp.asarray(GOLD["mask_crop"]),
        training=False,
        rng=None,
    )
    np.testing.assert_allclose(
        np.asarray(preds["images_render"]), GOLD["eval_image"], atol=1e-3
    )
    np.testing.assert_allclose(
        float(preds["objective"]), float(GOLD["eval_objective"]), atol=1e-4
    )
