"""Shipped-config vs reference-config diff inventory (VERDICT r4 weak #5).

Round 4 proved no shipped key is *dead* (test_config_audit.py); this test
proves the complement: every reference-config key that the shipped YAMLs DROP
or CHANGE is inventoried with an explicit justification, so a silent
translation loss (like round 4's dropped `load_eval_batches: true`) cannot
recur. The inventory is asserted in both directions — an unexplained diff
fails, and a stale inventory entry (key no longer diffing) also fails.

Key categories:
  * CONSUMED_DEFAULT — our loader consumes the key with a built-in default
    equal to the reference YAML's value, so omitting it from the shipped YAML
    is behavior-preserving. The expected reference value is pinned here; if
    upstream ever changes it, this test flags the divergence.
  * DROPPED — functionality intentionally not carried (reason recorded):
    dead-in-reference keys, torch/visdom/hydra-specific machinery, single-
    implementation class selectors.
  * CHANGED — value differs on purpose (environment paths).

Reference YAMLs are read from /root/reference/configs; skipped when absent.
"""
import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from holo_diffusion_tpu.config.config import load_config  # noqa: E402

REF_DIR = "/root/reference/configs"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not available"
)

PAIRS = ["base", "hydrant", "apple", "donut", "teddybear",
         "unet_with_no_diffusion"]

_DS = ("data_source_ImplicitronDataSource_args."
       "dataset_map_provider_JsonIndexDatasetMapProviderV2_args.")
_JD = _DS + "dataset_JsonIndexDataset_args."
_DL = ("data_source_ImplicitronDataSource_args."
       "data_loader_map_provider_SequenceDataLoaderMapProvider_args.")
_M = ("model_factory_ImplicitronModelFactory_args."
      "model_HoloDiffusionModel_args.")
_IF = _M + "implicit_function_HoloVoxelGridImplicitFunction_args."
_VP = _M + "view_pooler_args."
_O = "optimizer_factory_ImplicitronOptimizerFactory_args."
_T = "training_loop_ImplicitronTrainingLoop_args."

# ---------------------------------------------------------------------------
# CONSUMED_DEFAULT: dotted key -> the value every reference config sets, which
# equals the framework's built-in default (consumption site cited).
CONSUMED_DEFAULT = {
    "detect_anomaly": False,                     # experiment.py:84 (jax_debug_nans)
    _JD + "pick_sequence": [],                   # config.py data_source_args
    _JD + "exclude_sequence": [],                # config.py data_source_args
    _JD + "limit_sequences_to": 0,               # config.py data_source_args
    _JD + "sort_frames": False,                  # config.py data_source_args
    _M + "mask_images": True,                    # config.py model_args :420
    _M + "mask_depths": True,                    # config.py model_args :421
    _O + "exponential_lr_step_size": 250,        # train/optimizer.py:21
    _O + "linear_exponential_lr_milestone": 200,  # train/optimizer.py:22
    _O + "linear_exponential_start_gamma": 0.1,  # train/optimizer.py:23
    # experiment.run_eval_only reads these bins; (0.97, 0.98) is the default
    _T + "evaluator_ImplicitronEvaluator_args.camera_difficulty_bin_breaks":
        [0.97, 0.98],
}

# ---------------------------------------------------------------------------
# DROPPED: dotted key -> why the shipped configs do not carry it.
_SELECTOR = ("single-implementation class selector; the TPU build constructs "
             "the one implementation directly (no registry)")
_DEAD_IF = ("dead in the reference: HoloDiffusionModel overrides the "
            "implicit function's resol/volume_extent/n_hidden/feature_dim "
            "from its own fields (reference holo_diffusion_model.py:152-160),"
            " so the per-implicit-fn YAML values never take effect; the "
            "shipped configs carry the effective model-level values instead")
_OFF_EVERYWHERE = ("disabled (value shown) in every reference config; the "
                   "feature is not carried")
_VISDOM = ("visdom is replaced by the HTML dashboard + train_stats plots "
           "(utils/vis.py; documented in docs/); server/env/port keys have "
           "no equivalent")
_LOADER_MODE = ("loader modes beyond SAME-sequence batching are not "
                "supported (config.py _validate_conditioning); the reference "
                "sets SAME everywhere and disables testing")
DROPPED = {
    "hydra.run.dir": "no hydra: the CLI parses dotted overrides itself "
                     "(cli.py); output dir comes from exp_dir",
    "hydra.output_subdir": "no hydra (see hydra.run.dir)",
    "hydra.mode": "no hydra (see hydra.run.dir)",
    _T + "visdom_env": _VISDOM,
    _T + "visdom_port": _VISDOM,
    _T + "visdom_server": _VISDOM,
    _T + "evaluator_class_type": _SELECTOR,
    _T + "evaluator_ImplicitronEvaluator_args.is_multisequence":
        "the evaluator is always multi-sequence (CO3D categories); True in "
        "every reference config",
    _DS + "only_test_set": _OFF_EVERYWHERE + " (False everywhere)",
    _DS + "dataset_class_type": _SELECTOR,
    _DS + "path_manager_factory_class_type":
        "fvcore PathManager is FB-infrastructure plumbing; the TPU build "
        "reads the local filesystem directly",
    _DS + "path_manager_factory_PathManagerFactory_args.silence_logs":
        "see path_manager_factory_class_type",
    _JD + "limit_to": _OFF_EVERYWHERE + " (0 = no frame-count cap anywhere)",
    _JD + "limit_category_to":
        "multi-category filtering: the provider is single-category by "
        "construction (the `category` key); [] everywhere in the reference",
    _JD + "load_depth_masks":
        "depth masks are applied during depth loading (data/co3d.py "
        "load_depth uses the depth_mask path unconditionally when depths "
        "are loaded), not toggled separately",
    _JD + "load_point_clouds": _OFF_EVERYWHERE + " (False; the model never "
        "consumes point clouds)",
    _JD + "max_points": "point-cloud cap; see load_point_clouds",
    _JD + "mask_images": "dataset-level masking is False everywhere in the "
        "reference; masking happens in the model's preprocess_input "
        "(models/holo_model.py), matching the reference pipeline",
    _JD + "mask_depths": "see dataset-level mask_images",
    _JD + "seed": "JsonIndexDataset's RNG for n_frames_per_sequence "
        "subsampling; our provider keeps all frames unless "
        "n_frames_per_sequence>0, which no reference config sets (-1)",
    _DL + "dataset_length_test": _OFF_EVERYWHERE + " (0; testing disabled "
        "in every reference config via disable_testing)",
    _DL + "sample_consecutive_frames": _LOADER_MODE,
    _DL + "consecutive_frames_max_gap": _LOADER_MODE,
    _DL + "consecutive_frames_max_gap_seconds": _LOADER_MODE,
    _DL + "test_conditioning_type": _LOADER_MODE,
    _DL + "val_conditioning_type": _LOADER_MODE,
    _M + "global_encoder_class_type": _OFF_EVERYWHERE + " (null: no global "
        "encoder in any reference config)",
    _M + "regularization_metrics_class_type": _SELECTOR,
    _M + "view_metrics_class_type": _SELECTOR,
    _M + "view_metrics_HoloDiffusionMetrics_args.calc_lpips_loss":
        "vestigial class absent from the released reference code (SURVEY "
        "§2.7: unet_with_no_diffusion.yaml references HoloDiffusionMetrics "
        "which does not exist in the release); LPIPS eval lives in "
        "evaluation.py via lpips_vgg_weights_path",
    _M + "render_features_dimensions":
        "always 3 (RGB) in the reference; the render feature width is fixed "
        "by RenderMLP.output_feature_dims (models/render_mlp.py:26)",
    _M + "tqdm_trigger_threshold": "tqdm progress-bar cosmetics; the eval "
        "renderer logs chunk progress via logging instead",
    _M + "raysampler_AdaptiveRaySampler_args.n_rays_total_training":
        _OFF_EVERYWHERE + " (null: the per-image n_rays_per_image... knob "
        "is the one used, and is shipped)",
    _M + ("image_feature_extractor_ResNetFeatureExtractor_args."
          "global_average_pool"): _OFF_EVERYWHERE + " (False everywhere; "
        "the extractor returns spatial maps only)",
    _M + "net_3d_SimpleUnet3D_args.image_size":
        "unused by the reference UNet too (guided_diffusion UNetModel "
        "stores but never reads it); the TPU UNet takes no image_size",
    _M + "net_3d_SimpleUnet3D_args.in_channels":
        "derived: in/out channels are feature_size (+cond) by construction "
        "(explicit-dims design, SURVEY §7; reference diffusion_utils.py:56 "
        "passes them from the same config values)",
    _M + "net_3d_SimpleUnet3D_args.out_channels":
        "derived (see in_channels)",
    _IF + "resol": _DEAD_IF,
    _IF + "volume_extent": _DEAD_IF,
    _IF + "n_hidden": _DEAD_IF,
    _IF + "feature_dim": _DEAD_IF,
    _IF + "init_density_bias": _DEAD_IF,
    _IF + "render_mlp_args.input_dims":
        "explicit-dims design: the RenderMLP input width is derived from "
        "the (model-level) feature size; the reference value is itself "
        "overridden (see " + _DEAD_IF[:20] + "...)",
    _IF + "render_mlp_args.output_feature_dims":
        "equals the built-in default 3 (models/render_mlp.py:26)",
    _IF + "render_mlp_args.output_vp_independent_feature_dims":
        "equals the built-in default 64 (models/render_mlp.py:27)",
    _M + "log_vars":
        "consumed when set (experiment._model_cfg_log_vars filters Stats "
        "keys); omitted -> Stats records every emitted metric, a superset "
        "of the reference list",
    _O + "foreach": "torch.optim vectorization flag; no optax analog (XLA "
        "fuses the update across the param pytree)",
}
# unet_with_no_diffusion.yaml loss_weights housekeeping: zero-weighted
# vestigial GAN/VAE/LPIPS keys (the losses don't exist in the released
# reference code, SURVEY §2.7) and weights for render passes that don't run
# (num_passes=2 -> only prev_stage^0/^1 metrics exist; ^2..^4 keys are dead).
for _lw, _why in {
    "loss_diffusion": "weight 0.0 (no-op) in unet_with_no_diffusion",
    "loss_gan_gen": "weight 0.0; GAN loss is vestigial (not in release code)",
    "loss_vae_mse": "weight 0.0; VAE loss is vestigial",
    "loss_vae_huber": "weight 0.0; VAE loss is vestigial",
    "loss_lpips": "weight 0.0; HoloDiffusionMetrics LPIPS is vestigial",
    "loss_prev_stage_prev_stage_mask_bce":
        "stage ^2 never exists at num_passes=2 (dead weight key)",
    "loss_prev_stage_prev_stage_prev_stage_rgb_mse":
        "stage ^3 never exists at num_passes=2 (dead weight key)",
    "loss_prev_stage_prev_stage_prev_stage_prev_stage_rgb_mse":
        "stage ^4 never exists at num_passes=2 (dead weight key)",
}.items():
    DROPPED[_M + "loss_weights." + _lw] = _why

# The exclude-target-view / MLP housekeeping switches are force-disabled by
# the reference itself (holo_diffusion_model.py:114-116) and stripped by our
# config layer (config.py:408-410) — dead upstream, dropped here.
for _agg, _keys in (
    ("MLPMeanFeatureAggregator",
     ("exclude_target_view", "exclude_target_view_mask_features",
      "concatenate_output", "checkpointed_mlp")),
    ("AngleWeightedReductionFeatureAggregator",
     ("exclude_target_view", "exclude_target_view_mask_features",
      "concatenate_output")),
):
    for _k in _keys:
        DROPPED[_VP + f"feature_aggregator_{_agg}_args." + _k] = (
            "force-disabled by the reference itself "
            "(holo_diffusion_model.py:114-116) / torch-checkpoint plumbing; "
            "stripped by config.py:408-410"
        )

# num_load_workers IS consumed (host decode pool, data/co3d.py); the shipped
# configs carry num_workers on the loader block instead — inventory the
# provider-level alias.
DROPPED[_DS + "num_load_workers"] = (
    "the shipped configs size the host decode pool via the loader block's "
    "num_workers key (consumed by CO3DDataProvider); the provider-level "
    "alias is redundant"
)

# ---------------------------------------------------------------------------
# CHANGED: dotted key -> why the shipped value differs from the reference.
CHANGED = {
    "exp_dir": "environment path (reference points at FAIR cluster storage)",
    _DS + "dataset_root": "environment path (reference points at FAIR "
                          "cluster storage); shipped configs leave it empty "
                          "for the user to set",
}


def _flatten(d, prefix=""):
    out = {}
    for k, v in (d or {}).items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _diff(name):
    with open(os.path.join(REF_DIR, name + ".yaml")) as f:
        ref = _flatten(yaml.safe_load(f))
    ship = _flatten(load_config(name))
    missing = {k: v for k, v in ref.items() if k not in ship}
    changed = {k: (ref[k], ship[k]) for k in ref
               if k in ship and ship[k] != ref[k]}
    return missing, changed


@pytest.mark.parametrize("name", PAIRS)
def test_every_reference_key_is_shipped_or_inventoried(name):
    missing, changed = _diff(name)
    problems = []
    for k, refv in missing.items():
        if k in CONSUMED_DEFAULT:
            if CONSUMED_DEFAULT[k] != refv:
                problems.append(
                    f"CONSUMED_DEFAULT mismatch {k}: inventory pins "
                    f"{CONSUMED_DEFAULT[k]!r} but reference sets {refv!r}"
                )
        elif k not in DROPPED:
            problems.append(f"UNINVENTORIED dropped key {k} = {refv!r}")
    for k, (refv, shipv) in changed.items():
        if k not in CHANGED:
            problems.append(
                f"UNINVENTORIED changed key {k}: ref {refv!r} vs "
                f"shipped {shipv!r}"
            )
    assert not problems, "\n".join(problems)


def test_inventory_is_not_stale():
    """Every inventory entry must still correspond to a real diff in at
    least one config pair — otherwise the entry is stale and should go."""
    all_missing, all_changed = set(), set()
    for name in PAIRS:
        missing, changed = _diff(name)
        all_missing |= set(missing)
        all_changed |= set(changed)
    stale = [k for k in list(CONSUMED_DEFAULT) + list(DROPPED)
             if k not in all_missing]
    stale += [k for k in CHANGED if k not in all_changed]
    assert not stale, f"stale inventory entries: {stale}"


def test_eval_protocol_shipped_on_by_default():
    """The CO3D challenge protocol ships enabled, mirroring reference
    base.yaml:31/33 (VERDICT r4 missing #1)."""
    for name in PAIRS:
        cfg = load_config(name)
        dm = cfg["data_source_ImplicitronDataSource_args"][
            "dataset_map_provider_JsonIndexDatasetMapProviderV2_args"]
        assert dm.get("load_eval_batches") is True, name
        assert dm.get("n_known_frames_for_test") == 0, name
