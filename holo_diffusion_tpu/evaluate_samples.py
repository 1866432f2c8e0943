"""Sample-quality evaluation: FID / KID of generated renders vs dataset images
— the paper's headline metric (reference README.md:47 links the CVPR'23 paper;
the repo itself ships no metric code, SURVEY.md §6).

Protocol: sample `num_samples` voxel grids with the trained diffusion model
(full DDPM ancestral sampling, sampling.py), render each from
`poses_per_sample` fixed fly-around poses (simple_360 trajectory with
per-sample azimuth offsets, the trajectory of generate_samples.py), and score
the pooled render set against the dataset's (preprocessed, white-background)
frames with `evaluation_fid.fid_kid_between_image_sets`.

Feature extractors (the metric machinery is extractor-generic):
  * "inception"  — the STANDARD FID extractor: FID-InceptionV3 pool3
                   (2048-d) in flax (`models/inception.py`, torch-parity
                   tested). Needs a pytorch-fid `pt_inception` state_dict
                   via `weights_path` (this zero-egress env ships none, so
                   paper-comparable numbers still require importing the
                   published weights once).
  * "random_inception" — same architecture, random init: protocol smoke
                   test only; labeled accordingly.
  * "vgg"        — VGG16 relu5_3 global-average-pool features from imported
                   torchvision weights (`vgg_weights_path`). Numbers are
                   labeled "VGG-FID"/"VGG-KID": NOT comparable to the
                   standard InceptionV3-pool3 FID in the paper's tables.
  * "random_vgg" — randomly initialized VGG16 (no weights needed): a
                   protocol smoke test only; labeled accordingly.
A custom `feature_fn=` can also be plugged in programmatically.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .evaluation_fid import fid_kid_between_image_sets
from .models.holo_model import HoloDiffusionModel
from .sampling import sample_random_voxel_features
from .utils.flyaround import CANONICAL_CO3D_UP_AXIS, simple_360_cameras

logger = logging.getLogger(__name__)


def _real_image_set(
    scenes, size: Tuple[int, int], model: HoloDiffusionModel,
    n_real: Optional[int],
) -> np.ndarray:
    """Dataset frames -> (N, H, W, 3) in [0, 1], preprocessed the way the
    model sees them (fg-masked, white background — preprocess_input,
    holo_diffusion_model.py:248-256) and resized to the render size."""
    from .models.metrics import preprocess_input

    H, W = size
    images = []
    for scene in scenes:
        img, _, _ = preprocess_input(
            scene.image_rgb, scene.fg_probability, None,
            model.mask_images, model.mask_depths, model.mask_threshold,
            model.bg_color,
        )
        img = jax.image.resize(
            img, (img.shape[0], H, W, img.shape[-1]), "bilinear"
        )
        images.append(np.asarray(jnp.clip(img, 0.0, 1.0)))
        if n_real is not None and sum(len(x) for x in images) >= n_real:
            break
    out = np.concatenate(images, axis=0)
    return out[:n_real] if n_real is not None else out


def _render_sample_set(
    model: HoloDiffusionModel,
    variables,
    rng: jax.Array,
    num_samples: int,
    poses_per_sample: int,
    trajectory_distance: float,
    max_iter: Optional[int] = None,
) -> np.ndarray:
    """Sample grids and render them -> (num_samples * poses, H, W, 3)."""

    @jax.jit
    def render_one(v, camera, grid, step_rng):
        preds = model.apply(
            v, camera=camera, voxel_features=grid, training=False,
            rng=step_rng,
        )
        return jnp.clip(preds["images_render"][0], 0.0, 1.0)

    renders = []
    for i in range(num_samples):
        rng, sample_rng = jax.random.split(rng)
        grid = sample_random_voxel_features(
            model, variables, sample_rng, max_iter=max_iter
        )
        # per-sample azimuth offset so the pooled render set covers the
        # full orbit even with few poses per sample
        cams = simple_360_cameras(
            poses_per_sample,
            dist=trajectory_distance,
            up=CANONICAL_CO3D_UP_AXIS,
            azimuth_offset=360.0 * i / max(num_samples, 1),
        )
        for p in range(poses_per_sample):
            rng, step_rng = jax.random.split(rng)
            renders.append(np.asarray(
                render_one(variables, cams[p], grid, step_rng)
            ))
        logger.info(f"sample {i + 1}/{num_samples} rendered")
    return np.stack(renders)


def _make_feature_fn(
    extractor: str, vgg_weights_path: Optional[str], image_size: Tuple[int, int]
) -> Tuple[Callable, str]:
    """Returns (feature_fn over (B, H, W, 3) in [0,1] -> (B, D), label)."""
    from .evaluation_fid import vgg_pooled_feature_fn
    from .models.lpips import VGG16Features, lpips_params_from_torch

    if extractor == "vgg":
        if not vgg_weights_path:
            raise ValueError(
                "extractor='vgg' needs vgg_weights_path (torchvision vgg16 "
                "state_dict); use extractor='random_vgg' for a weights-free "
                "protocol smoke test"
            )
        import torch

        sd = torch.load(vgg_weights_path, map_location="cpu", weights_only=True)
        sd = {k: np.asarray(v) for k, v in sd.items()}
        feats = {
            k[len("features."):]: v
            for k, v in sd.items() if k.startswith("features.")
        } or sd
        from .models.lpips import TAP_DIMS

        lins = [np.ones((c,), np.float32) for c in TAP_DIMS]
        vgg_vars = {
            "params": lpips_params_from_torch(feats, lins)["params"]["vgg"]
        }
        return vgg_pooled_feature_fn(vgg_vars), "vgg"
    if extractor == "random_vgg":
        H, W = image_size
        vgg_vars = VGG16Features().init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))
        )
        return vgg_pooled_feature_fn(vgg_vars), "random_vgg"
    if extractor in ("inception", "random_inception"):
        from .evaluation_fid import inception_pooled_feature_fn
        from .models.inception import (
            FIDInceptionV3,
            inception_params_from_torch,
        )

        if extractor == "inception":
            if not vgg_weights_path:
                raise ValueError(
                    "extractor='inception' needs weights_path (pytorch-fid "
                    "pt_inception state_dict); use 'random_inception' for a "
                    "weights-free protocol smoke test"
                )
            import torch

            sd = torch.load(
                vgg_weights_path, map_location="cpu", weights_only=True
            )
            variables = inception_params_from_torch(sd)
            return inception_pooled_feature_fn(variables), "inception"
        variables = FIDInceptionV3().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
        )
        return inception_pooled_feature_fn(variables), "random_inception"
    raise ValueError(
        f"unknown extractor {extractor!r} "
        "(vgg | random_vgg | inception | random_inception)"
    )


def evaluate_samples(
    model: HoloDiffusionModel,
    variables,
    scenes,
    num_samples: int = 8,
    poses_per_sample: int = 4,
    trajectory_distance: float = 15.0,
    extractor: str = "random_vgg",
    vgg_weights_path: Optional[str] = None,
    feature_fn: Optional[Callable] = None,
    n_real: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    max_iter: Optional[int] = None,
    kid_subset_size: Optional[int] = None,
    dump_path: Optional[str] = None,
) -> Dict:
    """Sample -> render -> FID/KID vs the dataset frames.

    Returns {"<label>_fid", "<label>_kid_mean", "<label>_kid_std", counts,
    protocol metadata}; metric keys carry the extractor label because VGG-FID
    and Inception-FID live on different scales.
    """
    assert model.net_3d_enabled and model.diffusion_enabled, (
        "sample evaluation needs a diffusion model (the reference's "
        "generate_samples.py:90-92 contract)"
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    size = (model.render_image_height, model.render_image_width)

    fake = _render_sample_set(
        model, variables, rng, num_samples, poses_per_sample,
        trajectory_distance, max_iter=max_iter,
    )
    real = _real_image_set(scenes, size, model, n_real)
    if feature_fn is None:
        feature_fn, label = _make_feature_fn(extractor, vgg_weights_path, size)
    else:
        label = extractor
    n = min(len(fake), len(real))
    scores = fid_kid_between_image_sets(
        fake, real, feature_fn,
        kid_subset_size=kid_subset_size or max(2, min(100, n)),
    )
    result = {
        f"{label}_fid": scores["fid"],
        f"{label}_kid_mean": scores["kid_mean"],
        f"{label}_kid_std": scores["kid_std"],
        "n_generated": int(scores["n_a"]),
        "n_real": int(scores["n_b"]),
        "num_samples": num_samples,
        "poses_per_sample": poses_per_sample,
        "extractor": label,
        # True only for the real FID-InceptionV3 with imported weights —
        # those numbers live on the paper's Inception-FID scale
        "comparable_to_inception_fid": label == "inception",
    }
    if dump_path:
        os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
        with open(dump_path, "w") as f:
            json.dump(result, f, indent=2)
        logger.info(f"sample-eval results -> {dump_path}")
    return result
