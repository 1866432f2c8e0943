"""FID / KID — the paper's sample-quality metrics.

HoloDiffusion's quantitative results are FID/KID per CO3Dv2 category
(CVPR'23 paper linked from the reference README.md:47; the repo itself ships
no metric code — SURVEY.md §6). This module provides the metric machinery,
generic over the feature extractor:

  * `compute_feature_stats`  — batched feature extraction -> (mu, sigma, feats)
  * `frechet_distance`       — FID between two Gaussians (Dowson–Landau),
                               matrix sqrt via symmetric eigendecomposition
  * `kid_score`              — KID: unbiased polynomial-kernel MMD^2
                               (Binkowski et al. 2018, the standard protocol)
  * `fid_kid_between_image_sets` — end-to-end on two image stacks

The standard protocol uses InceptionV3 pool3 features: the FID-patched
architecture is implemented in `models/inception.py` (use
`inception_pooled_feature_fn` with imported pt_inception weights for
paper-comparable numbers; the weights themselves are unavailable in this
zero-egress env). `vgg_pooled_feature_fn` is the lighter fallback — label
such numbers "VGG-FID", they are not comparable to Inception-FID. The
metric math itself is extractor-agnostic and tested against closed forms.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


def compute_feature_stats(
    images: np.ndarray,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """images: (N, H, W, 3) in [0, 1] -> (mu (D,), sigma (D, D), feats (N, D)).

    feature_fn maps a (B, H, W, 3) batch to (B, D) features (any spatial
    pooling is the caller's choice; the standard protocol global-average-pools).
    """
    feats = []
    for i in range(0, len(images), batch_size):
        f = np.asarray(feature_fn(images[i:i + batch_size]))
        assert f.ndim == 2, f.shape
        feats.append(f.astype(np.float64))
    feats = np.concatenate(feats, axis=0)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma), feats


def _sqrtm_psd(m: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh((m + m.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals + eps)) @ vecs.T


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID = |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1^{1/2} S2 S1^{1/2})^{1/2}).

    The symmetric formulation (S1^{1/2} S2 S1^{1/2}) keeps the product PSD so
    a real eigendecomposition suffices (equivalent to sqrtm(S1 S2) in trace).
    """
    diff = mu1 - mu2
    s1h = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1h @ sigma2 @ s1h)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def kid_score(
    feats_a: np.ndarray,
    feats_b: np.ndarray,
    n_subsets: int = 100,
    subset_size: Optional[int] = None,
    seed: int = 0,
) -> Tuple[float, float]:
    """KID: unbiased MMD^2 with the polynomial kernel
    k(x, y) = (x.y / D + 1)^3, averaged over random subsets (the protocol of
    Binkowski et al. 2018 as used by the CO3D/HoloDiffusion evaluations).

    Returns (mean, std) over subsets.
    """
    rng = np.random.RandomState(seed)
    n = min(len(feats_a), len(feats_b))
    m = subset_size or min(1000, n)
    D = feats_a.shape[1]

    def poly(x, y):
        return (x @ y.T / D + 1.0) ** 3

    scores = []
    for _ in range(n_subsets):
        x = feats_a[rng.choice(len(feats_a), m, replace=False)]
        y = feats_b[rng.choice(len(feats_b), m, replace=False)]
        kxx = poly(x, x)
        kyy = poly(y, y)
        kxy = poly(x, y)
        # unbiased MMD^2: off-diagonal means for kxx/kyy
        sum_off = lambda k: (k.sum() - np.trace(k)) / (m * (m - 1))
        scores.append(sum_off(kxx) + sum_off(kyy) - 2.0 * kxy.mean())
    return float(np.mean(scores)), float(np.std(scores))


def fid_kid_between_image_sets(
    images_a: np.ndarray,
    images_b: np.ndarray,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 32,
    kid_subset_size: Optional[int] = None,
    kid_subsets: int = 100,
) -> Dict[str, float]:
    """End-to-end FID + KID between two (N, H, W, 3) image stacks in [0, 1]."""
    mu_a, sig_a, fa = compute_feature_stats(images_a, feature_fn, batch_size)
    mu_b, sig_b, fb = compute_feature_stats(images_b, feature_fn, batch_size)
    kid_mean, kid_std = kid_score(
        fa, fb, n_subsets=kid_subsets, subset_size=kid_subset_size
    )
    return {
        "fid": frechet_distance(mu_a, sig_a, mu_b, sig_b),
        "kid_mean": kid_mean,
        "kid_std": kid_std,
        "n_a": len(fa),
        "n_b": len(fb),
    }


def vgg_pooled_feature_fn(vgg_variables, min_input_size: int = 64):
    """A ready-made feature_fn: imported-VGG16 relu5_3 features, global
    average pooled (label resulting numbers "VGG-FID"/"VGG-KID").

    Inputs smaller than `min_input_size` are bilinearly upsampled first (the
    standard FID protocol resizes to the extractor's native size; VGG's four
    2x pools reduce relu5_3 to an EMPTY map below 16 px, which would silently
    pool to NaN)."""
    import jax
    import jax.numpy as jnp

    from .models.lpips import VGG16Features

    model = VGG16Features()

    @jax.jit
    def feats(v, x):
        B, H, W, C = x.shape
        if min(H, W) < min_input_size:
            # scale the SHORT side up to min_input_size, preserving aspect
            # ratio (a square max(H, W) resize would stretch non-square
            # renders and blow up the VGG forward on the long side)
            scale = min_input_size / min(H, W)
            nh = max(min_input_size, int(round(H * scale)))
            nw = max(min_input_size, int(round(W * scale)))
            x = jax.image.resize(x, (B, nh, nw, C), "bilinear")
        taps = model.apply(v, x)
        return jnp.mean(taps[-1], axis=(1, 2))

    return lambda imgs: np.asarray(
        feats(vgg_variables, jnp.asarray(imgs, jnp.float32))
    )


def inception_pooled_feature_fn(inception_variables):
    """The STANDARD FID feature_fn: FID-patched InceptionV3 pool3 (2048-d),
    inputs resized to 299² inside the model (models/inception.py). With the
    published pt_inception weights these are paper-comparable Inception-FID
    numbers; with random init it is a protocol smoke extractor."""
    import jax
    import jax.numpy as jnp

    from .models.inception import FIDInceptionV3

    model = FIDInceptionV3()

    @jax.jit
    def feats(v, x):
        return model.apply(v, x)

    return lambda imgs: np.asarray(
        feats(inception_variables, jnp.asarray(imgs, jnp.float32))
    )
