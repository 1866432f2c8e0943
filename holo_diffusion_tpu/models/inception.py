"""FID InceptionV3 feature extractor with torch-weight import.

The paper's headline sample-quality metric is Inception-FID/KID (reference
README.md:47 links the CVPR'23 paper; the released repo ships NO metric code).
The standard protocol (pytorch-fid / clean-fid) extracts 2048-d "pool3"
features from a specific InceptionV3 variant: torchvision's inception_v3
graph with the FID patches (all mixed-block average pools use
count_include_pad=False, and Mixed_7c's branch_pool is a MAX pool) and the
TF-ported weights file (pt_inception-2015-12-05). This module is that exact
architecture in flax/NHWC, inference-only.

Weights: zero-egress env, so `inception_params_from_torch` converts a
pytorch-fid-layout state_dict (torchvision inception naming:
`Mixed_5b.branch1x1.conv.weight`, `...bn.running_mean`, ...). Cross-framework
parity is tested against a torch-side functional forward with random weights
(tests/test_inception.py) — pointing the converter at the published
checkpoint yields the standard FID extractor.

Input contract: images (B, H, W, 3) in [0, 1]; resize to 299x299 bilinear
(antialias off, matching F.interpolate align_corners=False) and scale to
[-1, 1] happen inside when `resize_input`/`normalize_input` are set, exactly
like pytorch-fid's InceptionV3 wrapper.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_3x3_s1_nopad(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    — edge windows divide by the number of VALID taps, not 9."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def _max_pool_3x3_s1(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3, running stats) + relu — the
    torchvision BasicConv2d cell, inference mode."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, self.strides, padding=self.padding,
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


def _c(features, kernel, strides=(1, 1), padding=((0, 0), (0, 0)), name=None):
    return BasicConv2d(features, kernel, strides, padding, name=name)


_P1 = ((1, 1), (1, 1))
_P2 = ((2, 2), (2, 2))
_P_17 = ((0, 0), (3, 3))  # (1,7) kernel
_P_71 = ((3, 3), (0, 0))  # (7,1) kernel


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _c(64, (1, 1), name="branch1x1")(x)
        b5 = _c(48, (1, 1), name="branch5x5_1")(x)
        b5 = _c(64, (5, 5), padding=_P2, name="branch5x5_2")(b5)
        b3 = _c(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = _c(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(b3)
        b3 = _c(96, (3, 3), padding=_P1, name="branch3x3dbl_3")(b3)
        bp = _c(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool_3x3_s1_nopad(x)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _c(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = _c(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = _c(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = _c(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _c(192, (1, 1), name="branch1x1")(x)
        b7 = _c(c7, (1, 1), name="branch7x7_1")(x)
        b7 = _c(c7, (1, 7), padding=_P_17, name="branch7x7_2")(b7)
        b7 = _c(192, (7, 1), padding=_P_71, name="branch7x7_3")(b7)
        bd = _c(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = _c(c7, (7, 1), padding=_P_71, name="branch7x7dbl_2")(bd)
        bd = _c(c7, (1, 7), padding=_P_17, name="branch7x7dbl_3")(bd)
        bd = _c(c7, (7, 1), padding=_P_71, name="branch7x7dbl_4")(bd)
        bd = _c(192, (1, 7), padding=_P_17, name="branch7x7dbl_5")(bd)
        bp = _c(192, (1, 1), name="branch_pool")(_avg_pool_3x3_s1_nopad(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _c(192, (1, 1), name="branch3x3_1")(x)
        b3 = _c(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = _c(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = _c(192, (1, 7), padding=_P_17, name="branch7x7x3_2")(b7)
        b7 = _c(192, (7, 1), padding=_P_71, name="branch7x7x3_3")(b7)
        b7 = _c(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """use_max_pool: Mixed_7c in the FID net replaces the branch avg pool
    with a max pool (pytorch-fid FIDInceptionE_2 — matches the TF weights)."""

    use_max_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = _c(320, (1, 1), name="branch1x1")(x)
        b3 = _c(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                _c(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
                _c(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = _c(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = _c(384, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                _c(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
                _c(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        pooled = _max_pool_3x3_s1(x) if self.use_max_pool else _avg_pool_3x3_s1_nopad(x)
        bp = _c(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """images (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if self.resize_input and (H, W) != (299, 299):
            # F.interpolate(bilinear, align_corners=False) == jax.image.resize
            # "bilinear" (both use half-pixel centers, no antialias here)
            x = jax.image.resize(x, (B, 299, 299, C), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = _c(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = _c(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = _c(64, (3, 3), padding=_P1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _c(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = _c(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive_avg_pool2d(1) -> 2048


def inception_params_from_torch(state_dict) -> Dict:
    """pytorch-fid / torchvision inception state_dict -> flax variables.

    Accepts torch tensors or numpy arrays. Ignores the fc head and the
    AuxLogits tower (absent from the FID feature path)."""

    def as_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu()) \
            if hasattr(v, "detach") else np.asarray(v)

    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for name, v in state_dict.items():
        if name.startswith(("fc.", "AuxLogits.")):
            continue
        parts = name.split(".")
        *mods, cell, leaf = parts  # e.g. Mixed_5b, branch1x1, conv, weight
        path = tuple(mods) + (cell,)
        arr = as_np(v)
        if cell == "conv" and leaf == "weight":
            put(params, path + ("kernel",), jnp.asarray(
                arr.transpose(2, 3, 1, 0)))  # OIHW -> HWIO
        elif cell == "bn" and leaf == "weight":
            put(params, path + ("scale",), jnp.asarray(arr))
        elif cell == "bn" and leaf == "bias":
            put(params, path + ("bias",), jnp.asarray(arr))
        elif cell == "bn" and leaf == "running_mean":
            put(stats, path + ("mean",), jnp.asarray(arr))
        elif cell == "bn" and leaf == "running_var":
            put(stats, path + ("var",), jnp.asarray(arr))
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unmapped inception weight: {name}")
    return {"params": params, "batch_stats": stats}
