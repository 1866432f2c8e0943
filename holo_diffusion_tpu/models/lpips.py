"""LPIPS perceptual metric (VGG16 backbone) with torch-weight import.

The reference's config surface exposes `calc_lpips_loss` / `loss_lpips`
(unet_with_no_diffusion.yaml:183-185, old_base_config.yaml log_vars) via a
vestigial HoloDiffusionMetrics class; the released code ships no LPIPS
implementation. Here the metric is first-class: a flax VGG16 feature stack +
the standard LPIPS head (channel-unit-normalize -> squared diff -> 1x1
non-negative linear -> spatial mean -> sum over taps), matching the
reference LPIPS formulation (Zhang et al. 2018, lpips pip package v0.1 "vgg"
net) operation-for-operation so published weights load directly.

Weights: this environment has no pretrained VGG16 (zero egress), so
`lpips_params_from_torch` converts a torchvision-layout `vgg16().features`
state_dict plus the five LPIPS `lin` 1x1-conv weights. The conversion is
golden-tested against a torch-side forward with random weights
(tests/test_lpips.py) — pointing it at the published checkpoints yields the
standard metric.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features layer plan: conv indices and the ReLU tap points
# (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 = features idx 3,8,15,22,29)
VGG16_CHANNELS: Sequence[int] = (64, 64, "M", 128, 128, "M", 256, 256, 256,
                                 "M", 512, 512, 512, "M", 512, 512, 512)
TAPS_AFTER_CONV = (1, 3, 6, 9, 12)  # 0-based conv counter of each tap
TAP_DIMS = (64, 128, 256, 512, 512)

# LPIPS input normalization (lpips.ScalingLayer): inputs in [-1, 1]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the five LPIPS tap activations.

    Input: (B, H, W, 3) channels-last.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        conv_i = 0
        for spec in VGG16_CHANNELS:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(spec, (3, 3), padding=1, name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            if conv_i in TAPS_AFTER_CONV:
                taps.append(x)
            conv_i += 1
        return taps


def _unit_normalize(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + eps)


class LPIPS(nn.Module):
    """lpips(a, b): images (B, H, W, 3) in [0, 1] -> (B,) distances."""

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        vgg = VGG16Features(name="vgg")

        def prep(x):
            x = 2.0 * x - 1.0  # [0,1] -> [-1,1] (lpips normalize=True)
            return (x - _SHIFT) / _SCALE

        taps_a = vgg(prep(a))
        taps_b = vgg(prep(b))
        total = 0.0
        for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            d = (_unit_normalize(fa) - _unit_normalize(fb)) ** 2
            # the LPIPS "lin" head: 1x1 conv, no bias, non-negative weights
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            dist = jnp.sum(d * jnp.abs(w), axis=-1)  # (B, H, W)
            total = total + jnp.mean(dist, axis=(-2, -1))
        return total


def lpips_params_from_torch(
    vgg_features_sd: Dict[str, np.ndarray],
    lin_weights: Sequence[np.ndarray],
) -> Dict:
    """Build LPIPS params from torch tensors.

    vgg_features_sd: torchvision `vgg16().features.state_dict()` layout —
    `{idx}.weight` (O, I, kh, kw) and `{idx}.bias` per conv layer index in the
    sequential stack. lin_weights: five (1, C, 1, 1) or (C,) LPIPS lin-layer
    weights in tap order.
    """
    conv_positions = [i for i, s in enumerate(VGG16_CHANNELS) if s != "M"]
    # torchvision sequential indices of conv layers: conv at running position
    # counting convs + relus + pools
    seq_idx = []
    pos = 0
    for s in VGG16_CHANNELS:
        if s == "M":
            pos += 1
        else:
            seq_idx.append(pos)
            pos += 2  # conv + relu
    params = {"vgg": {}}
    for ci, si in enumerate(seq_idx):
        w = np.asarray(vgg_features_sd[f"{si}.weight"], np.float32)
        b = np.asarray(vgg_features_sd[f"{si}.bias"], np.float32)
        params["vgg"][f"conv{ci}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": jnp.asarray(b),
        }
    assert len(seq_idx) == len(conv_positions)
    for i, lw in enumerate(lin_weights):
        params[f"lin{i}"] = jnp.asarray(
            np.asarray(lw, np.float32).reshape(-1)
        )
    return {"params": params}


def load_lpips_from_torch_files(vgg_path: str, lin_path: str = None):
    """Build an LPIPS perceptual fn from torch checkpoint files.

    vgg_path: torchvision vgg16 state_dict (.pth) — keys `features.{i}.weight`
    or bare `{i}.weight`. lin_path: optional LPIPS head state_dict with
    `lin{k}.model.1.weight` (lpips package layout); all-ones head otherwise.
    """
    import torch

    sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    feats = {
        k[len("features."):]: v for k, v in sd.items() if k.startswith("features.")
    } or sd
    if lin_path:
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        lins = [
            np.asarray(lin_sd[f"lin{i}.model.1.weight"]).reshape(-1)
            for i in range(5)
        ]
    else:
        lins = [np.ones((c,), np.float32) for c in TAP_DIMS]
    return make_lpips_fn(lpips_params_from_torch(feats, lins))


def make_lpips_fn(variables):
    """Returns lpips(a, b) over (H, W, 3) numpy images in [0, 1] -> float."""
    import jax

    model = LPIPS()

    @jax.jit
    def fn(v, a, b):
        return model.apply(v, a[None], b[None])[0]

    return lambda a, b: float(
        fn(variables, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    )
