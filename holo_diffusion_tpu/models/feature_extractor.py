"""ResNet34 multi-stage image feature extractor.

TPU-native rebuild of Implicitron's `ResNetFeatureExtractor` (reference config:
configs/base.yaml:163-166, hydrant.yaml:167-182 — resnet34, stages 1-4,
image_rescale 0.32, proj_dim 16, l2_norm, add_masks, add_images, pretrained
imagenet normalization). Channels-last NHWC. Pretrained torchvision weights
can be imported via `utils.torch_import_resnet` (optional — the reference uses
ImageNet-pretrained stems; we train from random init by default on TPU and
support import for parity runs).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_image

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

_RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides), padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn2",
        )(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="down_bn",
            )(residual)
        return nn.relu(y + residual)


class ResNetFeatureExtractor(nn.Module):
    """forward(images NHWC in [0,1], masks NHW1) -> dict of NHWC feature maps.

    Output dict keys follow Implicitron: "res_layer_{i}" per selected stage
    (projected to proj_dim and L2-normalized), plus "masks" / "images" when
    add_masks/add_images (sampled alongside features by the view sampler).
    """

    name_arch: str = "resnet34"
    stages: Tuple[int, ...] = (1, 2, 3, 4)
    normalize_image: bool = True
    image_rescale: float = 0.32
    first_max_pool: bool = True
    proj_dim: int = 16
    l2_norm: bool = True
    add_masks: bool = True
    add_images: bool = True
    feature_rescale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def get_feat_dims(self) -> int:
        """Total channel dim after the view sampler concatenates all entries."""
        d = len(self.stages) * self.proj_dim
        if self.add_masks:
            d += 1
        if self.add_images:
            d += 3
        return d

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        masks=None,
        train: bool = False,
        rescale_done: bool = False,
    ):
        """rescale_done: the caller already resized `images` to
        int(H_orig * image_rescale) on the host (compact-source batches,
        data/compact.py) — skip the on-device resize."""
        B, H, W, _ = images.shape
        out: Dict[str, jnp.ndarray] = {}
        if self.add_images:
            out["images"] = images
        if self.add_masks and masks is not None:
            out["masks"] = masks

        x = images
        if self.image_rescale != 1.0 and not rescale_done:
            x = resize_image(
                x, int(H * self.image_rescale), int(W * self.image_rescale)
            )
        if self.normalize_image:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        x = x.astype(self.dtype)

        x = nn.Conv(
            64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="stem_bn",
        )(x)
        x = nn.relu(x)
        if self.first_max_pool:
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        layers = _RESNET_LAYERS[self.name_arch]
        widths = (64, 128, 256, 512)
        max_stage = max(self.stages)
        for li, (n_blocks, width) in enumerate(zip(layers, widths), start=1):
            if li > max_stage:
                break  # later layers are never read — skip the compute
            for bi in range(n_blocks):
                strides = 2 if (bi == 0 and li > 1) else 1
                x = BasicBlock(
                    width, strides, dtype=self.dtype, name=f"layer{li}_block{bi}"
                )(x, train)
            if li in self.stages:
                f = x
                if self.proj_dim > 0:
                    f = nn.Conv(
                        self.proj_dim, (1, 1), dtype=self.dtype,
                        name=f"proj_layer{li}",
                    )(f)
                if self.l2_norm:
                    f = f / jnp.maximum(
                        jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6
                    )
                out[f"res_layer_{li}"] = f.astype(jnp.float32) * self.feature_rescale
        return out
