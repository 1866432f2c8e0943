"""UNet capability-surface variants — rebuilds of the reference's in-repo
(uninstantiated) models (SURVEY.md §2.4 "Unused variants"):

  * `SuperResModel` (unet.py:1073-1087): UNet conditioned on an upsampled
    low-resolution input concatenated on channels;
  * `EncoderUNetModel` (unet.py:1090-1286): encoder half of the UNet with
    adaptive / attention / spatial pooling heads (classifier backbone);
  * `AttentionPool2d` (unet.py:27-56): CLIP-style attention pooling.

All reuse the generalized `dims`-parameterized blocks from unet3d.py
(channels-last, bf16-ready).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet3d import (
    AttentionBlock3D,
    Downsample3D,
    GroupNorm32,
    ResBlock3D,
    UNetModel3D,
    timestep_embedding,
)

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


class SuperResModel(nn.Module):
    """UNet over (x ++ upsample(low_res)) (unet.py:1073-1087)."""

    unet: UNetModel3D

    @nn.compact
    def __call__(self, x, timesteps, low_res, **kwargs):
        target_shape = x.shape[1:-1]
        upsampled = jax.image.resize(
            low_res,
            (x.shape[0], *target_shape, low_res.shape[-1]),
            method="bilinear",
        )
        return self.unet(x, timesteps, cond_features=upsampled, **kwargs)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling over flattened spatial positions with a
    learned positional embedding and the mean token as query
    (unet.py:27-56)."""

    embed_dim: int
    num_heads: int = 1
    output_dim: int = 0

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[-1]
        T = 1
        for s in x.shape[1:-1]:
            T *= s
        h = x.reshape(B, T, C)
        mean = jnp.mean(h, axis=1, keepdims=True)
        h = jnp.concatenate([mean, h], axis=1)  # (B, T+1, C)
        pos = self.param(
            "positional_embedding",
            lambda k, s: jax.random.normal(k, s) / (C**0.5),
            (T + 1, C),
        )
        h = h + pos[None]
        qkv = nn.Dense(3 * self.embed_dim, name="qkv_proj")(h)
        heads = self.num_heads
        ch = self.embed_dim // heads
        qkv = qkv.reshape(B, T + 1, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, T + 1, self.embed_dim)
        out = nn.Dense(
            self.output_dim or self.embed_dim, name="c_proj"
        )(out)
        return out[:, 0]  # the pooled (mean-query) token


class EncoderUNetModel(nn.Module):
    """The encoder half of the UNet with a pooled classification head
    (unet.py:1090-1286). pool: 'adaptive' | 'attention' | 'spatial'."""

    in_channels: int = 3
    model_channels: int = 64
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 1
    use_scale_shift_norm: bool = True
    pool: str = "adaptive"
    dims: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps):
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(self.model_channels * 4, name="time_dense_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.model_channels * 4, name="time_dense_1")(emb)

        def res(out_ch, name, **kw):
            return ResBlock3D(
                out_channels=out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                homogeneous=True,
                dims=self.dims,
                dtype=self.dtype,
                name=name,
                **kw,
            )

        h = nn.Conv(
            int(self.channel_mult[0] * self.model_channels),
            (3,) * self.dims,
            padding=1,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="in_conv",
        )(x.astype(self.dtype))

        ds = 1
        idx = 1
        spatial_feats = []
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(int(mult * self.model_channels), f"input_{idx}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock3D(
                        num_heads=self.num_heads, dtype=self.dtype,
                        name=f"input_{idx}_attn",
                    )(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample3D(
                    out_channels=h.shape[-1], dims=self.dims, dtype=self.dtype,
                    name=f"input_{idx}_down",
                )(h)
                idx += 1
                ds *= 2
            if self.pool == "spatial":
                spatial_feats.append(
                    jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))
                )

        h = res(h.shape[-1], "middle_res_0")(h, emb)
        h = AttentionBlock3D(
            num_heads=self.num_heads, dtype=self.dtype, name="middle_attn"
        )(h)
        h = res(h.shape[-1], "middle_res_1")(h, emb)

        if self.pool == "adaptive":
            h = GroupNorm32(name="out_gn")(h)
            h = nn.silu(h)
            h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))  # global avg
            return nn.Dense(self.out_channels, name="out_dense")(h)
        if self.pool == "attention":
            h = GroupNorm32(name="out_gn")(h)
            h = nn.silu(h)
            return AttentionPool2d(
                embed_dim=h.shape[-1],
                num_heads=self.num_heads,
                output_dim=self.out_channels,
                name="attn_pool",
            )(h)
        if self.pool == "spatial":
            spatial_feats.append(jnp.mean(h, axis=tuple(range(1, h.ndim - 1))))
            h = jnp.concatenate(spatial_feats, axis=-1)
            h = nn.Dense(2048, name="spatial_dense_0")(h)
            h = nn.relu(h)
            return nn.Dense(self.out_channels, name="spatial_dense_1")(h)
        raise ValueError(f"unknown pool {self.pool}")
