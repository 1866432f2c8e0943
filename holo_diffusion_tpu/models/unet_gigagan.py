"""GigaGAN-style UNet variants — rebuilds of the reference's remaining
in-repo (uninstantiated) capability surface (SURVEY.md §2.4):

  * `ResBlockGigaGAN` (unet.py:259-353): a ResBlock WITHOUT time embedding;
  * `AsymmetricUNetModel` (unet.py:840-1071): 2D super-resolution UNet with an
    asymmetric decoder (2x the encoder's blocks per level), no timestep input;
  * `QKVLocalAttention` (unet.py:462-513): windowed local attention — the
    reference's unfold-based 2D-only variant generalized to channels-last
    non-overlapping windows.

None of these are wired into the HoloDiffusion pipeline (matching the
reference, which never instantiates them); they complete the model-family
surface for SR-style extensions.
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
    Upsample3D,
    _resize_nearest_2x,
    _stride,
)

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


class ResBlockGigaGAN(nn.Module):
    """ResBlock with no time embedding (unet.py:259-353)."""

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    dims: int = 2
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_gn")(x)
        h = nn.silu(h)
        if self.up:
            h = _resize_nearest_2x(h, True, self.dims)
            x = _resize_nearest_2x(x, True, self.dims)
        elif self.down:
            s = _stride(self.dims, True)
            h = nn.avg_pool(h, s, s)
            x = nn.avg_pool(x, s, s)
        h = nn.Conv(
            self.out_channels, (3,) * self.dims, padding=1,
            kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype,
            name="in_conv",
        )(h)
        h = GroupNorm32(name="out_gn")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = nn.Conv(
            self.out_channels, (3,) * self.dims, padding=1,
            kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype,
            name="out_conv",
        )(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1,) * self.dims,
                kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype,
                name="skip_conv",
            )(x)
        return x + h


class QKVLocalAttention(nn.Module):
    """Non-overlapping windowed self-attention over 2D feature maps
    (generalization of the reference's unfold-based QKVLocalAttentionLegacy,
    unet.py:462-513). window must divide H and W."""

    num_heads: int = 1
    window: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        assert H % w == 0 and W % w == 0, "window must divide spatial dims"
        h = GroupNorm32(name="gn")(x)
        qkv = nn.Dense(3 * C, kernel_init=_xavier, bias_init=_zeros,
                       dtype=self.dtype, name="qkv")(h)
        # -> (B * n_windows, w*w, heads, 3ch)
        qkv = qkv.reshape(B, H // w, w, W // w, w, 3 * C)
        qkv = qkv.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, 3 * C)
        heads = self.num_heads
        ch = C // heads
        qkv = qkv.reshape(qkv.shape[0], w * w, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhts,bshc->bthc", weights, v)
        out = out.reshape(B, H // w, W // w, w, w, C)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        out = nn.Dense(C, kernel_init=_zeros, bias_init=_zeros,
                       dtype=self.dtype, name="proj")(out)
        return x + out


class AsymmetricUNetModel(nn.Module):
    """2D SR UNet: encoder with `num_res_blocks` per level, decoder with
    2x blocks per level, no timestep conditioning (unet.py:840-1071)."""

    in_channels: int = 3
    model_channels: int = 64
    out_channels: int = 3
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = ()
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 1
    dropout: float = 0.0
    decoder_blocks_multiplier: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        def res(out_ch, name):
            return ResBlockGigaGAN(
                out_channels=out_ch, dropout=self.dropout, dims=2,
                deterministic=deterministic, dtype=self.dtype, name=name,
            )

        h = nn.Conv(
            int(self.channel_mult[0] * self.model_channels), (3, 3), padding=1,
            kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype,
            name="in_conv",
        )(x.astype(self.dtype))

        hs = [h]
        ds = 1
        idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(int(mult * self.model_channels), f"input_{idx}_res")(h)
                if ds in self.attention_resolutions:
                    h = AttentionBlock3D(
                        num_heads=self.num_heads, dtype=self.dtype,
                        name=f"input_{idx}_attn",
                    )(h)
                hs.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample3D(out_channels=h.shape[-1], dims=2,
                                 dtype=self.dtype, name=f"input_{idx}_down")(h)
                hs.append(h)
                idx += 1
                ds *= 2

        h = res(h.shape[-1], "middle_res_0")(h)
        h = AttentionBlock3D(num_heads=self.num_heads, dtype=self.dtype,
                             name="middle_attn")(h)
        h = res(h.shape[-1], "middle_res_1")(h)

        idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                # asymmetric decoder: extra blocks per skip connection
                for j in range(self.decoder_blocks_multiplier):
                    h = res(
                        int(mult * self.model_channels),
                        f"output_{idx}_res{j}",
                    )(h)
                if ds in self.attention_resolutions:
                    h = AttentionBlock3D(
                        num_heads=self.num_heads, dtype=self.dtype,
                        name=f"output_{idx}_attn",
                    )(h)
                if level and i == self.num_res_blocks:
                    h = Upsample3D(out_channels=h.shape[-1], dims=2,
                                   dtype=self.dtype, name=f"output_{idx}_up")(h)
                    ds //= 2
                idx += 1

        h = GroupNorm32(name="out_gn")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype,
            name="out_conv",
        )(h)
