"""3D UNet denoiser — TPU-native rebuild of the guided_diffusion UNet
(reference: holo_diffusion/guided_diffusion/unet.py:566-837 + blocks 59-256,
356-459; wrapped by SimpleUnet3D, utils/diffusion_utils.py:41-86).

TPU-first choices:
  * channels-last NDHWC layout (XLA's native conv layout on TPU);
  * bfloat16 compute with float32 params and float32 GroupNorm/softmax
    islands (the reference keeps fp32 GroupNorm + fp32 softmax,
    nn.py:23-25 / unet.py:453 — we keep those islands and bf16 the matmuls);
  * `jax.checkpoint` (remat) on ResBlocks/attention instead of the
    reference's manual CheckpointFunction (nn.py:130-176);
  * attention over flattened voxels via einsum — at ds 4/8 on a 16^3 grid
    there are only 64/8 tokens (SURVEY.md §5), XLA dot_general is optimal.

Init matches SimpleUnet3D (diffusion_utils.py:77-80): xavier-uniform on every
conv/dense with zero bias (overriding guided_diffusion's zero-init out convs);
set `simple_init=False` for guided_diffusion's original init scheme.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# xavier_uniform == torch _xavier_init(gain=1)
_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, [cos | sin] order (nn.py:109-127)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32, cast back (nn.py:23-25, 99-106)."""

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="gn")(
            x.astype(jnp.float32)
        )
        return h.astype(orig_dtype)


def _resize_nearest_2x(x: jnp.ndarray, homogeneous: bool, dims: int = 3) -> jnp.ndarray:
    """Nearest-neighbor x2 upsampling (unet.py:92-103). Channels-last with
    `dims` spatial axes; for dims==3 the depth axis only scales when
    `homogeneous` (the reference's inner-two-dims default)."""
    if dims == 3:
        if homogeneous:
            x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return x
    for ax in range(1, dims + 1):
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _stride(dims: int, homogeneous: bool):
    if dims == 3 and not homogeneous:
        return (1, 2, 2)
    return (2,) * dims


class Upsample3D(nn.Module):
    out_channels: int
    use_conv: bool = True
    homogeneous: bool = True
    dims: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _resize_nearest_2x(x, self.homogeneous, self.dims)
        if self.use_conv:
            x = nn.Conv(
                self.out_channels,
                (3,) * self.dims,
                padding=1,
                kernel_init=_xavier,
                bias_init=_zeros,
                dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample3D(nn.Module):
    out_channels: int
    use_conv: bool = True
    homogeneous: bool = True
    dims: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = _stride(self.dims, self.homogeneous)
        if self.use_conv:
            return nn.Conv(
                self.out_channels,
                (3,) * self.dims,
                strides=stride,
                padding=1,
                kernel_init=_xavier,
                bias_init=_zeros,
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.avg_pool(x, stride, stride)


class ResBlock3D(nn.Module):
    """guided_diffusion ResBlock (unet.py:141-256): GN-SiLU-conv in,
    FiLM scale-shift from the time embedding, zero-or-xavier out conv,
    1x1 skip when channels change, optional fused up/down."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    homogeneous: bool = True
    simple_init: bool = True
    deterministic: bool = True
    dims: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_gn")(x)
        h = nn.silu(h)
        if self.up:
            h = _resize_nearest_2x(h, self.homogeneous, self.dims)
            x = _resize_nearest_2x(x, self.homogeneous, self.dims)
        elif self.down:
            s = _stride(self.dims, self.homogeneous)
            h = nn.avg_pool(h, s, s)
            x = nn.avg_pool(x, s, s)
        h = nn.Conv(
            self.out_channels,
            (3,) * self.dims,
            padding=1,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="in_conv",
        )(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="emb_dense",
        )(nn.silu(emb))
        emb_out = emb_out.reshape(
            emb_out.shape[0], *([1] * self.dims), emb_out.shape[-1]
        ).astype(h.dtype)

        out_conv_init = _xavier if self.simple_init else _zeros
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_gn")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_gn")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = nn.Conv(
            self.out_channels,
            (3,) * self.dims,
            padding=1,
            kernel_init=out_conv_init,
            bias_init=_zeros,
            dtype=self.dtype,
            name="out_conv",
        )(h)

        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels,
                (1,) * self.dims,
                kernel_init=_xavier,
                bias_init=_zeros,
                dtype=self.dtype,
                name="skip_conv",
            )(x)
        return x + h


class AttentionBlock3D(nn.Module):
    """Flattened-voxel self-attention (unet.py:356-406 + QKVAttentionLegacy
    429-459): GN -> 1x1 qkv conv -> head-first split, 1/sqrt(sqrt(d)) double
    scaling, f32 softmax -> zero-or-xavier out proj; residual."""

    num_heads: int = 1
    num_head_channels: int = -1
    simple_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        T = 1
        for sdim in spatial:
            T *= sdim
        heads = (
            self.num_heads
            if self.num_head_channels == -1
            else C // self.num_head_channels
        )
        ch = C // heads
        h = GroupNorm32(name="gn")(x).reshape(B, T, C)
        qkv = nn.Dense(
            3 * C, kernel_init=_xavier, bias_init=_zeros, dtype=self.dtype, name="qkv"
        )(h)
        # Legacy order: per-head contiguous [q; k; v] blocks
        # (unet.py:441-447: reshape(B*heads, 3*ch, T).split(ch)).
        qkv = qkv.reshape(B, T, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale, preferred_element_type=jnp.float32
        )
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshc->bthc", weights, v).reshape(B, T, C)
        proj_init = _xavier if self.simple_init else _zeros
        out = nn.Dense(
            C, kernel_init=proj_init, bias_init=_zeros, dtype=self.dtype, name="proj"
        )(out)
        return x + out.reshape(B, *spatial, C)


class UNetModel3D(nn.Module):
    """The full UNet (unet.py:566-837), 3D, channels-last.

    Config-surface fields mirror SimpleUnet3D (diffusion_utils.py:41-75):
    hydrant release config is model_channels=64, channel_mult=(1,1,2,4,8),
    attention at ds {4,8}, num_heads=2, scale-shift norm, homogeneous
    resampling, no zero-init last conv.
    """

    in_channels: int = 128
    model_channels: int = 64
    out_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 8)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 2
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    zero_last_conv: bool = False
    homogeneous_resample: bool = True
    simple_init: bool = True
    use_remat: bool = True
    dims: int = 3
    num_classes: int = 0  # class-conditional label embedding when > 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, cond_features=None, y=None,
                 deterministic: bool = True):
        """x: (B, D, H, W, C). cond_features concatenated on channels
        (diffusion_utils.py:82-86)."""
        if cond_features is not None:
            x = jnp.concatenate([x, cond_features], axis=-1)

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(
            self.model_channels * 4,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="time_dense_0",
        )(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(
            self.model_channels * 4,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="time_dense_1",
        )(emb)
        if self.num_classes:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(
                self.num_classes, self.model_channels * 4, name="label_emb"
            )(y)

        res_block = nn.remat(ResBlock3D) if self.use_remat else ResBlock3D
        attn_block = nn.remat(AttentionBlock3D) if self.use_remat else AttentionBlock3D

        def make_res(out_ch, name, **kw):
            return res_block(
                out_channels=out_ch,
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                homogeneous=self.homogeneous_resample,
                simple_init=self.simple_init,
                deterministic=deterministic,
                dims=self.dims,
                dtype=self.dtype,
                name=name,
                **kw,
            )

        def make_attn(name):
            return attn_block(
                num_heads=self.num_heads,
                num_head_channels=self.num_head_channels,
                simple_init=self.simple_init,
                dtype=self.dtype,
                name=name,
            )

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(
            ch,
            (3,) * self.dims,
            padding=1,
            kernel_init=_xavier,
            bias_init=_zeros,
            dtype=self.dtype,
            name="in_conv",
        )(h)

        # --- encoder
        hs = [h]
        ds = 1
        block_idx = 1  # mirrors torch input_blocks numbering (0 = in_conv)
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = make_res(
                    int(mult * self.model_channels), f"input_{block_idx}_res"
                )(h, emb)
                if ds in self.attention_resolutions:
                    h = make_attn(f"input_{block_idx}_attn")(h)
                hs.append(h)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample3D(
                    out_channels=h.shape[-1],
                    use_conv=self.conv_resample,
                    homogeneous=self.homogeneous_resample,
                    dims=self.dims,
                    dtype=self.dtype,
                    name=f"input_{block_idx}_down",
                )(h)
                hs.append(h)
                block_idx += 1
                ds *= 2

        # --- middle
        h = make_res(h.shape[-1], "middle_res_0")(h, emb)
        h = make_attn("middle_attn")(h)
        h = make_res(h.shape[-1], "middle_res_1")(h, emb)

        # --- decoder
        block_idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = make_res(
                    int(mult * self.model_channels), f"output_{block_idx}_res"
                )(h, emb)
                if ds in self.attention_resolutions:
                    h = make_attn(f"output_{block_idx}_attn")(h)
                if level and i == self.num_res_blocks:
                    h = Upsample3D(
                        out_channels=h.shape[-1],
                        use_conv=self.conv_resample,
                        homogeneous=self.homogeneous_resample,
                        dims=self.dims,
                        dtype=self.dtype,
                        name=f"output_{block_idx}_up",
                    )(h)
                    ds //= 2
                block_idx += 1

        h = h.astype(x.dtype)
        h = GroupNorm32(name="out_gn")(h)
        h = nn.silu(h)
        last_init = _zeros if self.zero_last_conv else _xavier
        h = nn.Conv(
            self.out_channels,
            (3,) * self.dims,
            padding=1,
            kernel_init=last_init,
            bias_init=_zeros,
            dtype=self.dtype,
            name="out_conv",
        )(h)
        return h
