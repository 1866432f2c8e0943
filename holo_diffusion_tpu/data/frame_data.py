"""FrameData — the batch pytree fed to the model.

Rebuild of Implicitron `FrameData` (the subset HoloDiffusion touches:
image_rgb, camera, fg_probability, mask_crop, depth_map, sequence metadata;
reference use: holo_diffusion_model.py:201-213, flyaround.py:365-397).
Channels-last images. `sequence_id` is an int per frame (names are host-side
metadata; the model only needs same-sequence grouping, which the loader
guarantees within a batch).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..geometry.cameras import PerspectiveCameras


@struct.dataclass
class FrameData:
    camera: PerspectiveCameras
    image_rgb: Optional[jnp.ndarray] = None  # (B, H, W, 3) in [0, 1]
    fg_probability: Optional[jnp.ndarray] = None  # (B, H, W, 1)
    mask_crop: Optional[jnp.ndarray] = None  # (B, H, W, 1)
    depth_map: Optional[jnp.ndarray] = None  # (B, H, W, 1)
    sequence_id: Optional[jnp.ndarray] = None  # (B,) int32
    frame_timestamp: Optional[jnp.ndarray] = None  # (B,)
    # Compact-source mode (data/compact.py): when set, image_rgb/fg/mask_crop/
    # depth hold ONLY the n_targets render-target frames at full resolution,
    # and these hold the pooling-source frames pre-masked + pre-rescaled to
    # the feature extractor's input resolution (u8). `camera` still covers all
    # n_targets + n_sources frames, targets first. Cuts per-step H2D ~5x at
    # the release scale (33 @ 800^2 -> 6 @ 800^2 + 27 @ 256^2).
    src_image_rgb: Optional[jnp.ndarray] = None  # (S, h, w, 3) u8
    src_fg_probability: Optional[jnp.ndarray] = None  # (S, h, w, 1) u8
    src_mask_crop: Optional[jnp.ndarray] = None  # (S, h, w, 1) u8

    @property
    def batch_size(self) -> int:
        return self.camera.batch_size

    def __getitem__(self, idx) -> "FrameData":
        assert self.src_image_rgb is None, (
            "cannot frame-index a compact batch: targets and sources have "
            "different leading dims (slice before data.compact.compact_sources)"
        )
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return jax.tree.map(lambda x: x[idx], self)
