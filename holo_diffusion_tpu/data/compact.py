"""Compact-source batches: host-side preprocess + rescale of pooling sources.

The training batch is `n_targets` render targets + S pooling sources (the
reference feeds ALL frames to the device at full resolution and rescales the
sources inside the feature extractor, resnet.py image_rescale — a reasonable
layout over CUDA-local PCIe). On a host-fed TPU the full-res batch is the
bottleneck: at the release scale (33 @ 800^2, hydrant.yaml) a step's H2D is
~147 MB while the device step itself is ~0.35 s, so the wire — not the MXU —
paces real training. Only the targets need full resolution (the photometric
loss samples ground truth at per-ray positions, metrics.py:_sample_at_rays);
the sources are consumed by the ResNet extractor AFTER a 0.32x rescale.

This module moves the source-side preprocessing (fg binarize + white-bg
composite, feature_extractor rescale) to the HOST, before transfer, then
re-quantizes to uint8. Per-step H2D at release scale drops ~147 MB -> ~30 MB.

Two host resize kernels (`host_resize`):
  * "native" (default): the C++ bilinear crop/resize the CO3D loader already
    uses for box-crop (native/csrc) — ~0.1 s/batch on one host core, and the
    same non-antialiased bilinear semantics as the reference's
    torch `F.interpolate` rescale (implicitron resnet extractor);
  * "exact": the jitted `resize_image` (jax) the on-device extractor applies
    — kernel-exact vs the full-res device path (and, since resize_image went
    antialias=False, also torch-`F.interpolate`-exact), but measured
    2-6 s/batch on a 1-core host (jax.image.resize on CPU), which would pace
    the loop.

Approximation note (documented, opt-in via the `compact_sources` config key):
the extractor also exposes its raw input "images"/"masks" to the view sampler
at input resolution (feature_extractor.py:99-102); in compact mode those 4 of
68 pooled channels are sampled from the 0.32x-prefiltered maps instead of the
full-res originals, and u8 re-quantization adds <=0.2% per-pixel error. The
ResNet feature channels are exact modulo that quantization (both modes share
the reference's non-antialiased bilinear since resize_image went
antialias=False; "native" differs from "exact" only by float rounding in the
C++ kernel).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize_image
from .frame_data import FrameData


def _to_unit_f32_np(x) -> Optional[np.ndarray]:
    """Host mirror of models.metrics.as_unit_float (u8 -> f32/255)."""
    if x is None:
        return None
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return x.astype(np.float32)


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_h", "out_w", "mask_images", "mask_threshold", "bg_color",
        "has_fg", "has_mc",
    ),
)
def _compact_kernel(
    img, fg, mc, *, out_h, out_w, mask_images, mask_threshold, bg_color,
    has_fg, has_mc,
):
    """Source preprocess exactly as the device path orders it
    (holo_model.__call__ preprocess_input -> extractor resize): binarize fg,
    composite onto bg_color, THEN rescale. f32 in, u8 out."""
    fg_out = mc_out = None
    if has_fg:
        fg_bin = (fg > mask_threshold).astype(jnp.float32)
        if mask_images:
            bg = jnp.asarray(bg_color, jnp.float32)
            img = img * fg_bin + bg * (1.0 - fg_bin)
        fg_out = _quantize_u8(resize_image(fg_bin, out_h, out_w))
    img_out = _quantize_u8(resize_image(img, out_h, out_w))
    if has_mc:
        mc_out = _quantize_u8(resize_image(mc, out_h, out_w))
    return img_out, fg_out, mc_out


class SourceCompactor:
    """Callable batch transform: FrameData -> compact FrameData.

    Runs on the host CPU backend (safe to call from the AsyncLoader worker
    thread while the TPU computes). `n_train_target_views`, masking params and
    `image_rescale` must mirror the model config — build via `from_model`.
    """

    def __init__(
        self,
        n_train_target_views: int,
        image_rescale: float,
        mask_images: bool,
        mask_threshold: float,
        bg_color,
        drop_depth: bool = False,
        host_resize: str = "native",
    ):
        assert host_resize in ("native", "exact"), host_resize
        self.n_train_target_views = n_train_target_views
        self.image_rescale = float(image_rescale)
        self.mask_images = bool(mask_images)
        self.mask_threshold = float(mask_threshold)
        self.bg_color = tuple(float(c) for c in np.asarray(bg_color).reshape(-1))
        self.drop_depth = bool(drop_depth)
        self.host_resize = host_resize
        if host_resize == "native":
            from ..native import get_lib

            if get_lib() is None:  # no native build -> exact jax path
                self.host_resize = "exact"
        self._cpu = jax.devices("cpu")[0]

    @classmethod
    def from_model(
        cls, model, drop_depth: bool = False, host_resize: str = "native"
    ) -> "SourceCompactor":
        rescale = (model.image_feature_extractor_args or {}).get(
            "image_rescale", 0.32
        )
        return cls(
            n_train_target_views=model.n_train_target_views,
            image_rescale=rescale,
            mask_images=model.mask_images,
            mask_threshold=model.mask_threshold,
            bg_color=model.bg_color,
            drop_depth=drop_depth,
            host_resize=host_resize,
        )

    def n_targets(self, batch_size: int) -> int:
        """Mirror holo_model.__call__'s training split exactly."""
        nt = (
            batch_size
            if self.n_train_target_views <= 0
            else min(self.n_train_target_views, batch_size)
        )
        if batch_size <= nt:
            nt = 1
        return nt

    def _compact_exact(self, img_u8, fg_u8, mc_u8, out_h, out_w):
        """jax-CPU path: the same `resize_image` kernel as the device."""
        img = _to_unit_f32_np(img_u8)
        fg = _to_unit_f32_np(fg_u8)
        mc = _to_unit_f32_np(mc_u8)
        with jax.default_device(self._cpu):
            img_c, fg_c, mc_c = _compact_kernel(
                img,
                jnp.zeros((1, 1, 1, 1)) if fg is None else fg,
                jnp.zeros((1, 1, 1, 1)) if mc is None else mc,
                out_h=out_h,
                out_w=out_w,
                mask_images=self.mask_images,
                mask_threshold=self.mask_threshold,
                bg_color=self.bg_color,
                has_fg=fg is not None,
                has_mc=mc is not None,
            )
        to_np = lambda x: None if x is None else np.asarray(x)
        return to_np(img_c), to_np(fg_c), to_np(mc_c)

    def _compact_native(self, img_u8, fg_u8, mc_u8, out_h, out_w):
        """Fused C++ path (~60-100 ms/batch at release scale): the composite
        is applied per bilinear corner read inside `hd_compact_source_batch_u8`
        — semantically mask@full-res THEN resize (the reference preprocess
        order) with no full-res intermediate (a numpy `where` over
        33x800^2x3 alone costs seconds on a 1-core host)."""
        from ..native import compact_source_batch_u8, crop_resize_batch_u8

        as_u8 = lambda x: (
            None
            if x is None
            else (
                np.asarray(x)
                if np.asarray(x).dtype == np.uint8
                else np.clip(
                    np.round(np.asarray(x, np.float32) * 255.0), 0, 255
                ).astype(np.uint8)
            )
        )
        img = as_u8(img_u8)
        fg = as_u8(fg_u8)
        mc = as_u8(mc_u8)
        S, H, W = img.shape[:3]
        out = compact_source_batch_u8(
            img, fg, (out_h, out_w), self.mask_threshold, self.bg_color,
            self.mask_images,
        )
        img_c, fg_c = out
        mc_c = None
        if mc is not None:
            boxes = np.tile(np.array([0, 0, W, H], np.int32), (S, 1))
            mc_f = crop_resize_batch_u8(
                list(mc), boxes, (out_h, out_w), scale=1.0
            )
            mc_c = np.clip(np.round(mc_f), 0, 255).astype(np.uint8)
        return img_c, fg_c, mc_c

    def compact_frames(self, img, fg, mc):
        """Compact a stack of frames directly (no target/source split): the
        per-frame kernel `SourceCompactor.__call__` applies to batch sources.
        Returns (img_u8, fg_u8, mc_u8) at the extractor input resolution."""
        img = np.asarray(img)
        H, W = img.shape[1:3]
        out_h = int(H * self.image_rescale)
        out_w = int(W * self.image_rescale)
        fn = (
            self._compact_native
            if self.host_resize == "native"
            else self._compact_exact
        )
        return fn(
            img,
            None if fg is None else np.asarray(fg),
            None if mc is None else np.asarray(mc),
            out_h,
            out_w,
        )

    def __call__(self, batch: FrameData) -> FrameData:
        if batch.image_rgb is None or batch.src_image_rgb is not None:
            return batch  # nothing to compact / already compact
        B = batch.batch_size
        nt = self.n_targets(B)
        if B <= nt:
            return batch  # no separate sources to compact
        img = np.asarray(batch.image_rgb)[nt:]
        fg = (
            None
            if batch.fg_probability is None
            else np.asarray(batch.fg_probability)[nt:]
        )
        mc = (
            None
            if batch.mask_crop is None
            else np.asarray(batch.mask_crop)[nt:]
        )
        img_c, fg_c, mc_c = self.compact_frames(img, fg, mc)

        def tgt(x):
            return None if x is None else np.asarray(x)[:nt]

        return FrameData(
            camera=batch.camera,  # all frames' cameras, targets first
            image_rgb=tgt(batch.image_rgb),
            fg_probability=tgt(batch.fg_probability),
            mask_crop=tgt(batch.mask_crop),
            depth_map=None if self.drop_depth else tgt(batch.depth_map),
            sequence_id=batch.sequence_id,
            frame_timestamp=batch.frame_timestamp,
            src_image_rgb=img_c,
            src_fg_probability=fg_c,
            src_mask_crop=mc_c,
        )


class CompactSceneSampler:
    """SceneDataset wrapper with a per-scene compact-source cache.

    `SourceCompactor` as a batch transform recomputes the mask + composite +
    0.32x rescale of every pooling source on every batch (~0.1-0.2 s/batch on
    a 1-core host) — at the release scale that host work, not the device
    step, paces real training (bench r3: e2e 3.0 steps/s vs a ~10 steps/s
    device-step ceiling). But compaction is deterministic PER FRAME, and the
    same-sequence recipe re-touches each scene's frames thousands of times
    per epoch (hydrant.yaml: 8000 iters/epoch over ~50 sequences — the
    reference pays the analogous rescale inside the extractor on-GPU every
    step, resnet.py image_rescale). So: compact each scene ONCE on first
    touch (native C++ kernel over all its frames), LRU-cache the result, and
    assemble batches as full-res targets + cached compact sources.

    Byte-identical to `compactor(dataset.sample_batch(rng, B))` with the same
    rng (identical rng consumption order; per-frame determinism), tested by
    tests/test_compact.py::test_compact_scene_sampler_matches_transform.
    """

    def __init__(self, dataset, compactor: SourceCompactor,
                 max_cached_scenes: int = 4):
        from collections import OrderedDict

        self.dataset = dataset
        self.compactor = compactor
        self._max_cached = int(max_cached_scenes)
        self._cache: "OrderedDict[int, tuple]" = OrderedDict()

    def __len__(self):
        return len(self.dataset)

    def _get_scene(self, s: int) -> FrameData:
        ds = self.dataset
        if hasattr(ds, "get_scene"):
            return ds.get_scene(s)
        return ds.scenes[s]

    def _compact_scene(self, s: int, scene: FrameData):
        if s not in self._cache:
            self._cache[s] = self.compactor.compact_frames(
                scene.image_rgb, scene.fg_probability, scene.mask_crop
            )
            if self._max_cached > 0 and len(self._cache) > self._max_cached:
                self._cache.popitem(last=False)  # LRU evict
        else:
            self._cache.move_to_end(s)
        return self._cache[s]

    def sample_batch(
        self, rng: np.random.RandomState, batch_size: int
    ) -> FrameData:
        # exact rng-consumption mirror of SceneDataset/CO3DSceneDataset
        # .sample_batch: one randint (scene), one choice (frames)
        s = int(rng.randint(len(self.dataset)))
        scene = self._get_scene(s)
        n = scene.batch_size
        replace = n < batch_size
        idx = rng.choice(
            n,
            size=batch_size if replace else min(batch_size, n),
            replace=replace,
        )
        comp = self.compactor
        nt = comp.n_targets(len(idx))
        if scene.image_rgb is None or len(idx) <= nt:
            # mirror SourceCompactor.__call__'s no-op cases
            batch = jax.tree.map(lambda x: np.asarray(x)[idx], scene)
            return comp(batch)
        img_c, fg_c, mc_c = self._compact_scene(s, scene)
        ti, si, idx = idx[:nt], idx[nt:], np.asarray(idx)

        def take(x, which):
            return None if x is None else np.asarray(x)[which]

        return FrameData(
            camera=jax.tree.map(lambda x: np.asarray(x)[idx], scene.camera),
            image_rgb=take(scene.image_rgb, ti),
            fg_probability=take(scene.fg_probability, ti),
            mask_crop=take(scene.mask_crop, ti),
            depth_map=(
                None if comp.drop_depth else take(scene.depth_map, ti)
            ),
            sequence_id=take(scene.sequence_id, idx),
            frame_timestamp=take(scene.frame_timestamp, idx),
            src_image_rgb=take(img_c, si),
            src_fg_probability=take(fg_c, si),
            src_mask_crop=take(mc_c, si),
        )
