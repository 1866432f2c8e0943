"""CO3Dv2 dataset loader.

TPU-native rebuild of the used subset of Implicitron's
JsonIndexDatasetMapProviderV2 / JsonIndexDataset + SequenceDataLoaderMapProvider
(reference config surface: configs/base.yaml:23-70 — frame/sequence `.jgz`
annotations, `set_lists/set_lists_{subset}.json` splits, box-crop by mask
(thr 0.4, context 0.3), square resize, same-sequence batches, fg masks,
depth maps). Host-side numpy/PIL pipeline feeding device-sharded FrameData.

Camera conventions: CO3D stores pytorch3d cameras with NDC intrinsics in
either "ndc_norm_image_bounds" (per-axis) or "ndc_isotropic" (min-side)
format; we convert everything to isotropic square NDC (our PerspectiveCameras
convention) and rewrite intrinsics through the box crop + resize.
"""
from __future__ import annotations

import gzip
import json
import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import PerspectiveCameras
from .frame_data import FrameData
from .source import SceneDataset

logger = logging.getLogger(__name__)


@dataclass
class CO3DFrame:
    sequence_name: str
    frame_number: int
    frame_timestamp: float
    image_path: str
    image_size_hw: Tuple[int, int]
    mask_path: Optional[str]
    depth_path: Optional[str]
    depth_scale_adjustment: float
    R: np.ndarray  # (3, 3)
    T: np.ndarray  # (3,)
    focal_length: np.ndarray  # (2,) NDC (isotropic)
    principal_point: np.ndarray  # (2,) NDC (isotropic)
    mask_mass: Optional[float] = None  # fg pixel count from the annotation


def _to_isotropic_ndc(
    focal: np.ndarray, pp: np.ndarray, size_hw: Tuple[int, int], fmt: str
):
    """Convert CO3D viewpoint intrinsics to isotropic (min-side) NDC."""
    H, W = size_hw
    if fmt == "ndc_isotropic":
        return focal, pp
    # ndc_norm_image_bounds: each axis normalized by its own half-extent
    s = min(H, W)
    scale = np.array([W / s, H / s], np.float64)
    return focal * scale, pp * scale


def load_frame_annotations(category_root: str) -> List[CO3DFrame]:
    """Parse `{category}/frame_annotations.jgz`."""
    path = os.path.join(category_root, "frame_annotations.jgz")
    with gzip.open(path, "rt") as f:
        raw = json.load(f)
    frames = []
    for fa in raw:
        vp = fa["viewpoint"]
        size_hw = tuple(fa["image"]["size"])
        focal = np.asarray(vp["focal_length"], np.float64)
        pp = np.asarray(vp["principal_point"], np.float64)
        fmt = vp.get("intrinsics_format", "ndc_norm_image_bounds")
        focal, pp = _to_isotropic_ndc(focal, pp, size_hw, fmt)
        depth = fa.get("depth") or {}
        mask = fa.get("mask") or {}
        frames.append(
            CO3DFrame(
                sequence_name=fa["sequence_name"],
                frame_number=fa["frame_number"],
                frame_timestamp=fa.get("frame_timestamp", 0.0),
                image_path=fa["image"]["path"],
                image_size_hw=size_hw,
                mask_path=mask.get("path"),
                depth_path=depth.get("path"),
                depth_scale_adjustment=depth.get("scale_adjustment", 1.0),
                R=np.asarray(vp["R"], np.float32),
                T=np.asarray(vp["T"], np.float32),
                focal_length=focal.astype(np.float32),
                principal_point=pp.astype(np.float32),
                mask_mass=mask.get("mass"),
            )
        )
    return frames


def load_set_lists(category_root: str, subset_name: str) -> Dict[str, List]:
    path = os.path.join(
        category_root, "set_lists", f"set_lists_{subset_name}.json"
    )
    with open(path) as f:
        return json.load(f)


def load_eval_batches_file(
    category_root: str, subset_name: str
) -> Optional[List[List]]:
    """CO3Dv2 challenge eval batches: `eval_batches/eval_batches_{subset}.json`
    is a list of batches of [sequence_name, frame_number, image_path]; the
    first entry of each batch is the eval TARGET, the rest are the known
    source frames (reference base.yaml:31 `load_eval_batches: true`)."""
    path = os.path.join(
        category_root, "eval_batches", f"eval_batches_{subset_name}.json"
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# image loading + box crop
# ---------------------------------------------------------------------------


def mask_bbox(mask: np.ndarray, thr: float = 0.4) -> Optional[Tuple[int, int, int, int]]:
    """Tight (x0, y0, x1, y1) box around mask > thr (exclusive upper)."""
    ys, xs = np.where(mask > thr)
    if len(xs) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def expand_bbox(
    box: Tuple[int, int, int, int], context: float, size_hw: Tuple[int, int]
) -> Tuple[int, int, int, int]:
    """Grow the box by `context` * its size on each side, clamp to the image
    (box_crop_context, configs/base.yaml:52)."""
    H, W = size_hw
    x0, y0, x1, y1 = box
    w, h = x1 - x0, y1 - y0
    dx, dy = int(round(w * context)), int(round(h * context))
    return (
        max(0, x0 - dx),
        max(0, y0 - dy),
        min(W, x1 + dx),
        min(H, y1 + dy),
    )


def crop_intrinsics(
    focal: np.ndarray,
    pp: np.ndarray,
    orig_hw: Tuple[int, int],
    box: Tuple[int, int, int, int],
):
    """Rewrite isotropic-NDC intrinsics through a pixel-space crop.

    Derivation: with half-scale s = min(H, W) / 2 and pixel center c, the
    projection in pixels is x_px = c_x - s * (f * X/Z + p). A crop changes
    (c, s) -> (c', s'); matching x_px gives
      f' = f * s / s',   p' = (p * s + (c' - c)) / s'   (x sign flipped).
    """
    H, W = orig_hw
    x0, y0, x1, y1 = box
    s = min(H, W) / 2.0
    s2 = min(y1 - y0, x1 - x0) / 2.0
    c = np.array([(W - 1) / 2.0, (H - 1) / 2.0])
    c2 = np.array([(x0 + x1 - 1) / 2.0, (y0 + y1 - 1) / 2.0])
    # matching x_px = c_x - s*(f*u + p) inside the crop gives:
    focal2 = focal * s / s2
    pp2 = pp * (s / s2) + (c2 - c) / s2
    return focal2.astype(np.float32), pp2.astype(np.float32)


def _load_mask(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32) / 255.0


def _load_depth(path: str, scale: float) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        d = np.asarray(im)
    if d.dtype == np.uint16:
        # CO3D depth: float16 bits stored in a uint16 png
        d = d.view(np.float16).astype(np.float32)
    else:
        d = d.astype(np.float32)
    return d * scale


def _resize(img: np.ndarray, hw: Tuple[int, int], nearest: bool = False) -> np.ndarray:
    from PIL import Image

    H, W = hw
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if img.ndim == 2:
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((W, H), mode), np.float32)
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((W, H), mode), np.float32) / 255.0


def _decode_pool_width(n_workers: int) -> int:
    """Effective cold-decode pool width: `num_workers` capped by the CPUs
    actually available — on a 1-core host threads only thrash the GIL
    (measured 12 -> 4 frames/s), while on multi-core hosts PIL/ctypes release
    the GIL and the pool parallelizes the decode like the reference's worker
    processes. HD_DECODE_POOL_WIDTH overrides (tests force the pool path)."""
    env = os.environ.get("HD_DECODE_POOL_WIDTH")
    if env:
        return max(1, int(env))
    try:
        n_cpus = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        n_cpus = os.cpu_count() or 1
    return max(1, min(int(n_workers), n_cpus))


def _quant_u8(a: np.ndarray) -> np.ndarray:
    """unit-float -> uint8, the compact-cache quantization (round-half-even
    like numpy; the native u8 kernel replicates this bit-exactly)."""
    return np.clip(
        np.round(np.asarray(a, np.float32) * 255.0), 0, 255
    ).astype(np.uint8)


def load_frame_data(
    frame: CO3DFrame,
    dataset_root: str,
    image_height: int = 800,
    image_width: int = 800,
    box_crop: bool = True,
    box_crop_mask_thr: float = 0.4,
    box_crop_context: float = 0.3,
    load_depths: bool = True,
    compact: bool = False,
):
    """Load one frame: image/mask/depth cropped to the fg box and resized to a
    square; intrinsics rewritten through the crop. Returns dict of numpy.

    compact: emit the compact host-cache dtypes DIRECTLY (uint8 image/mask,
    float16 depth, uint8 mask_crop) instead of f32 — the native kernel writes
    u8 without the f32 intermediate and the stacked-scene re-quantization
    that used to cost ~45% of a cold scene load on a 1-core host (round-5
    cold-loader profile); values are bit-identical to quantizing the f32
    path after the fact."""
    from PIL import Image

    from ..native import crop_resize_u8, crop_resize_u8_out

    with Image.open(os.path.join(dataset_root, frame.image_path)) as im:
        img_u8 = np.asarray(im.convert("RGB"))
    H0, W0 = img_u8.shape[:2]
    img = None  # materialized lazily (native path crops from uint8 directly)
    mask = (
        _load_mask(os.path.join(dataset_root, frame.mask_path))
        if frame.mask_path
        else np.ones((H0, W0), np.float32)
    )
    depth = None
    if load_depths and frame.depth_path:
        try:
            depth = _load_depth(
                os.path.join(dataset_root, frame.depth_path),
                frame.depth_scale_adjustment,
            )
        except Exception:
            depth = None

    focal, pp = frame.focal_length.copy(), frame.principal_point.copy()
    box = None
    if box_crop:
        box = mask_bbox(mask, box_crop_mask_thr)
        if box is not None:
            box = expand_bbox(box, box_crop_context, (H0, W0))
            x0, y0, x1, y1 = box
            mask = mask[y0:y1, x0:x1]
            if depth is not None:
                depth = depth[y0:y1, x0:x1]
            focal, pp = crop_intrinsics(focal, pp, (H0, W0), box)
    if box is None:
        box = (0, 0, W0, H0)

    # native C++ crop+resize when the box is square-ish and no padding is
    # needed; otherwise fall back to the PIL path below
    h_box, w_box = box[3] - box[1], box[2] - box[0]
    native_img = None
    if h_box == w_box:
        native_img = (
            crop_resize_u8_out(img_u8, box, (image_height, image_width))
            if compact
            else crop_resize_u8(img_u8, box, (image_height, image_width))
        )
    if native_img is None:
        img = np.asarray(img_u8, np.float32)[box[1]:box[3], box[0]:box[2]] / 255.0
    else:
        img = native_img

    # pad to square before resize so isotropic NDC stays valid
    h, w = mask.shape[:2]
    if h != w:
        size = max(h, w)
        pad_y, pad_x = (size - h) // 2, (size - w) // 2
        def pad(a, fill=0.0):
            out = np.full((size, size) + a.shape[2:], fill, a.dtype)
            out[pad_y:pad_y + h, pad_x:pad_x + w] = a
            return out
        # intrinsics through the pad: old center lands at pad + (wh-1)/2
        s_old = min(h, w) / 2.0
        s_new = size / 2.0
        c_old_in_new = np.array([pad_x + (w - 1) / 2.0, pad_y + (h - 1) / 2.0])
        c_new = np.array([(size - 1) / 2.0, (size - 1) / 2.0])
        focal = focal * s_old / s_new
        pp = pp * (s_old / s_new) + (c_old_in_new - c_new) / s_new
        if native_img is None:
            img = pad(img)
        mask = pad(mask)
        if depth is not None:
            depth = pad(depth)

    if native_img is None:
        img = _resize(img, (image_height, image_width))
    mask = _resize(mask, (image_height, image_width))
    if depth is not None:
        depth = _resize(depth, (image_height, image_width), nearest=True)
    else:
        depth = np.zeros((image_height, image_width), np.float32)

    if compact:
        if img.dtype != np.uint8:  # PIL fallback path
            img = _quant_u8(img)
        return dict(
            image_rgb=img,
            fg_probability=_quant_u8(mask)[..., None],
            mask_crop=np.ones(
                (image_height, image_width, 1), np.uint8
            ) * np.uint8(255),
            depth_map=depth.astype(np.float16)[..., None],
            R=frame.R,
            T=frame.T,
            focal_length=focal,
            principal_point=pp,
        )
    return dict(
        image_rgb=img,
        fg_probability=mask[..., None],
        mask_crop=np.ones_like(mask)[..., None],
        depth_map=depth[..., None],
        R=frame.R,
        T=frame.T,
        focal_length=focal,
        principal_point=pp,
    )


class CO3DSceneDataset(SceneDataset):
    """Lazy per-sequence dataset: scenes loaded on first access, cached.

    The cache holds HOST (numpy) arrays with an optional LRU bound
    (`max_cached_scenes`): at the release scale a cached 800^2 sequence is
    ~600 MB, so caching device arrays (or unboundedly) would exhaust a 16 GB
    chip / the host long before a real category (~50+ sequences) is covered.
    Batches are converted to device arrays only at feed time (shard_batch /
    jit argument transfer) — the analog of the reference's worker-process
    loaders handing CPU tensors to `net_input.to(device)`
    (training_loop.py:447-457).

    With `compact_cache` (default) frames are cached in their NATIVE storage
    dtypes — uint8 image/mask (JPEG / mask PNGs are 8-bit on disk) and
    float16 depth (CO3D depth PNGs are f16 bits in u16) — and converted to
    float32 on-device at the model boundary (models.metrics.as_unit_float).
    At the release scale this cuts host cache RAM, the per-batch slice+stack,
    and the H2D transfer ~4x (a batch-33 800^2 feed drops ~507 MB -> ~130 MB).
    The only loss vs an f32 cache is re-quantizing the bilinear resample of
    an already-8-bit source to 8 bits (<=0.2% per pixel)."""

    def __init__(
        self,
        frames_by_seq: Dict[str, List[CO3DFrame]],
        dataset_root: str,
        load_kwargs: dict,
        max_frames_per_seq: int = -1,
        max_cached_scenes: int = 16,
        compact_cache: bool = True,
        num_workers: int = 5,
    ):
        from collections import OrderedDict

        self._frames_by_seq = frames_by_seq
        self._seq_names = sorted(frames_by_seq)
        self._root = dataset_root
        self._load_kwargs = load_kwargs
        self._max_frames = max_frames_per_seq
        self._max_cached = max_cached_scenes
        self._compact = compact_cache
        # cold-decode pool width (the reference decodes in `num_workers`
        # dataloader worker PROCESSES, hydrant.yaml:56; threads suffice here
        # because PIL's decoders and the ctypes C++ crop/resize release the
        # GIL — real parallelism on multi-core hosts, near-zero overhead on
        # a 1-core host)
        self._num_workers = max(1, int(num_workers))
        self._cache: "OrderedDict[str, FrameData]" = OrderedDict()

    def __len__(self):
        return len(self._seq_names)

    @property
    def scenes(self):
        return [self.get_scene(i) for i in range(len(self))]

    def get_scene(self, idx: int) -> FrameData:
        name = self._seq_names[idx]
        if name not in self._cache:
            frames = self._frames_by_seq[name]
            if self._max_frames > 0:
                frames = frames[: self._max_frames]
            def _load_one(f):
                return load_frame_data(
                    f, self._root, compact=self._compact, **self._load_kwargs
                )

            width = _decode_pool_width(self._num_workers)
            if width > 1 and len(frames) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(width) as ex:
                    loaded = list(ex.map(_load_one, frames))
            else:
                loaded = [_load_one(f) for f in frames]
            batch = {
                k: np.stack([d[k] for d in loaded]) for k in loaded[0]
            }
            if self._compact:
                # frames already arrive in compact dtypes (u8/u8/u8/f16 from
                # load_frame_data compact=True) — stacking was the only work
                img = batch["image_rgb"]
                fg = batch["fg_probability"]
                crop = batch["mask_crop"]
                depth = batch["depth_map"]
            else:
                img = np.asarray(batch["image_rgb"], np.float32)
                fg = np.asarray(batch["fg_probability"], np.float32)
                crop = np.asarray(batch["mask_crop"], np.float32)
                depth = np.asarray(batch["depth_map"], np.float32)
            self._cache[name] = FrameData(
                camera=PerspectiveCameras(
                    R=np.asarray(batch["R"], np.float32),
                    T=np.asarray(batch["T"], np.float32),
                    focal_length=np.asarray(batch["focal_length"], np.float32),
                    principal_point=np.asarray(
                        batch["principal_point"], np.float32
                    ),
                ),
                image_rgb=img,
                fg_probability=fg,
                mask_crop=crop,
                depth_map=depth,
                sequence_id=np.full((len(loaded),), idx, np.int32),
            )
            if self._max_cached > 0 and len(self._cache) > self._max_cached:
                self._cache.popitem(last=False)  # evict least-recently used
        else:
            self._cache.move_to_end(name)
        return self._cache[name]

    def sample_batch(self, rng: np.random.RandomState, batch_size: int) -> FrameData:
        scene = self.get_scene(rng.randint(len(self)))
        n = scene.batch_size
        idx = rng.choice(n, size=batch_size, replace=n < batch_size)
        return jax.tree.map(lambda x: np.asarray(x)[idx], scene)

    def get_frames(self, seq_name: str, frame_numbers: List[int]) -> FrameData:
        """Rows of `seq_name`'s scene selected by CO3D frame number, in the
        requested order (eval-batch assembly)."""
        idx_of = {
            f.frame_number: i
            for i, f in enumerate(self._frames_by_seq[seq_name])
        }
        if self._max_frames > 0:
            idx_of = {k: v for k, v in idx_of.items() if v < self._max_frames}
        missing = [fn for fn in frame_numbers if fn not in idx_of]
        if missing:
            raise KeyError(
                f"frames {missing} of sequence {seq_name!r} are not in this "
                f"split/dataset (eval batches must be assembled from the "
                f"union dataset)"
            )
        scene = self.get_scene(self._seq_names.index(seq_name))
        rows = np.asarray([idx_of[fn] for fn in frame_numbers])
        return jax.tree.map(lambda x: np.asarray(x)[rows], scene)


class CO3DDataProvider:
    """JsonIndexDatasetMapProviderV2 equivalent: category + subset split.

    Sequence/frame selection knobs follow JsonIndexDataset (reference
    configs/base.yaml:34-53): `remove_empty_masks` drops frames whose
    annotation mask mass is 0, `pick_sequence`/`exclude_sequence` filter by
    sequence name, `limit_sequences_to` keeps the first N (sorted) sequences,
    and `sort_frames` orders frames within a sequence by
    (timestamp, frame number) instead of set-list order."""

    def __init__(
        self,
        category: str,
        dataset_root: str,
        subset_name: str = "fewview_dev",
        test_on_train: bool = True,
        image_height: int = 800,
        image_width: int = 800,
        box_crop: bool = True,
        box_crop_mask_thr: float = 0.4,
        box_crop_context: float = 0.3,
        load_depths: bool = True,
        remove_empty_masks: bool = True,
        n_frames_per_sequence: int = -1,
        pick_sequence: Sequence[str] = (),
        exclude_sequence: Sequence[str] = (),
        limit_sequences_to: int = 0,
        sort_frames: bool = False,
        load_eval_batches: bool = False,
        n_known_frames_for_test: int = 0,
        max_cached_scenes: int = 16,
        compact_cache: bool = True,
        num_workers: int = 5,
        **_,
    ):
        category_root = os.path.join(dataset_root, category)
        frames = load_frame_annotations(category_root)
        if remove_empty_masks:
            frames = [
                f for f in frames
                if f.mask_mass is None or f.mask_mass > 0
            ]
        by_key = {(f.sequence_name, f.frame_number): f for f in frames}
        set_lists = load_set_lists(category_root, subset_name)
        pick, exclude = set(pick_sequence), set(exclude_sequence)

        load_kwargs = dict(
            image_height=image_height,
            image_width=image_width,
            box_crop=box_crop,
            box_crop_mask_thr=box_crop_mask_thr,
            box_crop_context=box_crop_context,
            load_depths=load_depths,
        )

        def build(*splits: str) -> CO3DSceneDataset:
            by_seq: Dict[str, List[CO3DFrame]] = {}
            for split in splits:
                for entry in set_lists.get(split, []):
                    seq, frame_num = entry[0], entry[1]
                    if pick and seq not in pick:
                        continue
                    if seq in exclude:
                        continue
                    f = by_key.get((seq, frame_num))
                    if f is not None:
                        by_seq.setdefault(seq, []).append(f)
            if limit_sequences_to > 0:
                by_seq = {
                    k: by_seq[k] for k in sorted(by_seq)[:limit_sequences_to]
                }
            if sort_frames:
                for seq in by_seq:
                    by_seq[seq].sort(
                        key=lambda f: (f.frame_timestamp, f.frame_number)
                    )
            return CO3DSceneDataset(
                by_seq, dataset_root, load_kwargs, n_frames_per_sequence,
                max_cached_scenes=max_cached_scenes,
                compact_cache=compact_cache,
                num_workers=num_workers,
            )

        self.train = build("train")
        self.val = build("train" if test_on_train else "val")

        # CO3D challenge eval protocol (reference base.yaml:23-31): dataset-
        # provided eval batches replace the evaluator's own target selection,
        # making per-sequence numbers comparable to published CO3D tables.
        self.eval_batches: Optional[List[List[Tuple[str, int]]]] = None
        self.n_known_frames_for_test = int(n_known_frames_for_test)
        if load_eval_batches:
            raw = load_eval_batches_file(category_root, subset_name)
            if raw is None:
                # Graceful fallback (shipped configs enable the protocol by
                # default, mirroring reference base.yaml:31): a dataset copy
                # without the challenge json still evaluates — via the
                # evaluator's own random-target selection — with a loud
                # warning instead of a hard failure.
                logger.warning(
                    f"load_eval_batches: no eval_batches/eval_batches_"
                    f"{subset_name}.json under {category_root}; falling back "
                    f"to the random-targets eval protocol"
                )
                load_eval_batches = False
        if load_eval_batches:
            kept = set(self.train._seq_names) | set(self.val._seq_names)
            self.eval_batches = [
                [(e[0], int(e[1])) for e in b]
                for b in raw
                if b and b[0][0] in kept  # respects pick/exclude/limit
            ]
            # batches may reference frames across splits (target in val,
            # known frames in train) -> assemble from the split union
            self._eval_source = build("train", "val", "test")
            self._train_frame_numbers: Dict[str, List[int]] = {}
            for entry in set_lists.get("train", []):
                self._train_frame_numbers.setdefault(entry[0], []).append(
                    int(entry[1])
                )
            logger.info(
                f"CO3D {category}/{subset_name}: {len(self.eval_batches)} "
                f"eval batches (n_known_frames_for_test="
                f"{self.n_known_frames_for_test})"
            )

        logger.info(
            f"CO3D {category}/{subset_name}: {len(self.train)} train sequences"
        )

    def get_eval_batch(self, i: int) -> FrameData:
        """Assemble eval batch `i` as a FrameData with the TARGET at row 0 and
        the known source frames after it; `n_known_frames_for_test` extra
        train-split frames of the same sequence are appended (reference
        base.yaml:33 `n_known_frames_for_test`)."""
        assert self.eval_batches is not None, "built without load_eval_batches"
        batch = list(self.eval_batches[i])
        seq = batch[0][0]
        if any(s != seq for s, _ in batch):
            raise ValueError(f"eval batch {i} spans multiple sequences")
        nums = [fn for _, fn in batch]
        if self.n_known_frames_for_test > 0:
            have = set(nums)
            extra = [
                fn for fn in self._train_frame_numbers.get(seq, [])
                if fn not in have
            ][: self.n_known_frames_for_test]
            nums = nums + extra
        return self._eval_source.get_frames(seq, nums)
