"""Native (C++) data-pipeline bindings via ctypes.

Compiles csrc/preprocess.cpp on first use (g++ is in the image; no pybind11 —
plain C ABI + ctypes). Falls back to None when compilation is impossible;
callers (data/co3d.py) degrade to the PIL path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "preprocess.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libhd_preprocess.so")
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _CSRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:  # noqa: BLE001
        logger.warning(f"native preprocess build failed ({e}); using PIL path")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) < os.path.getmtime(_CSRC)
    path = (
        _LIB_PATH if os.path.exists(_LIB_PATH) and not stale else _build()
    )
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.hd_crop_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    lib.hd_crop_resize_u8_out.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    lib.hd_crop_resize_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    lib.hd_mask_bbox.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.hd_mask_bbox.restype = ctypes.c_int
    lib.hd_compact_source_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def crop_resize_u8(
    src: np.ndarray,
    box: Tuple[int, int, int, int],
    out_hw: Tuple[int, int],
    scale: float = 1.0 / 255.0,
) -> Optional[np.ndarray]:
    """Crop+resize one (H, W, C) uint8 frame -> (outH, outW, C) float32.
    Returns None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    H, W, C = src.shape
    outH, outW = out_hw
    dst = np.empty((outH, outW, C), np.float32)
    lib.hd_crop_resize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, C, box[0], box[1], box[2], box[3],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        outH, outW, scale,
    )
    return dst


def crop_resize_u8_out(
    src: np.ndarray,
    box: Tuple[int, int, int, int],
    out_hw: Tuple[int, int],
    scale: float = 1.0 / 255.0,
) -> Optional[np.ndarray]:
    """Crop+resize one (H, W, C) uint8 frame -> (outH, outW, C) uint8 —
    bit-identical to `clip(round(crop_resize_u8(...) * 255))` without the f32
    intermediate (the compact host cache's hot path). Returns None when the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    H, W, C = src.shape
    outH, outW = out_hw
    dst = np.empty((outH, outW, C), np.uint8)
    lib.hd_crop_resize_u8_out(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, C, box[0], box[1], box[2], box[3],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        outH, outW, scale,
    )
    return dst


def crop_resize_batch_u8(
    srcs, boxes: np.ndarray, out_hw: Tuple[int, int],
    scale: float = 1.0 / 255.0, n_threads: int = 8,
) -> Optional[np.ndarray]:
    """Batch crop+resize over a list of (H_i, W_i, C) uint8 frames with the
    native thread pool. boxes: (N, 4) int32. Returns (N, outH, outW, C) f32."""
    lib = get_lib()
    if lib is None:
        return None
    srcs = [np.ascontiguousarray(s, np.uint8) for s in srcs]
    N = len(srcs)
    C = srcs[0].shape[2]
    hws = np.asarray([s.shape[:2] for s in srcs], np.int32).reshape(-1)
    boxes = np.ascontiguousarray(boxes, np.int32)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * N)(
        *[s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for s in srcs]
    )
    outH, outW = out_hw
    dst = np.empty((N, outH, outW, C), np.float32)
    lib.hd_crop_resize_batch_u8(
        ptrs,
        hws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        N, C,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        outH, outW, scale, n_threads,
    )
    return dst


def compact_source_batch_u8(
    imgs: np.ndarray, fgs: Optional[np.ndarray], out_hw: Tuple[int, int],
    thr: float, bg_color, mask_images: bool, n_threads: int = 8,
):
    """Fused compact-source preprocess (data/compact.py): fg-threshold
    composite onto bg_color applied per bilinear corner read (== mask at full
    res THEN resize, the reference preprocess order), uint8 out, one pass.

    imgs: (N, H, W, C) u8; fgs: (N, H, W) or (N, H, W, 1) u8 or None.
    Returns (img (N,outH,outW,C) u8, fg (N,outH,outW,1) u8 or None), or None
    when the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    N, H, W, C = imgs.shape
    assert C <= 4, C
    outH, outW = out_hw
    img_dst = np.empty((N, outH, outW, C), np.uint8)
    hws = np.asarray([[H, W]] * N, np.int32).reshape(-1)
    img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * N)(
        *[
            imgs[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            for i in range(N)
        ]
    )
    fg_ptrs = None
    fg_dst = None
    if fgs is not None:
        fgs = np.ascontiguousarray(
            np.asarray(fgs, np.uint8).reshape(N, H, W)
        )
        fg_ptrs = (ctypes.POINTER(ctypes.c_uint8) * N)(
            *[
                fgs[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                for i in range(N)
            ]
        )
        fg_dst = np.empty((N, outH, outW), np.uint8)
    bg = np.asarray(
        np.clip(np.round(np.asarray(bg_color, np.float64) * 255.0), 0, 255),
        np.float32,
    )
    assert bg.size >= C, (bg.size, C)
    lib.hd_compact_source_batch_u8(
        img_ptrs,
        fg_ptrs,
        hws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        N, C,
        img_dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        None
        if fg_dst is None
        else fg_dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        outH, outW, float(thr) * 255.0,
        bg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if mask_images else 0, n_threads,
    )
    return img_dst, None if fg_dst is None else fg_dst[..., None]


def mask_bbox_native(
    mask: np.ndarray, thr: float, context: float
) -> Optional[Tuple[int, int, int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.float32)
    H, W = mask.shape
    box = np.zeros(4, np.int32)
    ok = lib.hd_mask_bbox(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, thr, context,
        box.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return tuple(int(v) for v in box) if ok else None
