"""Release-scale synthetic CO3Dv2 tree writer.

Writes a dataset in the REAL on-disk CO3Dv2 format consumed by
`data/co3d.py` — JPEG frames, L-mode mask PNGs, float16-in-uint16 depth PNGs,
`frame_annotations.jgz` with `ndc_norm_image_bounds` intrinsics (exercising
the isotropic-NDC conversion, co3d.py:51-61) and `set_lists_fewview_dev.json`
— so the full hydrant recipe (batch 33 same-sequence 800^2 frames through
box-crop + native crop/resize, hydrant.yaml:43-58) can be rehearsed end-to-end
without real CO3D data (VERDICT r2 #1).

The scenes are shaded spheres with procedural texture (non-flat JPEG content,
so decode cost is realistic) viewed from a fly-around of poses at the real
CO3D image aspect (portrait ~ 900x1200).
"""
from __future__ import annotations

import gzip
import json
import os
from typing import Tuple

import numpy as np


def _render_sphere_frame(
    cam_R: np.ndarray,
    cam_T: np.ndarray,
    focal_ndc_iso: np.ndarray,
    pp_ndc_iso: np.ndarray,
    H: int,
    W: int,
    radius: float,
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Analytic shaded sphere at the world origin -> (rgb u8, mask u8, depth).

    Projection follows the PyTorch3D screen convention used by the loader
    (co3d.py:144-157): x_px = c_x - s * (f_x * X/Z + p_x), s = min(H, W)/2.
    """
    # camera-space center: X_cam = X_world @ R + T (row-vector convention)
    center_cam = cam_T  # world origin
    z0 = float(center_cam[2])
    s = min(H, W) / 2.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    u0 = center_cam[0] / z0
    v0 = center_cam[1] / z0
    px = cx - s * (focal_ndc_iso[0] * u0 + pp_ndc_iso[0])
    py = cy - s * (focal_ndc_iso[1] * v0 + pp_ndc_iso[1])
    r_px = s * float(focal_ndc_iso[0]) * radius / z0

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    d2 = ((xx - px) ** 2 + (yy - py) ** 2) / max(r_px, 1.0) ** 2
    inside = d2 < 1.0
    nz = np.sqrt(np.clip(1.0 - d2, 0.0, 1.0))  # sphere normal z (approx)

    # lambertian shading + procedural bands for JPEG-realistic content
    light = np.clip(
        0.25 + 0.75 * nz, 0.0, 1.0
    ) * (0.8 + 0.2 * np.sin(0.15 * (xx - px)) * np.cos(0.11 * (yy - py)))
    base = rng.uniform(0.3, 0.9, size=3)
    img = np.zeros((H, W, 3), np.float32)
    img[..., 0] = light * base[0]
    img[..., 1] = light * base[1]
    img[..., 2] = light * base[2]
    img += rng.normal(0.0, 0.01, img.shape).astype(np.float32)  # sensor noise
    img = np.where(inside[..., None], img, rng.uniform(0.02, 0.08))
    img_u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)

    mask_u8 = (inside * 255).astype(np.uint8)
    depth = np.where(inside, z0 - radius * nz, 0.0).astype(np.float32)
    return img_u8, mask_u8, depth


def write_synthetic_co3d(
    root: str,
    category: str = "synthball",
    n_seq: int = 4,
    n_frames: int = 40,
    H: int = 900,
    W: int = 1200,
    radius: float = 1.3,
    dist: float = 4.0,
    seed: int = 0,
    with_depth: bool = True,
    n_val_frames: int = 2,
    n_known_per_eval_batch: int = 4,
) -> str:
    """Write the tree under `root/category`; returns `category`."""
    from PIL import Image

    from ..geometry.cameras import look_at_view_transform

    cat_dir = os.path.join(root, category)
    os.makedirs(os.path.join(cat_dir, "set_lists"), exist_ok=True)
    rng = np.random.RandomState(seed)
    annos = []
    set_lists = {"train": [], "val": [], "test": []}
    s = min(H, W)
    # ndc_norm_image_bounds: per-axis normalization by its own half-extent
    # (the conversion back is co3d.py:58-61)
    bounds_scale = np.array([s / W, s / H], np.float64)

    for si in range(n_seq):
        seq = f"seq_{si:03d}"
        for fi in range(n_frames):
            R, T = look_at_view_transform(
                dist=dist * rng.uniform(0.9, 1.15),
                elev=rng.uniform(-25.0, 35.0),
                azim=360.0 * fi / n_frames + rng.uniform(-3, 3),
            )
            Rn = np.asarray(R)[0]
            Tn = np.asarray(T)[0]
            focal_iso = np.array(
                [2.1 * rng.uniform(0.95, 1.05)] * 2, np.float64
            )
            pp_iso = rng.uniform(-0.06, 0.06, size=2)
            img_u8, mask_u8, depth = _render_sphere_frame(
                Rn, Tn, focal_iso, pp_iso, H, W, radius, rng
            )

            img_rel = f"{category}/{seq}/images/frame{fi:06d}.jpg"
            mask_rel = f"{category}/{seq}/masks/frame{fi:06d}.png"
            dep_rel = f"{category}/{seq}/depths/frame{fi:06d}.png"
            for rel in (img_rel, mask_rel, dep_rel):
                os.makedirs(
                    os.path.dirname(os.path.join(root, rel)), exist_ok=True
                )
            Image.fromarray(img_u8).save(
                os.path.join(root, img_rel), quality=90
            )
            Image.fromarray(mask_u8, mode="L").save(
                os.path.join(root, mask_rel)
            )
            depth_entry = None
            if with_depth:
                # CO3D depth convention: float16 bits in a uint16 PNG
                # (co3d.py:168-178)
                d16 = depth.astype(np.float16).view(np.uint16)
                Image.fromarray(d16, mode="I;16").save(
                    os.path.join(root, dep_rel)
                )
                depth_entry = {"path": dep_rel, "scale_adjustment": 1.0}

            anno = {
                "sequence_name": seq,
                "frame_number": fi,
                "frame_timestamp": float(fi),
                "image": {"path": img_rel, "size": [H, W]},
                "mask": {"path": mask_rel},
                "viewpoint": {
                    "R": Rn.tolist(),
                    "T": Tn.tolist(),
                    "focal_length": (focal_iso * bounds_scale).tolist(),
                    "principal_point": (pp_iso * bounds_scale).tolist(),
                    "intrinsics_format": "ndc_norm_image_bounds",
                },
            }
            if depth_entry:
                anno["depth"] = depth_entry
            annos.append(anno)
            split = "val" if fi >= n_frames - n_val_frames else "train"
            set_lists[split].append([seq, fi, img_rel])

    with gzip.open(os.path.join(cat_dir, "frame_annotations.jgz"), "wt") as f:
        json.dump(annos, f)
    with open(
        os.path.join(cat_dir, "set_lists", "set_lists_fewview_dev.json"), "w"
    ) as f:
        json.dump(set_lists, f)

    # CO3Dv2 challenge eval protocol file (reference base.yaml:23-31,
    # `load_eval_batches: true`): eval_batches_{subset}.json is a list of
    # batches of [sequence_name, frame_number, image_path]; the FIRST entry
    # is the eval target, the rest are the known source frames.
    eval_batches = []
    by_seq_split = {"train": {}, "val": {}}
    for split in ("train", "val"):
        for seq, fi, rel in set_lists[split]:
            by_seq_split[split].setdefault(seq, []).append([seq, fi, rel])
    for seq, targets in by_seq_split["val"].items():
        known = by_seq_split["train"].get(seq, [])[:n_known_per_eval_batch]
        for target in targets:
            eval_batches.append([target] + known)
    os.makedirs(os.path.join(cat_dir, "eval_batches"), exist_ok=True)
    with open(
        os.path.join(cat_dir, "eval_batches", "eval_batches_fewview_dev.json"),
        "w",
    ) as f:
        json.dump(eval_batches, f)
    return category
