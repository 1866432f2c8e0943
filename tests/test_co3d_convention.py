"""Pin the CO3D camera/intrinsics conventions against an INDEPENDENT
pixel-space derivation of the public PyTorch3D formulas.

The loader (data/co3d.py) rewrites NDC intrinsics through box-crop + pad +
resize. Every other test validates it against fixtures produced by the same
author's code — this file instead derives the expected *pixel* location of
known world points straight from the published CO3D/PyTorch3D convention
(pytorch3d/implicitron/dataset/frame_data.py, FrameData._get_pytorch3d_camera):

    half_wh    = image_size_wh / 2                  (bounds convention:
                                                     pixel i covers [i, i+1))
    rescale    = min(half_wh)        for "ndc_isotropic"
               = half_wh (per axis)  for "ndc_norm_image_bounds"
    focal_px   = focal_ndc * rescale
    pp_px      = half_wh - pp_ndc * rescale          (+x left, +y up)
    x_px       = pp_px - focal_px * (x_cam / z_cam)
    x_cam      = x_world @ R + T                     (row vectors)

and then tracks the crop (subtract box corner), pad (add pad offset) and
square resize (scale by out/size) in raw pixel coordinates — none of the
loader's NDC rewrites are reused. If the loader's sign, transpose,
half-pixel, or format handling drifted from the real CO3D convention, the
projected pixels would disagree grossly (transpose/sign) or by a half pixel
(center convention); we assert agreement to <0.02 px.

Reference chain being pinned: /root/reference's pytorch3d JsonIndexDataset
usage (holo_diffusion/dataset/co3dv2_wrapper.py) — box_crop intrinsics
adjustment + PerspectiveCameras NDC convention.
"""
import gzip
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from holo_diffusion_tpu.data.co3d import CO3DDataProvider
from holo_diffusion_tpu.geometry import (
    look_at_view_transform,
    project_points_ndc,
)

# A realistic CO3D v2 frame_annotations record shape (portrait phone capture,
# ndc_isotropic — the CO3D v2 release format). Values are scaled-down but the
# schema and magnitudes mirror real records (sequence "106_12650_23736"-style
# hydrant captures: portrait ~1422x800 -> 120x84 here, focal ~3.1 iso-NDC).
H0, W0 = 120, 84
FOCAL_NDC = np.array([3.1, 3.1], np.float64)
PP_NDC = np.array([-0.03, 0.06], np.float64)
OUT = 64  # loader output resolution


def _extrinsics():
    R, T = look_at_view_transform(dist=3.0, elev=15.0, azim=40.0)
    return np.asarray(R, np.float64)[0], np.asarray(T, np.float64)[0]


def _project_px_pytorch3d(R, T, f_ndc, pp_ndc, size_hw, fmt, pts_world):
    """Independent projection to ORIGINAL-image pixels, bounds convention."""
    H, W = size_hw
    half_wh = np.array([W / 2.0, H / 2.0])
    if fmt == "ndc_isotropic":
        rescale = np.array([min(half_wh), min(half_wh)])
    elif fmt == "ndc_norm_image_bounds":
        rescale = half_wh
    else:  # pragma: no cover
        raise ValueError(fmt)
    f_px = f_ndc * rescale
    pp_px = half_wh - pp_ndc * rescale
    cam = pts_world @ R + T  # row-vector world->camera
    uv = cam[..., :2] / cam[..., 2:3]
    return pp_px - f_px * uv  # (+x left, +y up) -> screen x right, y down


def _write_dataset(root, fmt, mask_rect):
    """One-frame CO3D v2 tree with the real record schema."""
    cat = "hydrant"
    R, T = _extrinsics()
    cat_dir = os.path.join(root, cat)
    os.makedirs(os.path.join(cat_dir, "set_lists"), exist_ok=True)
    img_rel = f"{cat}/106_12650_23736/images/frame000001.png"
    mask_rel = f"{cat}/106_12650_23736/masks/frame000001.png"
    os.makedirs(os.path.dirname(os.path.join(root, img_rel)), exist_ok=True)
    os.makedirs(os.path.dirname(os.path.join(root, mask_rel)), exist_ok=True)

    x0, y0, x1, y1 = mask_rect
    img = np.zeros((H0, W0, 3), np.uint8)
    mask = np.zeros((H0, W0), np.uint8)
    img[y0:y1, x0:x1] = (200, 60, 60)
    mask[y0:y1, x0:x1] = 255
    Image.fromarray(img).save(os.path.join(root, img_rel))
    Image.fromarray(mask).save(os.path.join(root, mask_rel))

    record = {
        "sequence_name": "106_12650_23736",
        "frame_number": 1,
        "frame_timestamp": 2.1337,
        "image": {"path": img_rel, "size": [H0, W0]},
        "mask": {"path": mask_rel, "mass": int((mask > 0).sum())},
        "viewpoint": {
            "R": R.tolist(),
            "T": T.tolist(),
            "focal_length": FOCAL_NDC.tolist(),
            "principal_point": PP_NDC.tolist(),
            "intrinsics_format": fmt,
        },
        "meta": {"frame_type": "train_known"},
    }
    with gzip.open(os.path.join(cat_dir, "frame_annotations.jgz"), "wt") as f:
        json.dump([record], f)
    with open(
        os.path.join(cat_dir, "set_lists", "set_lists_fewview_dev.json"), "w"
    ) as f:
        json.dump(
            {"train": [["106_12650_23736", 1, img_rel]], "val": [], "test": []},
            f,
        )
    return cat


@pytest.mark.parametrize("fmt", ["ndc_isotropic", "ndc_norm_image_bounds"])
def test_pixel_projection_pinned_through_crop_pad_resize(tmp_path, fmt):
    root = str(tmp_path / fmt)
    # Non-square fg rect away from the center: exercises box-crop AND the
    # pad-to-square branch (48 wide x 60 tall).
    rect = (18, 30, 66, 90)
    cat = _write_dataset(root, fmt, rect)
    provider = CO3DDataProvider(
        category=cat,
        dataset_root=root,
        subset_name="fewview_dev",
        image_height=OUT,
        image_width=OUT,
        box_crop=True,
        box_crop_context=0.0,  # -> the crop box is exactly `rect`
    )
    scene = provider.train.get_scene(0)
    assert scene.image_rgb.shape == (1, OUT, OUT, 3)

    R, T = _extrinsics()
    # world points: on-axis (pins pp) and two off-axis (pin R transpose/sign)
    pts = np.array(
        [[0.0, 0.0, 0.0], [0.25, -0.18, 0.1], [-0.2, 0.3, -0.15]], np.float64
    )
    px_orig = _project_px_pytorch3d(
        R, T, FOCAL_NDC, PP_NDC, (H0, W0), fmt, pts
    )

    # --- independent pixel-space tracking of the loader's geometry ---
    x0, y0, x1, y1 = rect
    w, h = x1 - x0, y1 - y0
    px_crop = px_orig - np.array([x0, y0], np.float64)
    size = max(h, w)
    pad = np.array([(size - w) // 2, (size - h) // 2], np.float64)
    px_final = (px_crop + pad) * (OUT / size)

    # --- the loader's camera, converted with the bounds convention ---
    ndc = np.asarray(
        project_points_ndc(scene.camera, jnp.asarray(pts)[None]), np.float64
    )[0]
    s, c = OUT / 2.0, OUT / 2.0
    px_loaded = c - s * ndc[:, :2]

    np.testing.assert_allclose(px_loaded, px_final, atol=0.02)
    # all three points must land inside the fg rect -> content sanity
    fg = np.asarray(scene.fg_probability[0, ..., 0])
    for x, y in px_loaded:
        assert fg[int(y), int(x)] > 0.5, (x, y)


def test_real_record_schema_fields_parse(tmp_path):
    """The v2 record above carries the full public schema (mass, meta,
    frame_timestamp, depth absent) — the parser must not choke on extras."""
    from holo_diffusion_tpu.data.co3d import load_frame_annotations

    root = str(tmp_path)
    cat = _write_dataset(root, "ndc_isotropic", (18, 30, 66, 90))
    frames = load_frame_annotations(os.path.join(root, cat))
    assert len(frames) == 1
    fr = frames[0]
    assert fr.sequence_name == "106_12650_23736"
    assert fr.frame_number == 1
    assert fr.image_size_hw == (H0, W0)
    assert fr.depth_path is None and fr.depth_scale_adjustment == 1.0
    # iso-NDC passthrough: values preserved exactly
    np.testing.assert_allclose(fr.focal_length, FOCAL_NDC, rtol=1e-6)
    np.testing.assert_allclose(fr.principal_point, PP_NDC, rtol=1e-6)
