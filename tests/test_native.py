"""Native C++ preprocess kernel tests: build, exactness vs a numpy reference
of the same half-pixel bilinear, and bbox parity with the python path."""
import numpy as np
import pytest

from holo_diffusion_tpu.native import (
    crop_resize_batch_u8,
    crop_resize_u8,
    get_lib,
    mask_bbox_native,
)


def _numpy_crop_resize(src, box, out_hw, scale=1 / 255.0):
    """Reference: same half-pixel-center bilinear as the C++ kernel."""
    x0, y0, x1, y1 = box
    H, W, C = src.shape
    outH, outW = out_hw
    sy = (y1 - y0) / outH
    sx = (x1 - x0) / outW
    oy, ox = np.meshgrid(np.arange(outH), np.arange(outW), indexing="ij")
    fy = y0 + (oy + 0.5) * sy - 0.5
    fx = x0 + (ox + 0.5) * sx - 0.5
    yl = np.floor(fy).astype(int)
    xl = np.floor(fx).astype(int)
    wy = fy - yl
    wx = fx - xl
    out = np.zeros((outH, outW, C), np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = yl + dy
            xi = xl + dx
            w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yi_c = np.clip(yi, 0, H - 1)
            xi_c = np.clip(xi, 0, W - 1)
            out += (src[yi_c, xi_c].astype(np.float32)
                    * (w * valid)[..., None])
    return out * scale


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (g++ build failed)")
    return lib


def test_crop_resize_matches_numpy(lib):
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (37, 53, 3), np.uint8)
    box = (5, 3, 48, 30)
    out = crop_resize_u8(src, box, (16, 20))
    ref = _numpy_crop_resize(src, box, (16, 20))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crop_resize_batch_threads(lib):
    rng = np.random.RandomState(1)
    srcs = [rng.randint(0, 255, (rng.randint(30, 60), rng.randint(30, 60), 3),
                        np.uint8) for _ in range(7)]
    boxes = np.asarray(
        [[2, 2, s.shape[1] - 2, s.shape[0] - 2] for s in srcs], np.int32
    )
    out = crop_resize_batch_u8(srcs, boxes, (24, 24), n_threads=4)
    assert out.shape == (7, 24, 24, 3)
    for i, s in enumerate(srcs):
        ref = _numpy_crop_resize(s, tuple(boxes[i]), (24, 24))
        np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_mask_bbox_native_matches_python(lib):
    from holo_diffusion_tpu.data.co3d import expand_bbox, mask_bbox

    rng = np.random.RandomState(2)
    for _ in range(5):
        m = (rng.rand(25, 31) > 0.8).astype(np.float32)
        py_box = mask_bbox(m, 0.4)
        if py_box is not None:
            py_box = expand_bbox(py_box, 0.3, m.shape)
        nat = mask_bbox_native(m, 0.4, 0.3)
        assert nat == py_box
    assert mask_bbox_native(np.zeros((5, 5), np.float32), 0.4, 0.3) is None
