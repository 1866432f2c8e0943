"""Training visualization — file-based replacement for the reference's visdom
dashboards (holo_diffusion_model.py:542-616 `visualize`, training_loop.py:
501-516 interval logging, vis_utils.visualize_basics).

Writes PNG grids per visualization interval under `exp_dir/visuals/`; any
image viewer or tensorboard-free dashboard can tail the directory. Feature
grids are projected to RGB with the reference's fixed-seed random projection
(`_feats_to_rgb`, holo_diffusion_model.py:619-634).
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def feats_to_rgb(f: jnp.ndarray, seed: int = 42) -> jnp.ndarray:
    """(..., C) features -> (..., 3) via a fixed random projection +
    normalize (holo_diffusion_model.py:619-634)."""
    w = jax.random.normal(jax.random.PRNGKey(seed), (f.shape[-1], 3), f.dtype)
    proj = f @ w
    norm = jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8)
    return 0.5 + 0.5 * proj / norm


def image_grid(images: np.ndarray, pad: int = 2, max_cols: int = 8) -> np.ndarray:
    """(N, H, W, 3) -> one tiled (gh*H, gw*W, 3) grid image."""
    images = np.asarray(images)
    N, H, W, C = images.shape
    cols = min(N, max_cols)
    rows = (N + cols - 1) // cols
    canvas = np.ones((rows * (H + pad) - pad, cols * (W + pad) - pad, C),
                     images.dtype)
    for i in range(N):
        r, c = divmod(i, cols)
        canvas[r * (H + pad):r * (H + pad) + H,
               c * (W + pad):c * (W + pad) + W] = images[i]
    return canvas


def save_image(path: str, img: np.ndarray):
    import imageio.v3 as iio

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    iio.imwrite(path, img)


def visualize_preds(
    preds: Dict, out_dir: str, prefix: str = "train", step: int = 0
):
    """Dump the renderable entries of a preds dict as PNG grids (the
    equivalent of model.visualize's per-interval visdom panels)."""
    written = []
    for key in ("images_render", "masks_render", "depths_render"):
        if key not in preds:
            continue
        v = np.asarray(preds[key])
        if v.ndim != 4:
            continue
        if v.shape[-1] == 1:
            vmax = v.max() + 1e-6
            v = np.repeat(v / vmax, 3, axis=-1)
        path = os.path.join(out_dir, f"{prefix}_{step:08d}_{key}.png")
        save_image(path, image_grid(v))
        written.append(path)
    # diffusion aux: x_t feature grid projected to rgb (mid-depth slice)
    if "diffusion_x_t" in preds:
        x_t = np.asarray(preds["diffusion_x_t"])[0]  # (r, r, r, C)
        mid = x_t[x_t.shape[0] // 2]
        rgb = np.asarray(feats_to_rgb(jnp.asarray(mid)))
        path = os.path.join(out_dir, f"{prefix}_{step:08d}_x_t.png")
        save_image(path, rgb)
        written.append(path)
    return written


def plot_stats_pdf(stats, path: str):
    """Metric curves over epochs -> a pdf (the reference's train_stats.pdf,
    training_loop.py:339-350)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    history = stats.history
    if not history:
        return None
    keys = sorted(
        {k for h in history for k in h.get("train", {})} - {"sec/it"}
    )
    n = len(keys)
    if n == 0:
        return None
    cols = 3
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows),
                             squeeze=False)
    epochs = [h["epoch"] for h in history]
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        for stat_set, style in (("train", "-"), ("val", "--")):
            ys = [h.get(stat_set, {}).get(k) for h in history]
            if any(y is not None for y in ys):
                ax.plot(epochs, [y if y is not None else np.nan for y in ys],
                        style, label=stat_set)
        ax.set_title(k, fontsize=8)
        ax.legend(fontsize=6)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path
