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


def denoising_video(
    model,
    variables,
    out_path: str,
    camera,
    rng,
    steps_per_frame: int = 50,
    max_iter=None,
    fps: int = 8,
):
    """Render the progressive DDPM denoising of one sampled grid from a fixed
    camera into a video — the reference's denoising-video visdom stream
    (holo_diffusion_model.py:598-616 via VideoWriter).

    model/variables: a diffusion-enabled HoloDiffusionModel; camera: a 1-batch
    PerspectiveCameras. Returns the written video path (or None).
    """
    from ..render_eval import make_chunk_render_fn, render_image_chunked
    from ..sampling import sample_random_voxel_features_progressive
    from .video import VideoWriter

    chunk_fn = make_chunk_render_fn(model)
    vw = VideoWriter(out_path, fps=fps)
    gen = sample_random_voxel_features_progressive(
        model, variables, rng, max_iter=max_iter
    )
    for i, grid in enumerate(gen):
        if i % max(steps_per_frame, 1) != 0:
            continue
        out = render_image_chunked(
            model, variables, camera, grid[0],
            chunk_renderer=lambda g, b: chunk_fn(variables, g, b),
        )
        vw.write_frame(out["images_render"])
    return vw.get_video()


def write_dashboard_html(stats, exp_dir: str, visuals_dir: str = "visuals"):
    """Self-contained live dashboard (the visdom replacement,
    training_loop.py:501-516 + vis_utils): one HTML file with inline metric
    charts (pure JS + SVG, no dependencies, auto-refreshes every 30 s) and
    thumbnails of the latest visual dumps. Regenerated at every checkpoint;
    open exp_dir/dashboard.html in any browser and leave it open.
    """
    import json as _json

    history = stats.history
    keys = sorted(
        {k for h in history for s in ("train", "val") for k in h.get(s, {})}
        - {"sec/it"}
    )
    vis_path = os.path.join(exp_dir, visuals_dir)
    images = []
    if os.path.isdir(vis_path):
        images = sorted(os.listdir(vis_path))[-8:]
    payload = _json.dumps(
        {
            "keys": keys,
            "history": history,
            "images": [f"{visuals_dir}/{f}" for f in images if f.endswith(".png")],
        }
    )
    html = """<!doctype html><html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="30">
<title>holo_diffusion_tpu dashboard</title>
<style>body{font-family:monospace;background:#111;color:#ddd;margin:20px}
.chart{display:inline-block;margin:8px;background:#1a1a1a;padding:8px;border-radius:6px}
h3{margin:4px 0;font-size:13px} img{max-width:340px;margin:6px;border-radius:4px}
svg polyline{fill:none;stroke-width:1.5} .train{stroke:#6cf} .val{stroke:#fc6}
text{fill:#888;font-size:10px}</style></head><body>
<h2>training dashboard</h2><div id="charts"></div><h2>latest visuals</h2>
<div id="imgs"></div><script>
const D = __PAYLOAD__;
function poly(vals, xmax, ymin, ymax, cls){
  const pts = vals.map(([x,y],i)=>{
    const px = 20 + 280*(x/Math.max(xmax,1));
    const py = 105 - 95*((y-ymin)/Math.max(ymax-ymin,1e-12));
    return px+","+py;}).join(" ");
  return `<polyline class="${cls}" points="${pts}"/>`;}
const charts = document.getElementById("charts");
for (const k of D.keys){
  let tr=[], va=[];
  for (const h of D.history){
    if (h.train && k in h.train) tr.push([h.epoch, h.train[k]]);
    if (h.val && k in h.val) va.push([h.epoch, h.val[k]]);}
  if (!tr.length && !va.length) continue;
  const ys = tr.concat(va).map(p=>p[1]);
  const ymin = Math.min(...ys), ymax = Math.max(...ys);
  const xmax = Math.max(...tr.concat(va).map(p=>p[0]));
  const last = (tr.length?tr:va).slice(-1)[0][1];
  charts.insertAdjacentHTML("beforeend",
    `<div class="chart"><h3>${k} = ${last.toPrecision(5)}</h3>
     <svg width="320" height="110">${poly(tr,xmax,ymin,ymax,"train")}
     ${poly(va,xmax,ymin,ymax,"val")}
     <text x="20" y="10">${ymax.toPrecision(3)}</text>
     <text x="20" y="105">${ymin.toPrecision(3)}</text></svg></div>`);}
const imgs = document.getElementById("imgs");
for (const p of D.images)
  imgs.insertAdjacentHTML("beforeend", `<a href="${p}"><img src="${p}"></a>`);
</script></body></html>"""
    html = html.replace("__PAYLOAD__", payload)
    path = os.path.join(exp_dir, "dashboard.html")
    with open(path, "w") as f:
        f.write(html)
    return path
