"""Decompose the non-pool, non-render residual of the release train step.

profile_release_step.py (after the CDF ray-sampler fix) leaves
full(97.8) - pool_full(31.1) - nopool(6.1) ~= 60 ms unattributed. The
candidates are all full-batch glue: preprocess_input over 33x800^2 u8,
mask-CDF ray sampling over 800^2 masks, gt bilinear sampling at ray
positions, MC splat. This script times each standalone (K-scan medians)
plus the COMPACT-mode full step (targets-only preprocess — the real user
path since compact_sources).

    timeout 3000 python -u scripts/profile_step_residual.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

K = 4


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        blocks.append((time.perf_counter() - t0) / K)
    blocks.sort()
    return blocks[len(blocks) // 2], blocks


def scanned(body):
    """jit a K-iteration scan over rng of `body(rng) -> scalar`."""

    def run(rng):
        def step(r, _):
            r, sub = jax.random.split(r)
            return r, body(sub)

        _, outs = jax.lax.scan(step, rng, jnp.arange(K))
        return jnp.sum(outs)

    return jax.jit(run)


def main():
    import bench

    provider = bench._release_provider()
    batch = provider.train.sample_batch(np.random.RandomState(0), 33)
    model = bench._release_model()
    print("[residual] jitted init ...", flush=True)
    variables = bench._release_init(model, batch)

    image_rgb = jnp.asarray(batch.image_rgb)
    fg = jnp.asarray(batch.fg_probability)
    mask_crop = jnp.asarray(batch.mask_crop)
    camera = batch.camera

    from holo_diffusion_tpu.models.metrics import preprocess_input
    from holo_diffusion_tpu.geometry.rays import sample_rays_from_mask

    # 1. preprocess_input over the full 33x800^2 batch (non-compact path)
    def pre_body(rng):
        img, f, _ = preprocess_input(
            image_rgb, fg, None, model.mask_images, model.mask_depths,
            model.mask_threshold, model.bg_color,
        )
        return jnp.sum(img[0, 0, 0]) + jnp.sum(f[0, 0, 0]) + rng[0] * 0.0

    med, blocks = timeit(scanned(pre_body), jax.random.PRNGKey(0))
    print(f"[residual] preprocess 33x800^2: {med*1e3:.2f} ms "
          f"({[round(b*1e3,1) for b in blocks]})", flush=True)

    # 2. mask-CDF ray sampling (3 targets, 1024 rays, 64 pts, 800^2 masks)
    fg3 = jnp.squeeze(fg[:3].astype(jnp.float32) / 255.0, -1)
    cam3 = camera[:3]

    def rays_body(rng):
        rb = sample_rays_from_mask(
            cam3, fg3, model.n_rays_per_image, model.n_pts_per_ray_training,
            rng, model.scene_center, model.scene_extent, True,
        )
        return jnp.sum(rb.xys[0, 0]) + jnp.sum(rb.lengths[0, 0, 0])

    med, blocks = timeit(scanned(rays_body), jax.random.PRNGKey(1))
    print(f"[residual] mask-CDF raysample: {med*1e3:.2f} ms "
          f"({[round(b*1e3,1) for b in blocks]})", flush=True)

    # 3. gt bilinear sampling at ray positions (metrics side)
    from holo_diffusion_tpu.models.metrics import _sample_at_rays

    img3 = image_rgb[:3].astype(jnp.float32) / 255.0

    def gt_body(rng):
        xys = jax.random.uniform(
            rng, (3, model.n_rays_per_image, 2), minval=-1.0, maxval=1.0
        )
        return jnp.sum(_sample_at_rays(img3, xys)[0, 0])

    med, blocks = timeit(scanned(gt_body), jax.random.PRNGKey(2))
    print(f"[residual] gt ray sampling: {med*1e3:.2f} ms "
          f"({[round(b*1e3,1) for b in blocks]})", flush=True)

    # 4. COMPACT-mode full objective grad (the real user path)
    from holo_diffusion_tpu.data.compact import SourceCompactor

    comp = SourceCompactor.from_model(model, drop_depth=True)
    cb = comp(batch)
    c_img = jnp.asarray(cb.image_rgb)
    c_fg = jnp.asarray(cb.fg_probability)
    c_mc = jnp.asarray(cb.mask_crop)
    s_img = jnp.asarray(cb.src_image_rgb)
    s_fg = jnp.asarray(cb.src_fg_probability)
    s_mc = jnp.asarray(cb.src_mask_crop)
    params = variables["params"]
    _mut = [k for k in variables.keys() if k != "params"]

    def compact_loss(p, rng):
        preds = model.apply(
            {**variables, "params": p},
            camera=camera,
            image_rgb=c_img,
            fg_probability=c_fg,
            mask_crop=c_mc,
            src_image_rgb=s_img,
            src_fg_probability=s_fg,
            src_mask_crop=s_mc,
            training=True,
            rng=rng,
            mutable=_mut,
        )
        if isinstance(preds, tuple):
            preds = preds[0]
        return preds["objective"]

    def full_run(p, rng):
        def step(r, _):
            r, sub = jax.random.split(r)
            g = jax.grad(compact_loss)(p, sub)
            return r, jax.tree.leaves(g)[0].ravel()[0]

        _, outs = jax.lax.scan(step, rng, jnp.arange(K))
        return jnp.sum(outs)

    fn = jax.jit(full_run)
    print("[residual] compiling compact full ...", flush=True)
    med, blocks = timeit(fn, params, jax.random.PRNGKey(3))
    print(f"[residual] COMPACT full f+b: {med*1e3:.2f} ms "
          f"({[round(b*1e3,1) for b in blocks]})", flush=True)


if __name__ == "__main__":
    main()
