"""Per-phase timing of the RELEASE-scale train step on the real TPU.

The release step (hydrant recipe shape: batch 33 same-seq 800^2 frames,
ResNet34 @ 0.32 over 30 sources, bootstrap denoise at 16^3 x 64,
3x1024x(64+128)x2-pass fused render with normals on) measured 347 ms
(5.76 steps/s, BENCH r3). This script decomposes it so the next kernel
lever is chosen by measurement, not by guess (the round-3 lesson:
the "fuse the EA epilogue" guess was refuted by profile — BASELINE.md).

Phases (each fwd+bwd wrt params, scan-K per dispatch, median of 5 blocks):

    full          whole __call__ objective from image_rgb (== step minus adam)
    nopool        __call__ from voxel_features (denoise + render + metrics)
    extract       ResNet34 feature extraction alone (30 x 800^2 -> 0.32)
    extract_bf16  same, dtype=bfloat16 compute (candidate lever)
    pool_full     pool_features (extract + view-pool + mapper)
    denoise       denoise method alone (2 UNet passes, bootstrap)

    python scripts/profile_release_step.py
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


def timeit(fn, *args, iters=3, repeats=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        blocks.append((time.perf_counter() - t0) / iters)
    blocks.sort()
    return blocks[len(blocks) // 2], blocks


def main():
    import bench

    provider = bench._release_provider()
    batch = provider.train.sample_batch(np.random.RandomState(0), 33)
    model = bench._release_model()
    print("[profile] jitted init ...", flush=True)
    variables = bench._release_init(model, batch)
    params = variables["params"]

    camera = batch.camera
    image_rgb = jnp.asarray(batch.image_rgb)
    fg = jnp.asarray(batch.fg_probability)
    mask_crop = jnp.asarray(batch.mask_crop)

    K = 2

    def scan_grad(loss_of_params_rng):
        """grad(loss)(params) scanned K times in one dispatch."""

        def run(p, rng):
            def body(r, _):
                r, sub = jax.random.split(r)
                g = jax.grad(loss_of_params_rng)(p, sub)
                return r, jax.tree.leaves(g)[0].ravel()[0]

            _, outs = jax.lax.scan(body, rng, jnp.arange(K))
            return jnp.sum(outs)

        return jax.jit(run)

    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel

    _mut = [k for k in variables.keys() if k != "params"]

    def full_loss(p, rng):
        preds = model.apply(
            {**variables, "params": p},
            camera=camera,
            image_rgb=image_rgb,
            fg_probability=fg,
            mask_crop=mask_crop,
            training=True,
            rng=rng,
            mutable=_mut,
        )
        if isinstance(preds, tuple):
            preds = preds[0]
        return preds["objective"]

    def fullnoloss_loss(p, rng):
        """full chain, loss anchored on the RENDER instead of the objective:
        XLA dead-code-eliminates the metrics/objective path (gt bilinear
        gathers at ray xys, loss terms, their backward), so
        full - fullnoloss isolates the metrics+loss-path cost that the
        pool_full/nopool phases cannot see (round-5 residual attribution)."""
        preds = model.apply(
            {**variables, "params": p},
            camera=camera,
            image_rgb=image_rgb,
            fg_probability=fg,
            mask_crop=mask_crop,
            training=True,
            rng=rng,
            mutable=_mut,
        )
        if isinstance(preds, tuple):
            preds = preds[0]
        r = preds["rendered"]
        return (jnp.sum(r.features) + jnp.sum(r.depths)
                + jnp.sum(r.masks)) * 1e-6

    # grid for the nopool/denoise phases
    grid = jnp.zeros((1, model.resol, model.resol, model.resol,
                      model.feature_size), jnp.float32)

    def nopool_loss(p, rng):
        preds = model.apply(
            {**variables, "params": p},
            camera=camera,
            image_rgb=None,
            fg_probability=fg,
            mask_crop=mask_crop,
            training=True,
            rng=rng,
            voxel_features=grid,
            mutable=_mut,
        )
        if isinstance(preds, tuple):
            preds = preds[0]
        # With image_rgb=None there is no rgb loss and the release weights
        # zero the mask losses -> the objective alone is literally 0.0 and
        # XLA DCEs the whole render (the round-3 "nopool: 6 ms" artifact).
        # Anchor the loss on the rendered features so denoise+render+
        # raysample+metrics actually execute.
        r = preds["rendered"]
        anchor = jnp.sum(r.features) + jnp.sum(r.depths) + jnp.sum(r.masks)
        return preds["objective"] + anchor * 1e-6

    n_t = model.n_train_target_views
    src_rgb, src_fg = image_rgb[n_t:], fg[n_t:]

    def extract_loss(p, rng):
        feats = model.apply(
            {**variables, "params": p},
            src_rgb / 255.0 if src_rgb.dtype == jnp.uint8 else src_rgb,
            src_fg / 255.0 if src_fg.dtype == jnp.uint8 else src_fg,
            method=lambda m, x, f: m.image_feature_extractor(x, f),
        )
        return sum(jnp.sum(v) for v in jax.tree.leaves(feats)) * 1e-8

    def pool_loss(p, rng):
        g = model.apply(
            {**variables, "params": p},
            src_rgb,
            camera[n_t:],
            src_fg,
            mask_crop[n_t:],
            method=HoloDiffusionModel.pool_features,
        )
        return jnp.sum(g) * 1e-6

    def denoise_loss(p, rng):
        v, _aux = model.apply(
            {**variables, "params": p},
            grid,
            True,
            rng,
            method=HoloDiffusionModel.denoise,
        )
        return jnp.sum(v) * 1e-6

    # bf16 UNet compute at release scale (VERDICT r4 weak #7: the round-2
    # bf16 rejection was measured at BASE scale only; at release scale the
    # denoiser is a larger share of the step). Same f32 params, bf16 compute.
    model_unet_bf16 = bench._release_model(dtype=jnp.bfloat16)

    def full_bf16_loss(p, rng):
        preds = model_unet_bf16.apply(
            {**variables, "params": p},
            camera=camera,
            image_rgb=image_rgb,
            fg_probability=fg,
            mask_crop=mask_crop,
            training=True,
            rng=rng,
            mutable=_mut,
        )
        if isinstance(preds, tuple):
            preds = preds[0]
        return preds["objective"]

    phases = [
        ("full", full_loss),
        ("full_bf16", full_bf16_loss),
        ("fullnoloss", fullnoloss_loss),
        ("nopool", nopool_loss),
        ("extract", extract_loss),
        ("pool_full", pool_loss),
        ("denoise", denoise_loss),
    ]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):  # e.g. --only=full,pool_full
            only = set(a.split("=", 1)[1].split(","))
    if only is not None:
        phases = [(n, f) for n, f in phases if n in only]
    results = {}
    rng = jax.random.PRNGKey(0)
    for name, loss in phases:
        fn = scan_grad(loss)
        print(f"[profile] compiling {name} ...", flush=True)
        try:
            med, blocks = timeit(fn, params, rng)
        except Exception as e:  # noqa: BLE001
            print(f"[profile] {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results[name] = med / K
        print(
            f"[profile] {name}: {med / K * 1e3:.2f} ms/step "
            f"(blocks {[round(b / K * 1e3, 1) for b in blocks]})",
            flush=True,
        )

    # bf16 extractor variant: same params, bf16 compute dtype
    model_bf16 = bench._release_model(
        image_feature_extractor_args=dict(
            name_arch="resnet34", stages=(1, 2, 3, 4), proj_dim=16,
            image_rescale=0.32, dtype=jnp.bfloat16,
        )
    )

    def extract_bf16_loss(p, rng):
        feats = model_bf16.apply(
            {**variables, "params": p},
            src_rgb,
            src_fg,
            method=lambda m, x, f: m.image_feature_extractor(x, f),
        )
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree.leaves(feats)) * 1e-8

    if only is None or "extract_bf16" in only:
        fn = scan_grad(extract_bf16_loss)
        print("[profile] compiling extract_bf16 ...", flush=True)
        try:
            med, blocks = timeit(fn, params, rng)
            results["extract_bf16"] = med / K
            print(
                f"[profile] extract_bf16: {med / K * 1e3:.2f} ms/step "
                f"(blocks {[round(b / K * 1e3, 1) for b in blocks]})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[profile] extract_bf16: FAILED {type(e).__name__}: {e}",
                  flush=True)

    if "full" in results and "nopool" in results:
        print(
            f"[profile] pooling residual (full - nopool): "
            f"{(results['full'] - results['nopool']) * 1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
