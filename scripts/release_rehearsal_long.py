"""Long release-scale rehearsal: training-dynamics evidence for BOTH legs.

The 3-epoch rehearsal (release_rehearsal.py) shows the photometric leg
learns (PSNR 9.68 -> 12.16 over 120 release-scale steps). This script
extends it to ~10 epochs and records the DIFFUSION leg's progress too
(VERDICT r4 next-round #8):

  * per-epoch DDPM sample render — a full 1000-step `p_sample_loop` on the
    current denoiser, rendered from a fixed held-out camera and saved as a
    PNG snapshot (reference analog: visdom denoising previews,
    holo_diffusion_model.py:598-616);
  * per-epoch denoise-leg curves —
      (a) `loss_prev_stage_rgb_mse`, the photometric loss rendered through
          the DENOISED bootstrap grid: this is the diffusion leg's actual
          training supervision (reference holo_diffusion_model.py:530-538)
          and the primary "the diffusion leg learns" signal;
      (b) E_t ||pred_x0(q_sample(v, t), t) - v||^2 on a FIXED validation
          batch's pooled grid with FIXED noise at a fixed fan of timesteps
          (the quantity the bootstrap pass consumes,
          holo_diffusion_model.py:392-398). NOTE: v is a moving target —
          the extractor sharpens it every epoch and its variance grows, so
          this is recorded both raw and normalized by var(v).

Epochs run one at a time through experiment.py's TrainingLoop (resume picks
up the orbax checkpoint each call — the same codepath a user's interrupted
run exercises), with the probes between epochs.

Run (on the TPU, nothing else using the chip):
    timeout 5400 python -u scripts/release_rehearsal_long.py [max_epochs]
"""
import faulthandler
import json
import os
import shutil
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

EXP_DIR = "/tmp/hydrant_rehearsal_long"
OUT_DIR = "/tmp/hydrant_rehearsal_long_artifacts"
EPOCH_FRAMES = 33 * 40  # 40 steps/epoch (release: 8000 frames -> 242)
PROBE_TS = (50, 250, 500, 750, 950)


def main():
    import bench  # synthetic-CO3D writer + release helpers

    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cat = bench._ensure_synth_co3d()
    shutil.rmtree(EXP_DIR, ignore_errors=True)  # fresh run, no resume
    os.makedirs(OUT_DIR, exist_ok=True)

    from holo_diffusion_tpu.config.config import (
        apply_dotted_overrides,
        load_config,
    )
    from holo_diffusion_tpu.experiment import Experiment
    from holo_diffusion_tpu.models import diffusion as gd
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.models.metrics import preprocess_input
    from holo_diffusion_tpu.render_eval import (
        make_chunk_renderer,
        render_image_chunked,
    )
    from holo_diffusion_tpu.sampling import sample_random_voxel_features

    provider_k = (
        "data_source_ImplicitronDataSource_args."
        "dataset_map_provider_JsonIndexDatasetMapProviderV2_args."
    )
    loader_k = (
        "data_source_ImplicitronDataSource_args."
        "data_loader_map_provider_SequenceDataLoaderMapProvider_args."
    )
    cfg = load_config("hydrant.yaml")
    apply_dotted_overrides(
        cfg,
        [
            provider_k + f"category={cat}",
            provider_k + f"dataset_root={bench._SYNTH_CO3D_ROOT}",
            loader_k + f"dataset_length_train={EPOCH_FRAMES}",
            loader_k + "dataset_length_val=33",
            "compact_sources=true",
            "disable_validation=false",
            f"exp_dir={EXP_DIR}",
            "training_loop_ImplicitronTrainingLoop_args.metric_print_interval=20",
        ],
    )
    exp = Experiment(cfg)
    model = exp.model
    print(f"[rehearsal] {len(exp.data.train)} train sequences, "
          f"batch {exp.batch_size}, {max_epochs} epochs", flush=True)

    # ---- fixed probe inputs (val batch, fixed rng) --------------------
    provider = bench._release_provider()
    probe_batch = provider.val.sample_batch(np.random.RandomState(0), 9)
    probe_camera = probe_batch.camera
    probe_rng = jax.random.PRNGKey(1234)
    sched = gd.make_named_schedule_from_config(model.diffusion_args or {})

    @jax.jit
    def pooled_grid(variables, camera_flat, image_rgb, fg, mask_crop):
        """Raw pooled voxel grid v in [-1,1] (pre-denoise) — the x0 the
        diffusion leg is trained to recover (holo_diffusion_model.py:368-373).

        Takes the FULL variables dict (params + the extractor's batch_stats,
        train_step.TrainState.variables()) — eval-mode BatchNorm reads the
        running stats collection."""
        img, fg2, _ = preprocess_input(
            image_rgb, fg, None, model.mask_images, model.mask_depths,
            model.mask_threshold, model.bg_color,
        )
        return model.apply(
            variables, img, camera_flat, fg2, mask_crop,
            method=HoloDiffusionModel.pool_features,
        )

    @jax.jit
    def denoise_leg_mse(variables, v, rng):
        """Mean over PROBE_TS of ||pred_x0(q_sample(v,t),t) - v||^2."""
        def model_fn(x, t):
            return model.apply(
                variables, x, t,
                method=HoloDiffusionModel.apply_net_3d,
            )

        def one_t(t_scalar):
            t = jnp.full((v.shape[0],), t_scalar, jnp.int32)
            noise = jax.random.normal(rng, v.shape)  # FIXED noise across epochs
            x_t = gd.q_sample(sched, v, t, noise)
            out = gd.p_mean_variance(sched, model_fn, x_t, t,
                                     clip_denoised=True)
            return jnp.mean((out["pred_xstart"] - v) ** 2)

        return jnp.stack([one_t(t) for t in PROBE_TS])

    def save_png(img, path):
        from PIL import Image

        arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(path)

    # ---- epoch loop with probes ---------------------------------------
    curve = []
    t0 = time.perf_counter()
    for epoch in range(max_epochs):
        state, stats = exp.run(max_epochs=epoch + 1, use_mesh=False)
        variables = state.variables()

        # diffusion-leg probe on the fixed val batch
        v = pooled_grid(
            variables, probe_camera,
            jnp.asarray(probe_batch.image_rgb),
            jnp.asarray(probe_batch.fg_probability),
            jnp.asarray(probe_batch.mask_crop),
        )
        per_t = np.asarray(denoise_leg_mse(variables, v[None], probe_rng))

        # per-epoch unconditional DDPM sample + render snapshot
        sample = sample_random_voxel_features(
            model, variables, jax.random.PRNGKey(7), n_samples=1,
        )
        renderer = make_chunk_renderer(model, variables)
        out = render_image_chunked(
            model, variables, probe_camera[:1], sample[0],
            image_height=256, image_width=256, chunk_renderer=renderer,
        )
        png = os.path.join(OUT_DIR, f"sample_epoch_{epoch:02d}.png")
        save_png(out["images_render"], png)  # (H, W, 3) — not batched

        h = stats.history[-1]
        tr, va = h.get("train", {}), h.get("val", {})
        # var(v) contextualizes the raw voxel MSE: v is a MOVING target (the
        # extractor/pooler sharpen it every epoch, its variance grows), so
        # the denoiser's progress shows in MSE/var(v), not raw MSE. The
        # photometric loss through the DENOISED pass
        # (loss_prev_stage_rgb_mse — the reference's actual diffusion-leg
        # supervision, holo_diffusion_model.py:530-538) is the primary
        # learning signal recorded here.
        v_var = float(jnp.var(v))
        rec = {
            "epoch": epoch,
            "train_psnr": float(tr.get("loss_rgb_psnr", float("nan"))),
            "val_psnr": float(va.get("loss_rgb_psnr", float("nan"))),
            "objective": float(tr.get("objective", float("nan"))),
            "prev_stage_rgb_mse": float(
                tr.get("loss_prev_stage_rgb_mse", float("nan"))),
            "prev_stage_rgb_psnr": float(
                tr.get("loss_prev_stage_rgb_psnr", float("nan"))),
            "denoise_mse_per_t": {
                str(t): float(m) for t, m in zip(PROBE_TS, per_t)
            },
            "denoise_mse_mean": float(per_t.mean()),
            "pooled_grid_var": v_var,
            "denoise_mse_rel": float(per_t.mean() / max(v_var, 1e-12)),
            "sample_png": png,
            "sample_render_mean": float(np.asarray(
                out["images_render"]).mean()),
        }
        curve.append(rec)
        print(f"[rehearsal] epoch {epoch}: train_psnr={rec['train_psnr']:.3f} "
              f"val_psnr={rec['val_psnr']:.3f} "
              f"prev_stage_mse={rec['prev_stage_rgb_mse']:.5f} "
              f"denoise_mse={rec['denoise_mse_mean']:.5f} "
              f"(rel {rec['denoise_mse_rel']:.3f}, var(v) {v_var:.4f})",
              flush=True)

    wall = time.perf_counter() - t0
    steps = max_epochs * (EPOCH_FRAMES // exp.batch_size)
    summary = {
        "max_epochs": max_epochs,
        "steps": steps,
        "wall_s": round(wall, 1),
        "curve": curve,
    }
    path = os.path.join(OUT_DIR, "curve.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[rehearsal] {steps} steps / {max_epochs} epochs in {wall:.0f}s; "
          f"denoise_mse {curve[0]['denoise_mse_mean']:.5f} -> "
          f"{curve[-1]['denoise_mse_mean']:.5f}; artifacts in {OUT_DIR}",
          flush=True)


if __name__ == "__main__":
    main()
