"""Release-scale end-to-end training rehearsal on synthetic CO3D data.

Runs the FULL hydrant release recipe shape (reference configs/hydrant.yaml:
batch 33 same-sequence frames at 800^2 through the real CO3Dv2-format loader,
ResNet34 @ rescale 0.32, bootstrap denoise, 3x1024x(64+64+64)x2-pass render,
grad + adam) through experiment.py's TrainingLoop — checkpoints, stats,
validation epochs included — on a synthetic CO3D tree written in the real
on-disk format (JPEG frames, u8 mask PNGs, f16-in-u16 depth PNGs,
ndc_norm_image_bounds intrinsics). The only deltas from the release recipe
are epoch length (40 steps vs 8000/33) and max_epochs: everything the device
and host pipeline execute per step is release-shaped.

Run (on the TPU, nothing else using the chip):
    timeout 5400 python -u scripts/release_rehearsal.py
"""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# Persistent compile cache: release-scale compiles cost 10-19 min over the
# TPU tunnel; cached re-runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

EXP_DIR = "/tmp/hydrant_rehearsal"
EPOCH_FRAMES = 33 * 40  # 40 steps/epoch (release: 8000 frames -> 242)
MAX_EPOCHS = 3


def main():
    import bench  # synthetic-CO3D writer + release helpers

    cat = bench._ensure_synth_co3d()
    shutil.rmtree(EXP_DIR, ignore_errors=True)  # fresh run, no resume

    from holo_diffusion_tpu.config.config import (
        apply_dotted_overrides,
        load_config,
    )
    from holo_diffusion_tpu.experiment import Experiment

    provider = (
        "data_source_ImplicitronDataSource_args."
        "dataset_map_provider_JsonIndexDatasetMapProviderV2_args."
    )
    loader = (
        "data_source_ImplicitronDataSource_args."
        "data_loader_map_provider_SequenceDataLoaderMapProvider_args."
    )
    cfg = load_config("hydrant.yaml")
    apply_dotted_overrides(
        cfg,
        [
            provider + f"category={cat}",
            provider + f"dataset_root={bench._SYNTH_CO3D_ROOT}",
            loader + f"dataset_length_train={EPOCH_FRAMES}",
            loader + "dataset_length_val=33",
            # host-side mask+rescale of the 30 pooling sources before H2D
            # (data/compact.py): the full-res batch is ~147 MB/step vs a
            # ~0.35 s device step — the wire, not the MXU, paces the loop
            "compact_sources=true",
            "disable_validation=false",
            f"exp_dir={EXP_DIR}",
            "training_loop_ImplicitronTrainingLoop_args.metric_print_interval=10",
        ],
    )
    exp = Experiment(cfg)
    print(f"[rehearsal] {len(exp.data.train)} train sequences, "
          f"batch {exp.batch_size}", flush=True)
    t0 = time.perf_counter()
    state, stats = exp.run(max_epochs=MAX_EPOCHS, use_mesh=False)
    wall = time.perf_counter() - t0

    steps = MAX_EPOCHS * (EPOCH_FRAMES // exp.batch_size)
    for h in stats.history:
        tr = h.get("train", {})
        va = h.get("val", {})
        def g(d, k):
            v = d.get(k)
            return f"{v:.3f}" if isinstance(v, float) else str(v)
        print(
            f"[rehearsal] epoch {h['epoch']}: "
            f"objective={g(tr, 'objective')} psnr={g(tr, 'loss_rgb_psnr')} "
            f"val_objective={g(va, 'objective')} "
            f"val_psnr={g(va, 'loss_rgb_psnr')}",
            flush=True,
        )
    print(
        f"[rehearsal] {steps} release-scale steps + {MAX_EPOCHS} val epochs "
        f"+ ckpts in {wall:.0f}s wall ({steps / wall:.2f} steps/s incl. "
        f"compile, loader, val, checkpointing)",
        flush=True,
    )


if __name__ == "__main__":
    main()
