"""Experiment: config -> model/optimizer/data/loop -> run.

Rebuild of the reference's `Experiment` + `ImplicitronTrainingLoop`
(experiment.py:108-290, trainer/training_loop.py:47-712) without the
Implicitron registry: plain constructors driven by the same YAML surface.

Training runs as ONE jit'd SPMD step over a `data` mesh (scene-per-device DP,
SURVEY.md §2.9) instead of DDP; resume-by-default finds the last epoch
checkpoint and restores model+optimizer+stats (SURVEY.md §3.5).
"""
from __future__ import annotations

import contextlib
import logging
import os
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    data_source_args_from_config,
    dump_expconfig,
    model_args_from_config,
    optimizer_args_from_config,
    training_loop_args_from_config,
)
from .data.source import AsyncLoader, SyntheticDataProvider, device_batched_loader, epoch_loader
from .models.holo_model import HoloDiffusionModel
from .parallel import TrainState, make_eval_step, make_mesh, make_train_step, shard_batch
from .parallel.mesh import replicate


def _shard_stepped(batch, mesh, axis_name: str = "data"):
    """Place (K, n_dev, ...) step-stacked batches: sharded on axis 1.
    Multi-process: each host passes its (K, n_local_dev, ...) slice."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, axis_name))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
from .train import make_lr_schedule, make_optimizer
from .train.checkpoint import restore_checkpoint, save_checkpoint
from .train.stats import Stats
from .utils.profiling import SteadyStateProfiler

logger = logging.getLogger(__name__)


def _model_cfg_log_vars(cfg):
    """Optional `log_vars` list from the model config
    (holo_diffusion_model.py:78-109); None -> log everything scalar."""
    m = cfg.get("model_factory_ImplicitronModelFactory_args", {}).get(
        "model_HoloDiffusionModel_args", {}
    )
    return m.get("log_vars")


def seed_all_random_engines(seed: int):
    """np/python seeding (trainer/utils.py:24-27); jax PRNG is explicit."""
    import random

    np.random.seed(seed)
    random.seed(seed)


class Experiment:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.seed = cfg.get("seed", 42)
        self.exp_dir = cfg.get("exp_dir", "./experiments/run")
        # surface any config keys nothing consumes (a user feeding a genuine
        # reference expconfig.yaml must see which knobs don't carry over)
        from .config.config import audit_unconsumed_keys

        audit_unconsumed_keys(cfg)
        seed_all_random_engines(self.seed)
        if cfg.get("detect_anomaly", False):
            # jax_debug_nans (reference detect_anomaly, experiment.py:181-184)
            from .utils.profiling import enable_anomaly_detection

            enable_anomaly_detection(True)

        self.model_args = model_args_from_config(cfg)
        self.model = HoloDiffusionModel(**self.model_args)
        self.opt_args = optimizer_args_from_config(cfg)
        self.loop_args = training_loop_args_from_config(cfg)
        self.data_args = data_source_args_from_config(cfg)
        self.data = self._build_data_source()

        self.batch_size = self.data_args["batch_size"]
        self.n_batches_train = max(
            1, self.data_args["dataset_length_train"] // self.batch_size
        )
        self.n_batches_val = max(
            1, self.data_args["dataset_length_val"] // max(self.batch_size, 1)
        )

        sched = make_lr_schedule(
            lr=self.opt_args["lr"],
            lr_policy=self.opt_args["lr_policy"],
            gamma=self.opt_args["gamma"],
            multistep_lr_milestones=self.opt_args["multistep_lr_milestones"],
            exponential_lr_step_size=self.opt_args["exponential_lr_step_size"],
            linear_exponential_lr_milestone=self.opt_args[
                "linear_exponential_lr_milestone"
            ],
            linear_exponential_start_gamma=self.opt_args[
                "linear_exponential_start_gamma"
            ],
            max_epochs=self.loop_args["max_epochs"],
            steps_per_epoch=self.n_batches_train,
        )
        self.tx = make_optimizer(
            breed=self.opt_args["breed"],
            lr=self.opt_args["lr"],
            betas=self.opt_args["betas"],
            momentum=self.opt_args["momentum"],
            weight_decay=self.opt_args["weight_decay"],
            clip_grad=self.loop_args["clip_grad"],
            schedule=sched,
            group_learning_rates=self.opt_args["group_learning_rates"],
        )
        # timestep-sampler selection (diffusion_utils.py:97,113)
        diff_args = self.model_args.get("diffusion_args") or {}
        self.schedule_sampler = (
            diff_args.get("schedule_sampler_type", "uniform")
            if self.model_args.get("diffusion_enabled", True)
            else "uniform"
        )

    # ------------------------------------------------------------------
    def _build_data_source(self):
        ds_cfg = self.cfg.get("data_source_ImplicitronDataSource_args", {})
        provider = ds_cfg.get("dataset_map_provider_class_type",
                              "JsonIndexDatasetMapProviderV2")
        if provider == "SyntheticDataProvider":
            args = ds_cfg.get("dataset_map_provider_SyntheticDataProvider_args", {})
            return SyntheticDataProvider(seed=self.seed, **args)
        # CO3Dv2
        from .data.co3d import CO3DDataProvider

        return CO3DDataProvider(**self.data_args)

    def init_state(self) -> TrainState:
        sample = self.data.train.sample_batch(
            np.random.RandomState(self.seed), self.batch_size
        )
        # jit the init: un-jitted flax init dispatches op-by-op, which over
        # the TPU tunnel takes >20 min at the release batch scale (33@800^2);
        # one compiled program runs in ~1-2 min including compile
        def _init(rng, camera, image_rgb, fg_probability, mask_crop, rng2):
            return self.model.init(
                rng,
                camera=camera,
                image_rgb=image_rgb,
                fg_probability=fg_probability,
                mask_crop=mask_crop,
                training=True,
                rng=rng2,
            )

        variables = jax.jit(_init)(
            jax.random.PRNGKey(self.seed),
            sample.camera,
            jnp.asarray(sample.image_rgb),
            jnp.asarray(sample.fg_probability),
            jnp.asarray(sample.mask_crop),
            jax.random.PRNGKey(self.seed + 1),
        )
        n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
        logger.info(f"model has {n_params / 1e6:.2f}M params")
        sampler_state = None
        if self.schedule_sampler == "loss-second-moment":
            from .models import diffusion as gd

            sampler_state = gd.LossSecondMomentState.create(
                (self.model_args.get("diffusion_args") or {}).get("num_steps", 1000)
            )
        return TrainState.create(
            variables, self.tx, sampler_state=sampler_state,
            ema=float(self.cfg.get("ema_rate", 0.0)) > 0.0,
        )

    # ------------------------------------------------------------------
    def _val_epoch(self, state, stats, rng, eval_step, epoch):
        """One EVALUATION epoch over the val set (training_loop.py:253-265).

        Large dense renders (chunk_size_grid > 0, hydrant.yaml:103-112) go
        through the CHUNKED renderer — constant device memory at any render
        size; small ones keep the single fused full-grid eval program.
        """
        use_chunked = (
            (self.model.chunk_size_grid or 0) > 0
            and self.model.sampling_mode_evaluation == "full_grid"
        )
        out = None
        val_data = getattr(self, "_val_data", None) or self.data.val
        for batch in epoch_loader(
            val_data, self.batch_size, self.n_batches_val, self.seed + epoch
        ):
            rng, step_rng = jax.random.split(rng)
            if use_chunked:
                out = self._eval_batch_chunked(state, batch, step_rng)
            else:
                out = eval_step(state, batch, step_rng)
            stats.update(
                {k: v for k, v in out.items() if jnp.ndim(v) == 0}, "val"
            )
        return out

    def _eval_batch_chunked(self, state, batch, rng):
        """EVALUATION forward of one batch via the chunked renderer: encode a
        grid from the source views (frames 1:), render target frame 0 densely
        in `chunk_size_grid` ray chunks, score on the host."""
        from .render_eval import make_chunk_render_fn, render_image_chunked

        model = self.model
        if getattr(self, "_encode_jit", None) is None:
            from .models.holo_model import HoloDiffusionModel

            self._encode_jit = jax.jit(
                lambda v, cam, img, fg, mc, pre: model.apply(
                    v, cam, img, fg, mc, pre,
                    method=HoloDiffusionModel.encode_eval,
                ),
                static_argnums=(5,),
            )
            self._chunk_render_jit = make_chunk_render_fn(model)

        variables = state.variables()
        n = batch.camera.batch_size
        if batch.src_image_rgb is not None:
            # compact batch (data/compact.py): targets-first camera, sources
            # already host-masked + rescaled to the extractor input res
            n_t = batch.image_rgb.shape[0]
            grid = self._encode_jit(
                variables,
                batch.camera[n_t:],
                batch.src_image_rgb,
                batch.src_fg_probability,
                batch.src_mask_crop,
                True,
            )
        else:
            src = slice(1, None) if n > 1 else slice(0, None)
            grid = self._encode_jit(
                variables,
                batch.camera[src],
                batch.image_rgb[src],
                None
                if batch.fg_probability is None
                else batch.fg_probability[src],
                None if batch.mask_crop is None else batch.mask_crop[src],
                False,
            )
        out = render_image_chunked(
            model,
            variables,
            batch.camera[:1],
            grid,
            chunk_renderer=lambda g, b: self._chunk_render_jit(variables, g, b),
        )
        # host-side metrics vs the (preprocessed, resized) target frame
        from .models.metrics import preprocess_input

        gt, fg, _ = preprocess_input(
            batch.image_rgb[:1],
            None if batch.fg_probability is None else batch.fg_probability[:1],
            None,
            model.mask_images,
            model.mask_depths,
            model.mask_threshold,
            model.bg_color,
        )
        H, W = model.render_image_height, model.render_image_width
        gt = jax.image.resize(gt[0], (H, W, 3), "bilinear")
        pred = jnp.asarray(out["images_render"])
        mse = jnp.mean((pred - gt) ** 2)
        result = {
            "loss_rgb_mse": mse,
            "loss_rgb_psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            "images_render": pred[None],
            "depths_render": jnp.asarray(out["depths_render"])[None],
            "masks_render": jnp.asarray(out["masks_render"])[None],
        }
        if fg is not None:
            fg_r = jax.image.resize(fg[0], (H, W, 1), "bilinear") > 0.5
            denom = jnp.maximum(fg_r.sum() * 3, 1)
            mse_fg = jnp.sum(((pred - gt) ** 2) * fg_r) / denom
            result["loss_rgb_psnr_fg"] = -10.0 * jnp.log10(
                jnp.maximum(mse_fg, 1e-12)
            )
        return result

    def run_eval_only(self, use_ema: Optional[bool] = None):
        """Evaluation-only mode (training_loop.py:177-193): restore the last
        (or requested) checkpoint, run the novel-view-synthesis evaluator over
        the held-out scenes, dump json to exp_dir, return the results.

        use_ema: evaluate through the EMA parameters (requires a checkpoint
        trained with ema_rate > 0); None reads the `eval_use_ema` config key."""
        from .evaluation import evaluate_new_view_synthesis

        if use_ema is None:
            use_ema = bool(self.cfg.get("eval_use_ema", False))
        os.makedirs(self.exp_dir, exist_ok=True)
        state = self.init_state()
        epoch = -1
        mf = self.cfg.get("model_factory_ImplicitronModelFactory_args", {})
        if mf.get("resume", True):
            restored, ep = restore_checkpoint(
                self.exp_dir, state, mf.get("resume_epoch", -1)
            )
            if restored is not None:
                state, epoch = restored, ep
                logger.info(f"eval_only: restored epoch {ep}")
            elif mf.get("force_resume", False):
                raise FileNotFoundError(
                    f"force_resume: no checkpoint in {self.exp_dir}"
                )
            else:
                logger.warning("eval_only: no checkpoint found; evaluating "
                               "the freshly initialized model")
        if use_ema:
            if state.ema_params is None:
                raise ValueError(
                    "eval_use_ema: the checkpoint carries no EMA parameters "
                    "(train with ema_rate > 0)"
                )
            state = state.replace(params=state.ema_params)
        # CO3D challenge protocol: when the provider loaded dataset-provided
        # eval batches (load_eval_batches, base.yaml:23-31), evaluate exactly
        # those target/known-frame sets instead of inventing targets
        eval_batches = None
        if getattr(self.data, "eval_batches", None):
            # lazy: real CO3D has thousands of eval batches of full-res
            # frames — assemble each on demand, never all at once
            eval_batches = (
                self.data.get_eval_batch(i)
                for i in range(len(self.data.eval_batches))
            )
            scenes = []
        else:
            eval_ds = self.data.val if len(self.data.val) else self.data.train
            scenes = eval_ds.iter_scenes()
        perceptual_fn = None
        lpips_vgg = self.cfg.get("lpips_vgg_weights_path")
        if lpips_vgg:
            from .models.lpips import load_lpips_from_torch_files

            perceptual_fn = load_lpips_from_torch_files(
                lpips_vgg, self.cfg.get("lpips_lin_weights_path")
            )
        # camera-difficulty bins (reference evaluator config,
        # base.yaml evaluator_ImplicitronEvaluator_args)
        ev = self.loop_args.get("evaluator_ImplicitronEvaluator_args", {})
        res = evaluate_new_view_synthesis(
            self.model,
            jax.device_get(state.variables()),
            scenes,
            difficulty_bin_breaks=tuple(
                ev.get("camera_difficulty_bin_breaks", (0.97, 0.98))
            ),
            perceptual_fn=perceptual_fn,
            eval_batches=eval_batches,
            dump_path=os.path.join(
                self.exp_dir, f"eval_results_epoch_{max(epoch, 0):08d}.json"
            ),
        )
        logger.info(f"eval_only results: {res['overall']}")
        return res

    def run(self, max_epochs: Optional[int] = None, use_mesh: bool = True):
        os.makedirs(self.exp_dir, exist_ok=True)
        dump_expconfig(self.cfg, self.exp_dir)
        if self.loop_args.get("eval_only"):
            return self.run_eval_only()

        mesh = make_mesh() if (use_mesh and jax.device_count() > 1) else None
        n_dev = mesh.devices.size if mesh is not None else 1
        # scan K optimizer steps inside one dispatch (amortizes host->device
        # dispatch latency; our extension, default 1)
        steps_per_dispatch = max(1, int(self.cfg.get("steps_per_dispatch", 1)))

        # compact-source batches (our extension, data/compact.py): host-side
        # mask+rescale of the pooling sources before transfer — the release
        # batch (33 @ 800^2) is ~147 MB/step of which only the n_targets
        # render-target frames need full resolution; compaction cuts H2D ~5x
        compactor = None
        if self.cfg.get("compact_sources", False):
            from .data.compact import SourceCompactor

            drop_depth = self.cfg.get("compact_drop_depth", "auto")
            if drop_depth == "auto":
                # depth is safe to drop when no depth term is in the objective
                from .models.holo_model import DEFAULT_LOSS_WEIGHTS

                weights = (
                    self.model.loss_weights
                    if self.model.loss_weights is not None
                    else DEFAULT_LOSS_WEIGHTS
                )
                drop_depth = not any(
                    "depth" in k and w != 0.0 for k, w in weights.items()
                )
            compactor = SourceCompactor.from_model(
                self.model,
                drop_depth=bool(drop_depth),
                host_resize=self.cfg.get("compact_host_resize", "native"),
            )

        # per-scene compact cache (data/compact.py CompactSceneSampler):
        # compaction is deterministic per frame, so do it once per scene
        # touch instead of once per batch — the batch transform alone paces
        # the release loop on a 1-core host (bench r3: 3.0 steps/s host-bound
        # vs ~10 steps/s device ceiling). Built ONCE here so the LRU cache
        # persists across epochs.
        train_data = self.data.train
        if compactor is not None and self.cfg.get("compact_scene_cache", True):
            from .data.compact import CompactSceneSampler, SourceCompactor as _SC

            n_cached = int(self.cfg.get("compact_cached_scenes", 4))
            train_data = CompactSceneSampler(
                self.data.train, compactor, max_cached_scenes=n_cached
            )
            if self.cfg.get("compact_val", True):
                # EVALUATION batches split 1 target + (B-1) sources
                # (holo_model.__call__ eval branch); compact the val sources
                # too — a release val batch is otherwise ~147 MB of H2D
                val_comp = _SC(
                    n_train_target_views=1,
                    image_rescale=compactor.image_rescale,
                    mask_images=compactor.mask_images,
                    mask_threshold=compactor.mask_threshold,
                    bg_color=compactor.bg_color,
                    drop_depth=compactor.drop_depth,
                    host_resize=compactor.host_resize,
                )
                self._val_data = CompactSceneSampler(
                    self.data.val, val_comp, max_cached_scenes=n_cached
                )

        # packed transfer (our extension, data/packing.py): ship each dispatch
        # group as ONE flat uint8 buffer — the H2D path of a high-latency
        # transport is latency-bound PER ARRAY (~50 ms x ~11 FrameData leaves
        # measured on the TPU tunnel), so one buffer pays one latency. The
        # jitted step unpacks with static slices + bitcasts (bit-exact).
        packer = None
        if self.cfg.get("packed_transfer", False) and mesh is None:
            if self.loop_args.get("whole_dataset_batch"):
                logger.warning(
                    "packed_transfer ignored with whole_dataset_batch (the "
                    "replayed batch is already device-resident)"
                )
            else:
                from .data.packing import BatchPacker

                packer = BatchPacker()

        state = self.init_state()
        log_vars = _model_cfg_log_vars(self.cfg)
        stats = Stats.load_or_new(
            os.path.join(self.exp_dir, "train_stats.json"), log_vars=log_vars
        )
        start_epoch = 0
        mf = self.cfg.get("model_factory_ImplicitronModelFactory_args", {})
        if mf.get("resume", True):
            restored, ep = restore_checkpoint(
                self.exp_dir, state, mf.get("resume_epoch", -1)
            )
            if restored is not None:
                state, start_epoch = restored, ep + 1
                logger.info(f"resumed from epoch {ep}")
            elif mf.get("force_resume", False):
                raise FileNotFoundError(
                    f"force_resume: no checkpoint in {self.exp_dir}"
                )

        if mesh is not None:
            state = replicate(state, mesh)
        train_step = make_train_step(
            self.model, self.tx, mesh=mesh, donate=True,
            steps_per_call=steps_per_dispatch,
            schedule_sampler=self.schedule_sampler,
            # EMA of params (our extension; guided_diffusion update_ema,
            # nn.py:61-71 — sampling can use state.ema_variables())
            ema_rate=float(self.cfg.get("ema_rate", 0.0)),
            packer=packer,
        )
        eval_step = make_eval_step(self.model)

        max_epochs = max_epochs or self.loop_args["max_epochs"]
        print_interval = self.loop_args["metric_print_interval"]
        val_interval = self.loop_args["validation_interval"]
        vis_interval = self.loop_args.get("visualize_interval", 0)
        test_interval = self.loop_args.get("test_interval", -1)
        stats.epoch = start_epoch - 1

        for epoch in range(start_epoch, max_epochs):
            # per-epoch reseed (training_loop.py:232-234) with the reference's
            # per-rank offset (seed + 10000 * rank, experiment.py:167)
            seed_all_random_engines(
                self.seed + epoch + 10000 * jax.process_index()
            )
            stats.new_epoch()
            rng = jax.random.PRNGKey(self.seed + epoch)

            n_host_batches = max(
                1, self.n_batches_train // (n_dev * steps_per_dispatch)
            )
            if self.loop_args.get("whole_dataset_batch"):
                # collate once, replay on-device every iteration
                # (training_loop.py:127,715-739 _WholeDatasetLoader)
                if mesh is not None:
                    raise NotImplementedError(
                        "whole_dataset_batch is a single-device debug/overfit "
                        "mode (one batch replayed); run with --no-mesh"
                    )
                from .data.source import WholeDatasetLoader

                loader = WholeDatasetLoader(
                    self.data.train, self.batch_size,
                    n_host_batches * steps_per_dispatch, self.seed,
                )
            elif mesh is not None:
                loader = device_batched_loader(
                    train_data, self.batch_size,
                    n_host_batches * steps_per_dispatch, self.seed + epoch, n_dev,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    # the scene-cache sampler compacts inside sample_batch;
                    # otherwise compact per batch BEFORE the device stack
                    transform=(
                        compactor if train_data is self.data.train else None
                    ),
                )
            else:
                loader = epoch_loader(
                    train_data, self.batch_size,
                    n_host_batches * steps_per_dispatch, self.seed + epoch,
                )
                if compactor is not None and train_data is self.data.train:
                    loader = map(compactor, loader)

            # packed mode stacks on the HOST (np.stack): the group must stay
            # host-side so pack() can view its bytes; jnp.stack would commit
            # each leaf to the device eagerly (one latency payment per leaf)
            _stack = np.stack if packer is not None else jnp.stack

            def _group_steps(it):
                """Stack steps_per_dispatch batches on a leading step axis."""
                if steps_per_dispatch == 1:
                    yield from it
                    return
                group = []
                for b in it:
                    group.append(b)
                    if len(group) == steps_per_dispatch:
                        yield jax.tree.map(lambda *xs: _stack(xs), *group)
                        group = []
                if group:
                    # the scan needs exactly K batches; Experiment sizes the
                    # loader to a multiple of K so this never fires here, but
                    # surface it loudly for any caller with uneven counts
                    logger.warning(
                        f"dropping trailing partial dispatch group of "
                        f"{len(group)} < {steps_per_dispatch} batches"
                    )

            # the worker thread also performs the H2D placement (sharded under
            # a mesh, plain device_put otherwise) so the copy of batch N+1
            # overlaps the device step on batch N
            if mesh is not None:
                transfer = (
                    (lambda b: shard_batch(b, mesh))
                    if steps_per_dispatch == 1
                    else (lambda b: _shard_stepped(b, mesh))
                )
            elif packer is not None:
                from .data.packing import packed_transfer

                transfer = packed_transfer(packer)
            else:
                transfer = jax.device_put

            # training_loop.profile=true: the reference exports chrome traces
            # of fwd/bwd (torch.profiler, training_loop.py:463-473,525-538);
            # here a BOUNDED Perfetto trace of the first steady-state
            # dispatches of the first profiled epoch (compile excluded —
            # SteadyStateProfiler docstring; `profile_steps` bounds it).
            profiler = (
                SteadyStateProfiler(
                    os.path.join(self.exp_dir, "traces"),
                    int(self.loop_args.get("profile_steps", 3)),
                )
                if self.loop_args.get("profile") and epoch == start_epoch
                else None
            )
            # Metric fetch is deferred by one dispatch: device_get(step N)
            # would block the host until step N finishes, serializing host
            # and device (the reference pays the same sync at
            # training_loop.py:490-494 — CUDA sync on the loss read). Holding
            # one pending metrics pytree lets the host dispatch step N+1 (and
            # the AsyncLoader H2D of N+2) while N executes; stats ordering is
            # preserved by the FIFO. Status-line prints flush fully so the
            # printed averages include the current step.
            pending = deque()

            def _flush(keep: int) -> None:
                while len(pending) > keep:
                    stats.update(jax.device_get(pending.popleft()), "train")

            for it, batch in enumerate(
                AsyncLoader(_group_steps(loader), transfer=transfer)
            ):
                if profiler is not None:
                    profiler.before_dispatch(it)
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, batch, step_rng)
                if profiler is not None:
                    profiler.after_dispatch(it, metrics)
                pending.append(metrics)
                if print_interval and it % print_interval == 0:
                    _flush(0)
                    logger.info(stats.status_line("train"))
                else:
                    _flush(1)
            _flush(0)
            if profiler is not None:
                profiler.finish(state.params)

            # validation epoch (EVALUATION mode, training_loop.py:253-265)
            if (
                val_interval > 0
                and epoch % val_interval == 0
                and not self.cfg.get("disable_validation", False)
            ):
                rng, val_rng = jax.random.split(rng)
                out = self._val_epoch(state, stats, val_rng, eval_step, epoch)
                logger.info(stats.status_line("val"))
                # per-interval image dumps (visdom replacement,
                # training_loop.py:501-516)
                if vis_interval and epoch % vis_interval == 0:
                    from .utils.vis import visualize_preds

                    visualize_preds(
                        out, os.path.join(self.exp_dir, "visuals"), "val", epoch
                    )
                    # denoising-video stream (holo_diffusion_model.py:598-616);
                    # fall back to a train-scene camera when the val split is
                    # empty (ADVICE r2: camera=None crashed in
                    # render_image_chunked at visualization time)
                    if self.cfg.get("visualize_denoising_video", False):
                        dv_camera = None
                        if len(self.data.val):
                            dv_camera = self.data.val.get_scene(0).camera[:1]
                        elif len(self.data.train):
                            dv_camera = self.data.train.get_scene(0).camera[:1]
                        if dv_camera is None:
                            logger.warning(
                                "visualize_denoising_video: no scenes in any "
                                "split; skipping the denoising-video dump"
                            )
                        else:
                            from .utils.vis import denoising_video

                            rng, dv_rng = jax.random.split(rng)
                            denoising_video(
                                self.model,
                                jax.device_get(state.variables()),
                                os.path.join(
                                    self.exp_dir, "visuals",
                                    f"denoising_{epoch:08d}.mp4",
                                ),
                                dv_camera,
                                dv_rng,
                            )

            # periodic test eval (training_loop.py:273-279)
            if (
                test_interval > 0
                and epoch % test_interval == 0
                and not self.cfg.get("disable_testing", True)
            ):
                from .evaluation import evaluate_new_view_synthesis

                res = evaluate_new_view_synthesis(
                    self.model,
                    jax.device_get(state.variables()),
                    (self.data.val if len(self.data.val)
                     else self.data.train).first_scenes(4),
                    dump_path=os.path.join(
                        self.exp_dir, f"eval_epoch_{epoch:08d}.json"
                    ),
                )
                logger.info(f"test eval @ {epoch}: {res['overall']}")

            stats.finalize_epoch()
            if self.loop_args["store_checkpoints"]:
                save_checkpoint(
                    self.exp_dir,
                    epoch,
                    state,
                    stats,
                    purge=self.loop_args["store_checkpoints_purge"],
                )
                if jax.process_index() == 0:
                    from .utils.vis import plot_stats_pdf, write_dashboard_html

                    try:
                        plot_stats_pdf(
                            stats, os.path.join(self.exp_dir, "train_stats.pdf")
                        )
                        write_dashboard_html(stats, self.exp_dir)
                    except Exception as e:  # noqa: BLE001
                        logger.warning(f"stats plot failed: {e}")

        if self.loop_args.get("test_when_finished") and not self.cfg.get(
            "disable_testing", True
        ):
            from .evaluation import evaluate_new_view_synthesis

            evaluate_new_view_synthesis(
                self.model,
                jax.device_get(state.variables()),
                (self.data.val if len(self.data.val)
                 else self.data.train).first_scenes(4),
                dump_path=os.path.join(self.exp_dir, "eval_final.json"),
            )
        return state, stats
