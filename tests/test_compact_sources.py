"""Compact-source batches (data/compact.py): host-side mask+rescale of the
pooling sources must reproduce the full-resolution device path (same resize
kernel, same preprocessing order) up to u8 re-quantization, and plumb through
the train step / Experiment loop unchanged.

Reference being optimized: the release recipe feeds all 33 frames at 800^2 to
the device and rescales sources inside the extractor
(/root/reference/configs/hydrant.yaml:167-182); on a host-fed TPU the
full-res batch is wire-bound, so the rescale moves host-side."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.data import make_synthetic_scene
from holo_diffusion_tpu.data.compact import SourceCompactor
from holo_diffusion_tpu.data.frame_data import FrameData
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel

TINY = dict(
    resol=8,
    volume_extent=3.0,
    feature_size=32,
    num_passes=2,
    n_train_target_views=2,
    n_pts_per_ray_training=16,
    n_pts_per_ray_fine_training=8,
    n_pts_per_ray_evaluation=16,
    n_pts_per_ray_fine_evaluation=8,
    n_rays_per_image=64,
    render_image_height=16,
    render_image_width=16,
    scene_extent=1.2,
    net_3d_enabled=False,
    diffusion_enabled=False,
    image_feature_extractor_args=dict(
        name_arch="resnet18", stages=(1, 2), proj_dim=8, image_rescale=0.5
    ),
    view_pooler_args=dict(
        aggregator_class_type="AngleWeightedReductionFeatureAggregator"
    ),
    render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_views=6, image_size=24)


@pytest.fixture(scope="module")
def model_and_params(scene):
    model = HoloDiffusionModel(**TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        camera=scene.camera,
        image_rgb=scene.image_rgb,
        fg_probability=scene.fg_probability,
        mask_crop=scene.mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    return model, params


def _apply(model, params, batch, rng_seed=2):
    return model.apply(
        params,
        camera=batch.camera,
        image_rgb=batch.image_rgb,
        fg_probability=batch.fg_probability,
        mask_crop=batch.mask_crop,
        depth_map=batch.depth_map,
        src_image_rgb=batch.src_image_rgb,
        src_fg_probability=batch.src_fg_probability,
        src_mask_crop=batch.src_mask_crop,
        training=True,
        rng=jax.random.PRNGKey(rng_seed),
    )


def test_extractor_prerescaled_exact(scene, model_and_params):
    """The precision anchor: the ResNet feature branch fed a host-pre-resized
    image with rescale_done=True must match the device path that resizes
    internally EXACTLY — same `resize_image` kernel, just placed earlier."""
    from holo_diffusion_tpu.models.feature_extractor import ResNetFeatureExtractor
    from holo_diffusion_tpu.ops.image import resize_image

    ex = ResNetFeatureExtractor(
        name_arch="resnet18", stages=(1, 2), proj_dim=8, image_rescale=0.5
    )
    img = jnp.asarray(scene.image_rgb[:3])
    fg = jnp.asarray(scene.fg_probability[:3])
    variables = ex.init(jax.random.PRNGKey(0), img, fg)
    full = ex.apply(variables, img, fg)
    pre = resize_image(img, 12, 12)
    comp = ex.apply(variables, pre, resize_image(fg, 12, 12), rescale_done=True)
    for k in ("res_layer_1", "res_layer_2"):
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(comp[k]), atol=1e-5
        )
    # the raw view-sampler channels are the documented approximation: they
    # come out at the compact resolution instead of full res
    assert comp["images"].shape == (3, 12, 12, 3)
    assert full["images"].shape == (3, 24, 24, 3)


@pytest.mark.parametrize("host_resize", ["exact", "native"])
def test_compact_forward_matches_full(scene, model_and_params, host_resize):
    """End-to-end: the compact path differs from the full path by (a) u8
    re-quantization of the resized sources (amplified here by train-mode
    BatchNorm on a random-init ResNet at 12^2 — far noisier than release
    scale), (b) the 4 raw images/masks channels sampled from prefiltered
    maps, and for "native" (c) the bilinear-vs-antialiased resize delta (the
    delta the reference's F.interpolate has vs our device kernel). The
    pooled grid must stay close and the objective must agree."""
    model, params = model_and_params
    full = _apply(model, params, scene)
    comp = SourceCompactor.from_model(model, host_resize=host_resize)
    cb = comp(scene)
    # layout: 2 targets full-res, 4 sources at 12^2 u8
    assert cb.image_rgb.shape[0] == 2
    assert cb.src_image_rgb.shape == (4, 12, 12, 3)
    assert cb.src_image_rgb.dtype == np.uint8
    out = _apply(model, params, cb)
    g1 = np.asarray(full["voxel_features"])
    g2 = np.asarray(out["voxel_features"])
    assert np.abs(g1 - g2).max() < 0.3
    assert np.abs(g1 - g2).mean() < 0.02
    assert abs(float(full["objective"]) - float(out["objective"])) < 0.1 * (
        abs(float(full["objective"])) + 1e-3
    )


def test_split_arithmetic_matches_model():
    comp = SourceCompactor(
        n_train_target_views=3, image_rescale=0.5, mask_images=True,
        mask_threshold=0.5, bg_color=(1.0, 1.0, 1.0),
    )
    # mirror holo_model.__call__: nt = min(n_train, B); if B <= nt: nt = 1
    assert comp.n_targets(33) == 3
    assert comp.n_targets(4) == 3
    assert comp.n_targets(3) == 1
    assert comp.n_targets(2) == 1
    assert comp.n_targets(1) == 1
    comp_all = SourceCompactor(
        n_train_target_views=0, image_rescale=0.5, mask_images=True,
        mask_threshold=0.5, bg_color=(1.0, 1.0, 1.0),
    )
    assert comp_all.n_targets(5) == 1  # B <= nt -> 1


def test_no_compaction_when_no_sources(scene):
    comp = SourceCompactor(
        n_train_target_views=0, image_rescale=0.5, mask_images=True,
        mask_threshold=0.5, bg_color=(1.0, 1.0, 1.0),
    )
    # nt collapses to 1 -> sources exist; but a 1-frame batch has none
    one = scene[0]
    assert comp(one) is one


def test_compact_drop_depth(scene, model_and_params):
    model, _ = model_and_params
    comp = SourceCompactor.from_model(model, drop_depth=True)
    cb = comp(scene)
    assert cb.depth_map is None


def test_compact_train_step(scene, model_and_params):
    from holo_diffusion_tpu.parallel import TrainState, make_train_step
    import optax

    model, params = model_and_params
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)
    cb = SourceCompactor.from_model(model)(scene)
    new_state, metrics = step(state, cb, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["objective"]))
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_async_loader_transfer_order():
    from holo_diffusion_tpu.data.source import AsyncLoader

    items = list(range(20))
    out = list(AsyncLoader(iter(items), transfer=lambda x: x * 10))
    assert out == [x * 10 for x in items]


def test_async_loader_transfer_error_propagates():
    from holo_diffusion_tpu.data.source import AsyncLoader

    def bad(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    with pytest.raises(RuntimeError, match="boom"):
        list(AsyncLoader(iter(range(5)), transfer=bad))


@pytest.mark.slow
def test_experiment_compact_e2e(tmp_path):
    """Full TrainingLoop with compact_sources over the 8-device CPU mesh:
    device_batched_loader applies the compactor BEFORE the device stack, the
    AsyncLoader worker shards/places, and the SPMD step consumes src_*."""
    from test_experiment import _tiny_synthetic_cfg

    from holo_diffusion_tpu.config import apply_dotted_overrides
    from holo_diffusion_tpu.experiment import Experiment

    cfg = _tiny_synthetic_cfg(tmp_path)
    apply_dotted_overrides(
        cfg,
        [
            "compact_sources=true",
            "data_source_ImplicitronDataSource_args."
            "data_loader_map_provider_SequenceDataLoaderMapProvider_args."
            "dataset_length_train=48",
            "training_loop_ImplicitronTrainingLoop_args.max_epochs=1",
        ],
    )
    exp = Experiment(cfg)
    state, stats = exp.run()
    tr = stats.history[-1]["train"]
    assert np.isfinite(tr["objective"])
    # depth is auto-dropped only when no depth loss is weighted; either way
    # the loop must complete and checkpoint
    assert os.path.exists(os.path.join(str(tmp_path), "exp"))


def test_stats_sec_per_it_is_per_stat_set():
    from holo_diffusion_tpu.train.stats import Stats

    st = Stats()
    st.new_epoch()
    # a "long" train epoch
    st.update({"objective": 1.0}, "train")
    time.sleep(0.25)
    st.update({"objective": 1.0}, "train")
    # val starts now — its sec/it must NOT inherit the 0.25 s train window
    st.update({"objective": 1.0}, "val")
    time.sleep(0.05)
    st.update({"objective": 1.0}, "val")
    train_spi = st.averages("train")["sec/it"]
    val_spi = st.averages("val")["sec/it"]
    assert train_spi >= 0.2
    assert val_spi < 0.2


def test_stats_sec_per_it_single_update_set():
    """A stat set that receives exactly ONE update in an epoch (e.g.
    n_batches_val=1) must report a real window — the time since the previous
    update event — not ~0 (its own clock starts at its only update)."""
    from holo_diffusion_tpu.train.stats import Stats

    st = Stats()
    st.new_epoch()
    st.update({"objective": 1.0}, "train")
    time.sleep(0.1)
    st.update({"objective": 1.0}, "val")  # the val iteration took ~0.1 s
    val_spi = st.averages("val")["sec/it"]
    assert 0.05 <= val_spi <= 1.0, val_spi


def test_compact_scene_sampler_matches_transform(scene, model_and_params):
    """CompactSceneSampler (per-scene compact cache) must produce
    byte-identical batches to applying SourceCompactor per batch: same rng
    consumption order, per-frame-deterministic compaction."""
    from holo_diffusion_tpu.data.compact import CompactSceneSampler
    from holo_diffusion_tpu.data.source import SceneDataset

    model, _ = model_and_params
    scenes = [scene, make_synthetic_scene(n_views=5, image_size=24, seed=7)]
    ds = SceneDataset(scenes)
    comp = SourceCompactor.from_model(model)
    sampler = CompactSceneSampler(ds, comp, max_cached_scenes=1)

    def assert_same(a, b):
        la = jax.tree.leaves(a)
        lb = jax.tree.leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    for k, B in [(0, 5), (1, 4), (2, 5), (3, 2), (4, 1)]:
        ref = comp(ds.sample_batch(np.random.RandomState(k), B))
        got = sampler.sample_batch(np.random.RandomState(k), B)
        assert_same(ref, got)
    # repeat draws hit the LRU cache (max 1 scene) and stay identical
    ref = comp(ds.sample_batch(np.random.RandomState(0), 5))
    got = sampler.sample_batch(np.random.RandomState(0), 5)
    assert_same(ref, got)
    assert len(sampler._cache) == 1


def test_compact_scene_sampler_uses_get_scene(scene, model_and_params):
    """Datasets exposing get_scene (the CO3D lazy loader) are driven through
    it so their own LRU/lazy machinery is exercised, not .scenes."""
    from holo_diffusion_tpu.data.compact import CompactSceneSampler
    from holo_diffusion_tpu.data.source import SceneDataset

    model, _ = model_and_params
    calls = []

    class LazyDS(SceneDataset):
        def get_scene(self, i):
            calls.append(i)
            return self.scenes[i]

    ds = LazyDS([scene])
    comp = SourceCompactor.from_model(model)
    sampler = CompactSceneSampler(ds, comp)
    out = sampler.sample_batch(np.random.RandomState(0), 5)
    assert calls == [0]
    assert out.src_image_rgb is not None
    assert out.src_image_rgb.dtype == np.uint8
    assert out.image_rgb.shape[0] == comp.n_targets(5)


def test_extractor_dtype_config_knob():
    """image_feature_extractor_ResNetFeatureExtractor_args.dtype=bfloat16
    (our extension) must reach the extractor and flip conv compute to bf16
    (BN/outputs stay f32) — the measured 11.3 -> 8.8 ms release-scale lever."""
    import re

    from holo_diffusion_tpu.config import (
        apply_dotted_overrides,
        load_config,
        model_args_from_config,
    )
    from holo_diffusion_tpu.models.feature_extractor import (
        ResNetFeatureExtractor,
    )

    cfg = load_config("synthetic_debug.yaml")
    apply_dotted_overrides(
        cfg,
        [
            "model_factory_ImplicitronModelFactory_args."
            "model_HoloDiffusionModel_args."
            "image_feature_extractor_ResNetFeatureExtractor_args."
            "dtype=bfloat16",
        ],
    )
    args = model_args_from_config(cfg)["image_feature_extractor_args"]
    assert args["dtype"] == "bfloat16"
    m = ResNetFeatureExtractor(
        name_arch="resnet18", stages=(1,), proj_dim=4, image_rescale=0.5,
        dtype=args["dtype"],
    )
    x = jnp.ones((1, 32, 32, 3))
    f = jnp.ones((1, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, f)
    jaxpr = str(jax.make_jaxpr(lambda v: m.apply(v, x, f))(v))
    outs = {
        d
        for _, d in re.findall(
            r"(\w+):(bf16|f32)\[[\d,]*\] = conv_general_dilated", jaxpr
        )
    }
    assert outs == {"bf16"}
    # outputs remain f32 (mixed precision: f32 params/BN/heads)
    out = m.apply(v, x, f)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(out))
