"""Multi-device tests on the virtual 8-device CPU mesh: SPMD train step,
gradient psum equivalence, optimizer factory, loss-aware sampler sync."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from holo_diffusion_tpu.data import FrameData, make_synthetic_scene
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
from holo_diffusion_tpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    shard_batch,
)
from holo_diffusion_tpu.train import make_lr_schedule, make_optimizer

TINY = dict(
    resol=4,
    volume_extent=3.0,
    feature_size=32,
    num_passes=2,
    n_train_target_views=1,
    n_pts_per_ray_training=8,
    n_pts_per_ray_fine_training=4,
    n_rays_per_image=32,
    render_image_height=8,
    render_image_width=8,
    scene_extent=1.2,
    net_3d_args=dict(
        model_channels=32, num_res_blocks=1, channel_mult=(1,),
        attention_resolutions=(), use_remat=False,
    ),
    diffusion_args=dict(num_steps=8, beta_start_unscaled=2e-6, beta_end_unscaled=4e-4),
    image_feature_extractor_args=dict(
        name_arch="resnet18", stages=(1,), proj_dim=4, image_rescale=0.5
    ),
    render_mlp_args=dict(dnet_hidden_dim=16, rnet_hidden_dim=16),
)


def _stacked_scenes(n_dev, n_views=3, image_size=16):
    scenes = [
        make_synthetic_scene(n_views=n_views, image_size=image_size, seed=i)
        for i in range(n_dev)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


@pytest.fixture(scope="module")
def setup():
    scene = make_synthetic_scene(n_views=3, image_size=16)
    model = HoloDiffusionModel(**TINY)
    variables = model.init(
        jax.random.PRNGKey(0),
        camera=scene.camera,
        image_rgb=scene.image_rgb,
        fg_probability=scene.fg_probability,
        mask_crop=scene.mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    tx = make_optimizer(breed="Adam", lr=1e-4)
    return model, variables, tx


def test_spmd_train_step_runs_on_mesh(setup):
    model, variables, tx = setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = TrainState.create(variables, tx)
    batch = shard_batch(_stacked_scenes(8), mesh)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert jnp.isfinite(metrics["objective"])
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_spmd_grads_equal_mean_of_per_device_grads(setup):
    """psum(grad)/n must equal the average of single-device grads."""
    model, variables, tx = setup
    mesh = make_mesh(n_devices=2)
    state = TrainState.create(variables, tx)
    stacked = _stacked_scenes(2)

    # reference: average of per-scene single-device updates' grads
    def single_grads(scene_idx, rng):
        local = jax.tree.map(lambda x: x[scene_idx], stacked)

        def loss_fn(params):
            preds = model.apply(
                {"params": params, **state.model_state},
                camera=local.camera,
                image_rgb=local.image_rgb,
                fg_probability=local.fg_probability,
                mask_crop=local.mask_crop,
                training=True,
                rng=rng,
                mutable=list(state.model_state.keys()),
            )[0]
            return preds["objective"]

        return jax.grad(loss_fn)(state.params)

    rng = jax.random.PRNGKey(7)
    g0 = single_grads(0, jax.random.fold_in(rng, 0))
    g1 = single_grads(1, jax.random.fold_in(rng, 1))
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)

    # SPMD step with SGD lr=1 -> new_params = params - g_mean
    sgd = optax.sgd(1.0)
    st = TrainState.create(variables, sgd)
    step = make_train_step(model, sgd, mesh=mesh, donate=False)
    batch = shard_batch(stacked, mesh)
    new_state, _ = step(st, batch, rng)
    expected = jax.tree.map(lambda p, g: p - g, st.params, g_mean)
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_single_device_step_matches_api(setup):
    model, variables, tx = setup
    state = TrainState.create(variables, tx)
    scene = make_synthetic_scene(n_views=3, image_size=16)
    step = make_train_step(model, tx, mesh=None, donate=False)
    new_state, metrics = step(state, scene, jax.random.PRNGKey(3))
    assert jnp.isfinite(metrics["objective"])


def test_lr_schedules():
    s = make_lr_schedule(1e-3, "MultiStepLR", gamma=0.1, multistep_lr_milestones=[2],
                         steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(25)) == pytest.approx(1e-4)
    s = make_lr_schedule(1e-3, "Exponential", gamma=0.1, exponential_lr_step_size=10,
                         steps_per_epoch=1)
    assert float(s(10)) == pytest.approx(1e-4)
    s = make_lr_schedule(
        1e-3, "LinearExponential", gamma=0.1,
        linear_exponential_lr_milestone=10, max_epochs=110, steps_per_epoch=1,
        linear_exponential_start_gamma=0.1,
    )
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(110)) == pytest.approx(1e-4, rel=1e-3)


def test_loss_aware_sampler_sync_across_devices():
    """The all-gathered (t, loss) update must be identical on every device."""
    from holo_diffusion_tpu.models import diffusion as gd

    mesh = make_mesh(n_devices=4)
    state = gd.LossSecondMomentState.create(8, history_per_term=2)

    def update(state, ts, losses):
        all_ts = jax.lax.all_gather(ts, "data").reshape(-1)
        all_losses = jax.lax.all_gather(losses, "data").reshape(-1)
        # mark the replicated state as device-varying so the scan carry types
        # match the all-gathered (varying) inputs
        state = jax.tree.map(lambda x: jax.lax.pcast(x, ("data",), to="varying"), state)
        return gd.loss_aware_update(state, all_ts, all_losses)

    from jax.sharding import PartitionSpec as P

    fn = jax.jit(
        jax.shard_map(
            update,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,  # the gathered update is replicated by construction
        )
    )
    ts = jnp.arange(8, dtype=jnp.int32) % 8
    losses = jnp.linspace(0.1, 1.0, 8)
    new_state = fn(state, ts, losses)
    assert int(jnp.sum(new_state.loss_counts)) == 8


def test_importance_scale_and_validity_mask():
    """Loss rescale w[t_main] * (w[t_boot] if taken) and the matching sampler
    credit mask (ADVICE r2: the ScheduleSampler.sample weights contract)."""
    from holo_diffusion_tpu.parallel.train_step import (
        importance_scale,
        ts_validity_mask,
    )

    w = jnp.array([2.0, 0.5])
    assert float(importance_scale(w, jnp.array(False))) == pytest.approx(2.0)
    assert float(importance_scale(w, jnp.array(True))) == pytest.approx(1.0)
    np.testing.assert_array_equal(
        ts_validity_mask(jnp.array(False)), [True, False]
    )
    np.testing.assert_array_equal(
        ts_validity_mask(jnp.array(True)), [True, True]
    )


def test_multi_step_scan_matches_sequential(setup):
    """K steps_per_call (one dispatch) must equal K sequential single steps."""
    model, variables, tx = setup
    sgd = optax.sgd(1e-3)
    stacked = _stacked_scenes(3, n_views=2, image_size=16)  # 3 "steps"

    # sequential
    st_a = TrainState.create(variables, sgd)
    step1 = make_train_step(model, sgd, mesh=None, donate=False)
    rng = jax.random.PRNGKey(11)
    rngs = jax.random.split(rng, 3)
    for i in range(3):
        batch_i = jax.tree.map(lambda x: x[i], stacked)
        st_a, _ = step1(st_a, batch_i, rngs[i])

    # one scanned dispatch
    st_b = TrainState.create(variables, sgd)
    step3 = make_train_step(model, sgd, mesh=None, donate=False, steps_per_call=3)
    st_b, metrics = step3(st_b, stacked, rng)

    assert int(st_b.step) == 3
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_multi_step_scan_on_mesh(setup):
    model, variables, tx = setup
    mesh = make_mesh(n_devices=2)
    # (K=2 steps, n_dev=2, B, ...)
    steps = [_stacked_scenes(2, n_views=2, image_size=16) for _ in range(2)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *steps)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, "data"))
    batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=mesh, donate=False, steps_per_call=2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(12))
    assert int(new_state.step) == 2
    assert jnp.isfinite(metrics["objective"])


def test_multihost_loader_shards_are_disjoint_and_aligned():
    """Per-process loader slices must (a) cover disjoint device blocks whose
    concatenation equals the single-process global batch, and (b) differ in
    content across hosts (disjoint per-host data; reference per-rank seeding,
    experiment.py:167)."""
    from holo_diffusion_tpu.data.source import SceneDataset, device_batched_loader
    from holo_diffusion_tpu.data.synthetic import make_synthetic_scene

    ds = SceneDataset(
        [make_synthetic_scene(n_views=4, image_size=8, seed=i) for i in range(6)]
    )
    n_dev, batch_size, n_batches, seed = 4, 2, 3, 123

    global_batches = list(
        device_batched_loader(ds, batch_size, n_batches, seed, n_dev)
    )
    local0 = list(device_batched_loader(ds, batch_size, n_batches, seed, n_dev,
                                        process_index=0, process_count=2))
    local1 = list(device_batched_loader(ds, batch_size, n_batches, seed, n_dev,
                                        process_index=1, process_count=2))
    for g, l0, l1 in zip(global_batches, local0, local1):
        assert l0.image_rgb.shape[0] == n_dev // 2
        np.testing.assert_array_equal(
            np.asarray(g.image_rgb[:2]), np.asarray(l0.image_rgb)
        )
        np.testing.assert_array_equal(
            np.asarray(g.image_rgb[2:]), np.asarray(l1.image_rgb)
        )
        # different hosts see different data
        assert not np.allclose(np.asarray(l0.image_rgb), np.asarray(l1.image_rgb))


def test_discriminator_optimizer_split():
    """Params under a 'discriminator' path step with the second optimizer
    (reference training_loop.py:563-569 vestigial GAN surface)."""
    import optax

    from holo_diffusion_tpu.train.optimizer import (
        make_optimizer,
        with_discriminator_optimizer,
    )

    params = {
        "net": {"w": jnp.ones((3,))},
        "discriminator": {"w": jnp.ones((3,))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    tx = with_discriminator_optimizer(
        optax.sgd(1.0), make_optimizer(breed="SGD", lr=0.1, momentum=0.0)
    )
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["net"]["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(new["discriminator"]["w"]), 0.9)


def test_spatially_sharded_unet_matches_single_device():
    """GSPMD spatial sharding of the 3D UNet (halo-exchanged convs) must be
    numerically identical to the unsharded forward — beyond-reference TP for
    large grids (SURVEY §7 phase 7)."""
    from holo_diffusion_tpu.models.unet3d import UNetModel3D
    from holo_diffusion_tpu.parallel.spatial import make_sharded_denoiser

    mesh = make_mesh(8)
    model = UNetModel3D(
        in_channels=32, model_channels=32, out_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
        use_remat=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 32))
    t = jnp.array([7], jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t)
    ref = model.apply(params, x, t)
    sharded = make_sharded_denoiser(model, mesh)
    out = sharded(params, x, t)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_spatially_sharded_sampling_matches_single_device():
    """One sharded p_sample step matches the unsharded step to float
    tolerance (a full sampling LOOP is a chaotic map — reduction-order
    noise amplifies across steps, so loop outputs are only checked for
    validity)."""
    from holo_diffusion_tpu.models import diffusion as gd
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.parallel.spatial import (
        make_sharded_denoiser,
        sample_random_voxel_features_sharded,
    )
    from holo_diffusion_tpu.sampling import _schedule

    mesh = make_mesh(8)
    model = HoloDiffusionModel(
        resol=8, feature_size=32, view_pooler_enabled=False,
        net_3d_args=dict(model_channels=32, num_res_blocks=1,
                         channel_mult=(1, 2), attention_resolutions=(2,),
                         use_remat=False),
        diffusion_args=dict(num_steps=8, beta_start_unscaled=8e-7,
                            beta_end_unscaled=1.6e-4),
        render_mlp_args=dict(dnet_hidden_dim=16, rnet_hidden_dim=8),
    )
    x0 = jnp.zeros((1, 8, 8, 8, 32))
    t0 = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, t0,
                        method=HoloDiffusionModel.apply_net_3d)

    # single p_sample step: sharded == unsharded
    sched = _schedule(model)
    x = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([5], jnp.int32)
    fwd = lambda xx, tt: model.apply(params, xx, tt,
                                     method=HoloDiffusionModel.apply_net_3d)
    ref = gd.p_sample(sched, fwd, x, t, jax.random.PRNGKey(4))["sample"]
    sharded_net = make_sharded_denoiser(model, mesh)
    fwd_sh = lambda xx, tt: sharded_net(params, xx, tt)
    got = gd.p_sample(sched, fwd_sh, x, t, jax.random.PRNGKey(4))["sample"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)

    # full sharded loop: distributed output, valid range
    out = sample_random_voxel_features_sharded(
        model, params, jax.random.PRNGKey(3), mesh
    )
    assert len(out.sharding.device_set) == 8
    arr = np.asarray(out)
    assert arr.shape == (1, 8, 8, 8, 32)
    assert np.isfinite(arr).all() and arr.min() >= -1.0 and arr.max() <= 1.0


def test_batch_sampling_sharded_over_mesh():
    """DP sample fleet: n_samples sharded one-grid-per-device — identical
    values to the unsharded batched run (with_sharding_constraint changes
    placement, not math), distributed output, samples mutually distinct."""
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.sampling import sample_random_voxel_features

    mesh = make_mesh(8)
    model = HoloDiffusionModel(
        resol=4, feature_size=32, view_pooler_enabled=False,
        net_3d_args=dict(model_channels=32, num_res_blocks=1,
                         channel_mult=(1,), attention_resolutions=(),
                         use_remat=False),
        diffusion_args=dict(num_steps=5, beta_start_unscaled=2e-5,
                            beta_end_unscaled=4e-3),
    )
    v = jnp.zeros((1, 4, 4, 4, 32))
    params = model.init(jax.random.PRNGKey(0), v, jnp.zeros((1,), jnp.int32),
                        method=HoloDiffusionModel.apply_net_3d)
    # commit params to ONE device, as a checkpoint restore does — the mesh
    # path must replicate them rather than reject committed args
    params = jax.device_put(params, jax.devices()[0])

    batched = sample_random_voxel_features(
        model, params, jax.random.PRNGKey(7), n_samples=8, mesh=mesh
    )
    assert batched.shape == (8, 4, 4, 4, 32)
    assert len(batched.sharding.device_set) == 8
    arr = np.asarray(batched)
    assert np.isfinite(arr).all() and np.abs(arr).max() <= 1.0
    # distinct samples (independent noise per batch element)
    assert not np.allclose(arr[0], arr[1])

    plain = sample_random_voxel_features(
        model, params, jax.random.PRNGKey(7), n_samples=8
    )
    np.testing.assert_allclose(arr, np.asarray(plain), atol=1e-5, rtol=1e-5)


def test_ema_params_track_training(setup):
    """ema_rate > 0 keeps an exponential moving average of params in the
    TrainState (guided_diffusion update_ema, nn.py:61-71)."""
    model, variables, tx = setup
    from holo_diffusion_tpu.data.synthetic import make_synthetic_scene

    scene = make_synthetic_scene(n_views=3, image_size=16)
    rate = 0.5  # aggressive rate so the difference is visible quickly
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(model, tx, mesh=None, donate=False, ema_rate=rate)
    p0 = jax.tree.map(np.asarray, state.params)
    for i in range(2):
        state, _ = step(state, scene, jax.random.PRNGKey(i))
    # manual replay of the ema recursion on a single leaf
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    # ema after 2 steps = r^2 p0 + r(1-r) p1 + (1-r) p2 — just check it lies
    # strictly between the initial and current params and differs from both
    e = leaf(state.ema_params)
    assert not np.allclose(e, leaf(state.params))
    assert not np.allclose(e, leaf(p0))
    # eval variables with ema swapped in work
    v = state.ema_variables()
    assert "params" in v


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("HD_TWO_PROC"),
    reason="2-real-process rehearsal (~7 min on 1 core); run with HD_TWO_PROC=1",
)
def test_two_process_rehearsal_script():
    """scripts/two_process_rehearsal.py: 2 OS processes x 2 virtual devices,
    jax.distributed + per-process loader shards + _shard_stepped; params must
    end bit-identical (VERDICT r2 #10)."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, "scripts/two_process_rehearsal.py"],
        capture_output=True, text=True, cwd=repo, timeout=1200,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert r.returncode == 0, r.stdout[-2000:]
    assert "params bit-identical OK" in r.stdout
