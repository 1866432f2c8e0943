"""Packed single-buffer H2D transfer (data/packing.py).

The TPU-tunnel lever: a dispatch group's ~11 pytree leaves each pay the
transport's per-array latency; packing them into one uint8 buffer pays it
once, and the jitted step rebuilds the leaves with static slices + bitcasts
(bit-exact round-trip asserted here). No reference counterpart — the
reference's CUDA-local dataloader pins memory instead (configs/base.yaml:61).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.data.packing import BatchPacker, packed_transfer


def _mixed_tree(seed=0):
    r = np.random.RandomState(seed)
    return {
        "f32": r.randn(3, 5, 2).astype(np.float32),
        "f16": r.randn(7).astype(np.float16),
        "u8": r.randint(0, 256, (4, 4, 3), dtype=np.uint8),
        "i32": r.randint(-1000, 1000, (6,), dtype=np.int32),
        "bool": r.rand(5, 2) > 0.5,
        "nested": {"a": r.randn(2, 2).astype(np.float32), "none": None},
    }


def test_pack_unpack_roundtrip_bit_exact():
    tree = _mixed_tree()
    packer = BatchPacker(tree)
    buf = packer.pack(tree)
    assert buf.dtype == np.uint8 and buf.ndim == 1
    assert buf.nbytes == sum(x.nbytes for x in jax.tree.leaves(tree))
    out = jax.jit(packer.unpack)(jnp.asarray(buf))
    for orig, got in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert got.dtype == orig.dtype
        np.testing.assert_array_equal(np.asarray(got), orig)


def test_pack_lazy_spec_and_structure_guard():
    packer = BatchPacker()  # spec captured from the first pack
    tree = _mixed_tree()
    buf = packer.pack(tree)
    out = packer.unpack(jnp.asarray(buf))
    np.testing.assert_array_equal(np.asarray(out["f32"]), tree["f32"])
    with pytest.raises(ValueError):
        packer.pack({"different": np.zeros(3, np.float32)})
    bad = dict(tree)
    bad["f32"] = tree["f32"].astype(np.float64)
    with pytest.raises(ValueError):
        packer.pack(bad)


def test_packed_transfer_one_device_buffer():
    tree = _mixed_tree()
    packer = BatchPacker(tree)
    dev = packed_transfer(packer)(tree)
    assert isinstance(dev, jax.Array) and dev.dtype == jnp.uint8
    out = packer.unpack(dev)
    np.testing.assert_array_equal(np.asarray(out["u8"]), tree["u8"])


def test_packed_train_step_equivalence():
    """make_train_step(packer=...) must be bit-identical to the plain step
    on a FrameData dispatch group (K=2) — params and metrics."""
    from holo_diffusion_tpu.data import make_synthetic_scene
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.parallel import TrainState, make_train_step
    from holo_diffusion_tpu.train import make_optimizer
    from tests.test_parallel import TINY

    model = HoloDiffusionModel(**TINY)
    scenes = [
        jax.tree.map(
            np.asarray, make_synthetic_scene(n_views=3, image_size=16, seed=i)
        )
        for i in range(2)
    ]
    group = jax.tree.map(lambda *xs: np.stack(xs), *scenes)
    variables = model.init(
        jax.random.PRNGKey(0),
        camera=scenes[0].camera,
        image_rgb=scenes[0].image_rgb,
        fg_probability=scenes[0].fg_probability,
        mask_crop=scenes[0].mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    tx = make_optimizer(breed="Adam", lr=1e-4)
    rng = jax.random.PRNGKey(2)

    plain = make_train_step(model, tx, mesh=None, donate=False,
                            steps_per_call=2)
    st_a, met_a = plain(
        TrainState.create(variables, tx), jax.tree.map(jnp.asarray, group), rng
    )

    packer = BatchPacker(group)
    packed = make_train_step(model, tx, mesh=None, donate=False,
                             steps_per_call=2, packer=packer)
    st_b, met_b = packed(
        TrainState.create(variables, tx), jnp.asarray(packer.pack(group)), rng
    )

    np.testing.assert_array_equal(
        np.asarray(met_a["objective"]), np.asarray(met_b["objective"])
    )
    for pa, pb in zip(
        jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_packer_rejects_mesh():
    from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
    from holo_diffusion_tpu.parallel import make_mesh, make_train_step
    from holo_diffusion_tpu.train import make_optimizer
    from tests.test_parallel import TINY

    with pytest.raises(ValueError, match="single-device"):
        make_train_step(
            HoloDiffusionModel(**TINY),
            make_optimizer(breed="Adam", lr=1e-4),
            mesh=make_mesh(),
            packer=BatchPacker(),
        )


@pytest.mark.slow
def test_experiment_packed_transfer(tmp_path):
    """packed_transfer=true through the Experiment loop (steps_per_dispatch=2,
    no mesh): identical objective trajectory to the unpacked loop — packing
    is a transport change, not a numeric one."""
    from holo_diffusion_tpu.config import apply_dotted_overrides
    from holo_diffusion_tpu.experiment import Experiment
    from tests.test_experiment import _tiny_synthetic_cfg

    def run(subdir, extra):
        cfg = _tiny_synthetic_cfg(tmp_path / subdir)
        apply_dotted_overrides(cfg, ["steps_per_dispatch=2"] + extra)
        exp = Experiment(cfg)
        _, stats = exp.run(max_epochs=1, use_mesh=False)
        return stats.history[0]["train"]["objective"]

    obj_plain = run("plain", [])
    obj_packed = run("packed", ["packed_transfer=true"])
    assert np.isfinite(obj_packed)
    assert obj_plain == obj_packed
