"""Pallas kernel tests (interpret mode on CPU): the one-hot MXU trilinear
sampler must agree exactly with the gather-based XLA reference, including the
linear-layer commutation identity used for fusion."""
import jax
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.ops.pallas.fused_render import (
    trilinear_sample_onehot_xla,
    trilinear_sample_pallas,
)
from holo_diffusion_tpu.ops.voxel import sample_voxel_grid_world


def _data(D=8, C=16, n=300, seed=0):
    rng = np.random.RandomState(seed)
    grid = jnp.asarray(rng.randn(D, D, D, C), jnp.float32)
    extent = 4.0
    half = extent * (D - 1) / D / 2 * 1.3  # include out-of-bounds points
    pts = jnp.asarray(rng.uniform(-half, half, (n, 3)), jnp.float32)
    return grid, pts, extent


def test_onehot_xla_matches_gather():
    grid, pts, extent = _data()
    ref = sample_voxel_grid_world(grid, pts, extent)
    out = trilinear_sample_onehot_xla(grid, pts, extent, block_n=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_matches_gather_interpret():
    grid, pts, extent = _data()
    ref = sample_voxel_grid_world(grid, pts, extent)
    out = trilinear_sample_pallas(grid, pts, extent, block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_multidim_points():
    grid, pts, extent = _data(n=256)
    pts3 = pts.reshape(2, 8, 16, 3)
    out = trilinear_sample_pallas(grid, pts3, extent, block_n=64, interpret=True)
    assert out.shape == (2, 8, 16, grid.shape[-1])
    ref = sample_voxel_grid_world(grid, pts3, extent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_linear_layer_commutes_with_trilinear():
    """sample(grid) @ W == sample(grid @ W): the fusion identity that lets the
    implicit function sample first-layer pre-activations directly."""
    grid, pts, extent = _data(C=8)
    Wmat = jnp.asarray(np.random.RandomState(1).randn(8, 24), jnp.float32)
    a = sample_voxel_grid_world(grid, pts, extent) @ Wmat
    proj_grid = jnp.einsum("dhwc,co->dhwo", grid, Wmat)
    b = sample_voxel_grid_world(proj_grid, pts, extent)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------------------
# Kronecker-factored fused sampler (ops/pallas/kron_sample.py)
# ---------------------------------------------------------------------------


def test_kron_sampler_matches_gather():
    from holo_diffusion_tpu.ops.pallas.kron_sample import trilinear_sample_fused

    for D, C in [(4, 8), (8, 32), (16, 64)]:
        grid, pts, extent = _data(D=D, C=C, n=300, seed=D)
        ref = sample_voxel_grid_world(grid, pts, extent)
        out = trilinear_sample_fused(grid, pts, extent, block_n=64,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kron_sampler_grid_cotangent_matches_gather():
    """d_grid is the VMEM-accumulated MXU transpose — must equal the gather
    sampler's scatter-add gradient exactly."""
    from holo_diffusion_tpu.ops.pallas.kron_sample import trilinear_sample_fused

    grid, pts, extent = _data(D=8, C=16, n=200, seed=3)
    ct = jnp.asarray(np.random.RandomState(4).randn(200, 16), jnp.float32)
    d_ref = jax.grad(
        lambda g: jnp.sum(sample_voxel_grid_world(g, pts, extent) * ct)
    )(grid)
    d_new = jax.grad(
        lambda g: jnp.sum(
            trilinear_sample_fused(g, pts, extent, block_n=64, interpret=True)
            * ct
        )
    )(grid)
    np.testing.assert_allclose(np.asarray(d_new), np.asarray(d_ref), atol=1e-4)


def test_kron_sampler_points_cotangent_matches_gather():
    """d_points (the autodiff-normals path) must match the gather sampler."""
    from holo_diffusion_tpu.ops.pallas.kron_sample import trilinear_sample_fused

    grid, pts, extent = _data(D=8, C=16, n=200, seed=5)
    ct = jnp.asarray(np.random.RandomState(6).randn(200, 16), jnp.float32)
    d_ref = jax.grad(
        lambda p: jnp.sum(sample_voxel_grid_world(grid, p, extent) * ct)
    )(pts)
    d_new = jax.grad(
        lambda p: jnp.sum(
            trilinear_sample_fused(grid, p, extent, block_n=64, interpret=True)
            * ct
        )
    )(pts)
    np.testing.assert_allclose(np.asarray(d_new), np.asarray(d_ref),
                               atol=1e-4, rtol=1e-4)


def test_kron_sampler_multidim_points():
    from holo_diffusion_tpu.ops.pallas.kron_sample import trilinear_sample_fused

    grid, pts, extent = _data(D=8, C=16, n=256, seed=7)
    pts3 = pts.reshape(2, 8, 16, 3)
    out = trilinear_sample_fused(grid, pts3, extent, block_n=64, interpret=True)
    assert out.shape == (2, 8, 16, 16)
    ref = sample_voxel_grid_world(grid, pts3, extent)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_sampler_full_model_equivalence():
    """The full implicit-function render must be sampler-agnostic: fused
    (interpret) == packed gather, forward and parameter gradients."""
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction

    rng = np.random.RandomState(11)
    D, C = 8, 32
    grid = jnp.tanh(jnp.asarray(rng.randn(D, D, D, C), jnp.float32))
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (2, 64, 12, 3)), jnp.float32)
    dirs = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)

    outs = {}
    grads = {}
    for sampler in ("packed", "fused"):
        fn = VoxelGridImplicitFunction(
            resol=D, volume_extent=4.0, n_hidden=C, feature_dim=0,
            render_mlp_args=dict(dnet_hidden_dim=32, rnet_hidden_dim=16),
            sampler=sampler,
        )
        variables = fn.init(jax.random.PRNGKey(0), grid, pts, dirs)
        def loss(v, g):
            dens, feats, _ = fn.apply(v, g, pts, dirs)
            return jnp.sum(dens ** 2) + jnp.sum(feats ** 2)
        outs[sampler] = float(loss(variables, grid))
        grads[sampler] = jax.grad(loss, argnums=(0, 1))(variables, grid)

    np.testing.assert_allclose(outs["fused"], outs["packed"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads["fused"]),
                    jax.tree.leaves(grads["packed"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_collapsed_density_net_equivalence():
    """collapse_density='on' (density MLP folded into the sampling matmul)
    must match the layer-by-layer path exactly — forward, parameter grads,
    and grid grads (the collapse is exact linear algebra)."""
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction

    rng = np.random.RandomState(17)
    D, C = 8, 32
    grid = jnp.tanh(jnp.asarray(rng.randn(D, D, D, C), jnp.float32))
    # include out-of-grid points: the collapsed bias must still apply there
    pts = jnp.asarray(rng.uniform(-2.5, 2.5, (2, 48, 10, 3)), jnp.float32)
    dirs = jnp.asarray(rng.randn(2, 48, 3), jnp.float32)

    outs, grads = {}, {}
    for collapse in ("off", "on"):
        fn = VoxelGridImplicitFunction(
            resol=D, volume_extent=4.0, n_hidden=C, feature_dim=0,
            render_mlp_args=dict(dnet_hidden_dim=48, rnet_hidden_dim=16,
                                 dnet_num_layers=4, dnet_input_skips=(2,)),
            sampler="fused", collapse_density=collapse,
        )
        variables = fn.init(jax.random.PRNGKey(0), grid, pts, dirs)

        def loss(v, g):
            dens, feats, _ = fn.apply(v, g, pts, dirs)
            return jnp.sum(dens ** 2) + jnp.sum(feats ** 2)

        outs[collapse] = float(loss(variables, grid))
        grads[collapse] = jax.grad(loss, argnums=(0, 1))(variables, grid)

    np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads["on"]),
                    jax.tree.leaves(grads["off"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)


def test_fused_decode_equivalence():
    """fuse_decode='on' (one-kernel sample + density affine + radiance head)
    must match the unfused implicit function — forward and gradients to every
    parameter and the grid."""
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction

    rng = np.random.RandomState(23)
    D, C = 8, 32
    grid = jnp.tanh(jnp.asarray(rng.randn(D, D, D, C), jnp.float32))
    pts = jnp.asarray(rng.uniform(-2.5, 2.5, (2, 40, 9, 3)), jnp.float32)
    dirs = jnp.asarray(rng.randn(2, 40, 3), jnp.float32)

    outs, grads = {}, {}
    for fuse in ("off", "on"):
        fn = VoxelGridImplicitFunction(
            resol=D, volume_extent=4.0, n_hidden=C, feature_dim=0,
            render_mlp_args=dict(dnet_hidden_dim=48, rnet_hidden_dim=16,
                                 dnet_num_layers=4, dnet_input_skips=(2,)),
            sampler="fused", fuse_decode=fuse, collapse_density="off",
        )
        variables = fn.init(jax.random.PRNGKey(0), grid, pts, dirs)
        assert fn.bind(variables).render_mlp.decode_is_fusable

        def loss(v, g):
            dens, feats, _ = fn.apply(v, g, pts, dirs)
            return jnp.sum(dens ** 2) + 2.0 * jnp.sum(feats ** 2)

        outs[fuse] = float(loss(variables, grid))
        grads[fuse] = jax.grad(loss, argnums=(0, 1))(variables, grid)

    np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-5)
    flat_on = jax.tree_util.tree_leaves_with_path(grads["on"])
    flat_off = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(grads["off"])
    )
    for k, a in flat_on:
        b = flat_off[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(k),
        )


def test_auto_selection_resolves_fused_on_tpu(monkeypatch):
    """With a (mocked) TPU backend, the hydrant-scale implicit function must
    trace through the fused sample+decode kernel by default — guards the
    auto-selection logic without real hardware."""
    from holo_diffusion_tpu.models import implicit as implicit_mod
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction

    rng = np.random.RandomState(3)
    D, C = 16, 64
    grid = jnp.tanh(jnp.asarray(rng.randn(D, D, D, C), jnp.float32))
    pts = jnp.asarray(rng.uniform(-2, 2, (1, 32, 8, 3)), jnp.float32)
    dirs = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)

    # hydrant-scale decoder (render_mlp_args, configs/hydrant.yaml:204-217)
    fn = VoxelGridImplicitFunction(
        resol=D, volume_extent=8.0, n_hidden=C, feature_dim=0,
        render_mlp_args=dict(dnet_hidden_dim=256, rnet_hidden_dim=128),
    )
    variables = fn.init(jax.random.PRNGKey(0), grid, pts, dirs)

    monkeypatch.setattr(implicit_mod.jax, "default_backend", lambda: "tpu")
    import holo_diffusion_tpu.ops.pallas.fused_decode as fd

    monkeypatch.setattr(fd.jax, "default_backend", lambda: "tpu", raising=False)
    jaxpr = jax.make_jaxpr(lambda v, g: fn.apply(v, g, pts, dirs))(
        variables, grid
    )
    assert "pallas_call" in str(jaxpr)

    # a too-large grid must NOT pick the fused kernel (falls back to gather)
    big = jnp.zeros((32, 32, 32, 128), jnp.float32)
    pts2 = jnp.asarray(rng.uniform(-2, 2, (1, 8, 4, 3)), jnp.float32)
    fn_big = VoxelGridImplicitFunction(
        resol=32, volume_extent=8.0, n_hidden=128, feature_dim=0,
        render_mlp_args=dict(dnet_hidden_dim=256, rnet_hidden_dim=128),
    )
    v_big = fn_big.init(jax.random.PRNGKey(0), big, pts2, dirs[:, :8])
    jaxpr_big = jax.make_jaxpr(
        lambda v, g: fn_big.apply(v, g, pts2, dirs[:, :8])
    )(v_big, big)
    assert "pallas_call" not in str(jaxpr_big)


def test_fused_decode_normals_lanes_equivalence():
    """fuse_decode='on' + render_normals=True emits the analytic density-field
    gradient from the SAME kernel (lanes 4:7) — it must match the separate
    trilinear_point_gradient path (fuse_decode='off') exactly, and must not
    perturb densities/colour or the parameter gradients."""
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction

    rng = np.random.RandomState(29)
    D, C = 8, 32
    grid = jnp.tanh(jnp.asarray(rng.randn(D, D, D, C), jnp.float32))
    # off voxel-boundary planes (measure-zero subgradient ambiguity)
    pts = jnp.asarray(rng.uniform(-1.93, 1.97, (2, 40, 9, 3)), jnp.float32)
    dirs = jnp.asarray(rng.randn(2, 40, 3), jnp.float32)

    outs, grads, normals = {}, {}, {}
    for fuse in ("off", "on"):
        fn = VoxelGridImplicitFunction(
            resol=D, volume_extent=4.0, n_hidden=C, feature_dim=0,
            render_normals=True,
            render_mlp_args=dict(dnet_hidden_dim=48, rnet_hidden_dim=16,
                                 dnet_num_layers=4, dnet_input_skips=(2,)),
            sampler="fused", fuse_decode=fuse, collapse_density="off",
        )
        variables = fn.init(jax.random.PRNGKey(0), grid, pts, dirs)

        def loss(v, g):
            dens, feats, aux = fn.apply(v, g, pts, dirs)
            return (
                jnp.sum(dens ** 2) + 2.0 * jnp.sum(feats ** 2),
                aux["normals"],
            )

        (outs[fuse], normals[fuse]), grads[fuse] = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(variables, grid)

    np.testing.assert_allclose(float(outs["on"]), float(outs["off"]),
                               rtol=1e-5)
    assert normals["on"].shape == pts.shape
    np.testing.assert_allclose(
        np.asarray(normals["on"]), np.asarray(normals["off"]),
        atol=5e-5, rtol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(grads["on"]),
                    jax.tree.leaves(grads["off"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)
