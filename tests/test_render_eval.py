"""Chunked eval rendering must match the unchunked full-grid render exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.data import make_synthetic_scene
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
from holo_diffusion_tpu.render_eval import render_image_chunked

TINY = dict(
    resol=4,
    volume_extent=3.0,
    feature_size=32,
    num_passes=2,
    net_3d_enabled=False,
    diffusion_enabled=False,
    view_pooler_enabled=False,
    n_pts_per_ray_evaluation=8,
    n_pts_per_ray_fine_evaluation=4,
    render_image_height=12,
    render_image_width=12,
    scene_extent=1.2,
    render_mlp_args=dict(dnet_hidden_dim=16, rnet_hidden_dim=16),
)


def test_chunked_matches_unchunked():
    scene = make_synthetic_scene(n_views=2, image_size=12)
    model = HoloDiffusionModel(**TINY)
    grid = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 32)), -1, 1)
    variables = model.init(
        jax.random.PRNGKey(1),
        camera=scene.camera[:1],
        voxel_features=grid[None],
        training=False,
    )
    preds = model.apply(
        variables, camera=scene.camera[:1], voxel_features=grid[None], training=False
    )
    # the eval path re-feeds through net_3d at t=0 only when net_3d_enabled;
    # disabled here so the grid used is identical
    chunked = render_image_chunked(
        model, variables, scene.camera, grid, chunk_size_grid=5 * 8
    )
    np.testing.assert_allclose(
        chunked["images_render"],
        np.asarray(preds["images_render"][0]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        chunked["depths_render"], np.asarray(preds["depths_render"][0]), atol=1e-5
    )
    np.testing.assert_allclose(
        chunked["masks_render"], np.asarray(preds["masks_render"][0]), atol=1e-5
    )


def test_chunk_autoscale_policy(monkeypatch):
    """On accelerator backends, config-derived chunks are raised to the
    measured TPU minimum; explicit chunk_size_grid and CPU are untouched."""
    import holo_diffusion_tpu.render_eval as re_mod

    calls = []

    scene = make_synthetic_scene(n_views=2, image_size=12)
    model = HoloDiffusionModel(chunk_size_grid=5 * 8, **TINY)
    grid = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 32)), -1, 1)
    variables = model.init(
        jax.random.PRNGKey(1),
        camera=scene.camera[:1],
        voxel_features=grid[None],
        training=False,
    )
    renderer = re_mod.make_chunk_renderer(model, variables)

    def spy_renderer(voxel_grid, bundle):
        calls.append(bundle.lengths.shape[1])
        return renderer(voxel_grid, bundle)

    # CPU backend (the test env): config chunking honored exactly (5 rays)
    calls.clear()
    render_image_chunked(model, variables, scene.camera, grid,
                         chunk_renderer=spy_renderer)
    assert calls and calls[0] == 5

    # pretend accelerator: config-derived chunk is autoscaled up
    monkeypatch.setattr(re_mod, "_on_accelerator", lambda: True)
    calls.clear()
    render_image_chunked(model, variables, scene.camera, grid,
                         chunk_renderer=spy_renderer)
    # bump is capped at the image size: whole 12x12 image in one chunk
    assert calls == [144]

    # explicit argument stays exact even on accelerator
    calls.clear()
    render_image_chunked(model, variables, scene.camera, grid,
                         chunk_size_grid=5 * 8, chunk_renderer=spy_renderer)
    assert calls and calls[0] == 5

    # opt-out flag restores reference chunking
    calls.clear()
    render_image_chunked(model, variables, scene.camera, grid,
                         chunk_autoscale=False, chunk_renderer=spy_renderer)
    assert calls and calls[0] == 5


def test_sharded_render_matches_single_device():
    from holo_diffusion_tpu.parallel import make_mesh
    from holo_diffusion_tpu.render_eval import render_image_sharded

    scene = make_synthetic_scene(n_views=1, image_size=12)
    model = HoloDiffusionModel(**TINY)
    grid = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 32)), -1, 1)
    variables = model.init(
        jax.random.PRNGKey(1),
        camera=scene.camera[:1],
        voxel_features=grid[None],
        training=False,
    )
    ref = render_image_chunked(model, variables, scene.camera, grid)
    mesh = make_mesh()
    out = render_image_sharded(model, variables, scene.camera, grid, mesh)
    np.testing.assert_allclose(
        out["images_render"], ref["images_render"], atol=1e-5
    )
    np.testing.assert_allclose(
        out["depths_render"], ref["depths_render"], atol=1e-4
    )
