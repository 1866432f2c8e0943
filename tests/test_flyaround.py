"""Flyaround/inference tests: trajectories, video writer, sample-mode and
reconstruction-mode render loops."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.data import make_synthetic_scene
from holo_diffusion_tpu.geometry.cameras import camera_centers
from holo_diffusion_tpu.models.holo_model import HoloDiffusionModel
from holo_diffusion_tpu.utils.flyaround import (
    fitted_trajectory_cameras,
    render_flyaround,
    simple_360_cameras,
)
from holo_diffusion_tpu.utils.video import VideoWriter

TINY = dict(
    resol=4,
    volume_extent=3.0,
    feature_size=32,
    num_passes=2,
    n_train_target_views=1,
    n_pts_per_ray_training=8,
    n_pts_per_ray_fine_training=4,
    n_pts_per_ray_evaluation=8,
    n_pts_per_ray_fine_evaluation=4,
    n_rays_per_image=16,
    render_image_height=12,
    render_image_width=12,
    scene_extent=1.2,
    net_3d_args=dict(
        model_channels=32, num_res_blocks=1, channel_mult=(1,),
        attention_resolutions=(), use_remat=False,
    ),
    diffusion_args=dict(num_steps=6, beta_start_unscaled=6e-7, beta_end_unscaled=1.2e-4),
    image_feature_extractor_args=dict(
        name_arch="resnet18", stages=(1,), proj_dim=4, image_rescale=0.5
    ),
    render_mlp_args=dict(dnet_hidden_dim=16, rnet_hidden_dim=16),
)


def test_simple_360_orbit_geometry():
    cams = simple_360_cameras(8, dist=5.0, elevation=0.0)
    centers = np.asarray(camera_centers(cams))
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 5.0, atol=1e-4)
    # distinct azimuths
    assert np.abs(centers[0] - centers[4]).max() > 1.0


def test_fitted_circular_trajectory():
    train = simple_360_cameras(12, dist=4.0, elevation=20.0)
    traj = fitted_trajectory_cameras(train, n_poses=10, trajectory_type="circular_lsq_fit")
    centers = np.asarray(camera_centers(traj))
    # all poses at roughly the same distance from the scene center
    d = np.linalg.norm(centers, axis=-1)
    assert d.std() / d.mean() < 0.05
    for t in ("figure_eight", "trefoil_knot", "figure_eight_knot"):
        tc = fitted_trajectory_cameras(train, n_poses=6, trajectory_type=t)
        assert np.isfinite(np.asarray(tc.R)).all()


def test_video_writer_gif(tmp_path):
    vw = VideoWriter(str(tmp_path / "test.mp4"), fps=5)
    for i in range(4):
        vw.write_frame(np.full((8, 8, 3), i / 4.0))
    out = vw.get_video()
    assert out is not None and os.path.exists(out)


@pytest.mark.slow
def test_render_flyaround_sample_mode(tmp_path):
    scene = make_synthetic_scene(n_views=4, image_size=12)
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
    out = render_flyaround(
        model, params, str(tmp_path / "sample"), sample_mode=True,
        n_flyaround_poses=3, trajectory_distance=4.0,
    )
    assert "images_render" in out and os.path.exists(out["images_render"])
    assert os.path.exists(out["depths_render"])

    # precomputed-grid path (generate_samples pre-samples grids in one
    # mesh-sharded SPMD batch and hands each to render_flyaround)
    grid = jnp.tanh(
        jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 4, 32))
    )
    out2 = render_flyaround(
        model, params, str(tmp_path / "pre"), sample_mode=True,
        n_flyaround_poses=2, trajectory_distance=4.0, voxel_features=grid,
    )
    assert "images_render" in out2 and os.path.exists(out2["images_render"])

    # accelerated strided-DDIM sampling (use_ddim=true max_iter=N in the CLI)
    out3 = render_flyaround(
        model, params, str(tmp_path / "ddim"), sample_mode=True,
        n_flyaround_poses=2, trajectory_distance=4.0,
        sample_use_ddim=True, sample_max_iter=3,
    )
    assert "images_render" in out3 and os.path.exists(out3["images_render"])


@pytest.mark.slow
def test_render_flyaround_reconstruction_mode(tmp_path):
    scene = make_synthetic_scene(n_views=5, image_size=12)
    cfg = dict(TINY)
    cfg.update(net_3d_enabled=False, diffusion_enabled=False)
    model = HoloDiffusionModel(**cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        camera=scene.camera,
        image_rgb=scene.image_rgb,
        fg_probability=scene.fg_probability,
        mask_crop=scene.mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    out = render_flyaround(
        model, params, str(tmp_path / "recon"), scene=scene, sample_mode=False,
        n_flyaround_poses=2, n_source_views=3,
        trajectory_type="circular_lsq_fit",
    )
    assert os.path.exists(out["images_render"])


@pytest.mark.slow
def test_render_flyaround_progressive(tmp_path):
    scene = make_synthetic_scene(n_views=4, image_size=12)
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
    out = render_flyaround(
        model, params, str(tmp_path / "prog"), sample_mode=True,
        n_flyaround_poses=3, progressive_sampling_steps_per_render=2,
    )
    assert os.path.exists(out["images_render"])


@pytest.mark.slow
def test_render_flyaround_chunked(tmp_path):
    """chunk_size_grid > 0 routes flyaround frames through the chunked
    renderer (same constant-memory path as the val epoch) — release configs
    render 512^2 frames, where one full-grid program is an HBM gamble."""
    scene = make_synthetic_scene(n_views=4, image_size=12)
    model = HoloDiffusionModel(**{**TINY, "chunk_size_grid": 256})
    params = model.init(
        jax.random.PRNGKey(0),
        camera=scene.camera,
        image_rgb=scene.image_rgb,
        fg_probability=scene.fg_probability,
        mask_crop=scene.mask_crop,
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    out = render_flyaround(
        model, params, str(tmp_path / "chunked"), sample_mode=True,
        n_flyaround_poses=2, trajectory_distance=4.0,
    )
    assert "images_render" in out and os.path.exists(out["images_render"])
    assert os.path.exists(out["masks_render"])

    # occupancy empty-space skip: one density probe per grid, reused across
    # the trajectory's poses (ops/occupancy.py; eval-only)
    out2 = render_flyaround(
        model, params, str(tmp_path / "skip"), sample_mode=True,
        n_flyaround_poses=2, trajectory_distance=4.0, empty_space_skip=True,
    )
    assert "images_render" in out2 and os.path.exists(out2["images_render"])
