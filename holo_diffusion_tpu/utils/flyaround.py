"""Fly-around rendering: camera trajectories + the inference render loop.

Rebuild of the reference's render_utils/flyaround.py:44-503 and Implicitron's
`generate_eval_video_cameras`: trajectory generation (simple_360 look-at orbit
with up-vector rotation via so3_exp_map, circular least-squares fit, figure
eight / trefoil / figure-eight knots), sample-mode vs reconstruction-mode
batches, progressive-denoise animation, per-key video export.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.frame_data import FrameData
from ..geometry.cameras import (
    PerspectiveCameras,
    camera_centers,
    look_at_rotation,
    look_at_view_transform,
    so3_exp_map,
)
from ..models.holo_model import HoloDiffusionModel
from ..sampling import (
    sample_random_voxel_features,
    sample_random_voxel_features_progressive,
)
from .shaded_depth import depth_to_shaded, shaded_from_normals
from .video import VideoWriter

logger = logging.getLogger(__name__)

# CO3D's canonical up axis (visualize_reconstruction.py:35)
CANONICAL_CO3D_UP_AXIS = (-0.0396, -0.8306, -0.5554)


def simple_360_cameras(
    n_poses: int = 40,
    dist: float = 15.0,
    elevation: float = 15.0,
    up=(0.0, 1.0, 0.0),
    at=(0.0, 0.0, 0.0),
    focal: float = 2.0,
    azimuth_offset: float = 0.0,
) -> PerspectiveCameras:
    """Look-at orbit over azimuths with the world rotated so `up` is the pose
    axis (flyaround.py:301-350). `azimuth_offset` rotates the whole orbit —
    used by evaluate_samples to decorrelate per-sample pose subsets."""
    azim = azimuth_offset + jnp.linspace(0.0, 360.0, n_poses, endpoint=False)
    R, T = look_at_view_transform(dist=dist, elev=elevation, azim=azim, at=at)
    up = np.asarray(up, np.float32)
    up = up / np.linalg.norm(up)
    y = np.array([0.0, 1.0, 0.0], np.float32)
    # rotation aligning +y with the requested up axis (via axis-angle)
    axis = np.cross(y, up)
    s = np.linalg.norm(axis)
    if s > 1e-6:
        angle = float(np.arctan2(s, np.dot(y, up)))
        R_up = so3_exp_map(jnp.asarray(axis / s * angle)[None])[0]
        R = jnp.einsum("ij,bjk->bik", R_up.T, R)
    return PerspectiveCameras(
        R=R,
        T=T,
        focal_length=jnp.full((n_poses, 2), focal),
        principal_point=jnp.zeros((n_poses, 2)),
    )


def _fit_plane(centers: np.ndarray):
    """Least-squares plane through camera centers: (centroid, basis e1, e2, n)."""
    c0 = centers.mean(0)
    u, s, vt = np.linalg.svd(centers - c0, full_matrices=False)
    e1, e2, n = vt[0], vt[1], vt[2]
    return c0, e1, e2, n


def fitted_trajectory_cameras(
    train_cameras: PerspectiveCameras,
    n_poses: int = 40,
    trajectory_type: str = "circular_lsq_fit",
    scene_center=(0.0, 0.0, 0.0),
    focal: Optional[float] = None,
    trajectory_scale: float = 1.1,
) -> PerspectiveCameras:
    """Implicitron `generate_eval_video_cameras` equivalent: fit a smooth
    closed curve to the training camera centers and place look-at cameras on
    it. Supported: circular_lsq_fit, figure_eight, trefoil_knot,
    figure_eight_knot (flyaround.py:194-213)."""
    centers = np.asarray(camera_centers(train_cameras))
    c0, e1, e2, n = _fit_plane(centers)
    # circle radius: mean in-plane distance
    d = centers - c0
    r = float(np.sqrt(((d @ e1) ** 2 + (d @ e2) ** 2).mean())) * trajectory_scale
    t = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)

    if trajectory_type == "circular_lsq_fit":
        xy = np.stack([np.cos(t), np.sin(t)], -1) * r
        z = np.zeros_like(t)
    elif trajectory_type == "figure_eight":
        xy = np.stack([np.cos(t), np.sin(2 * t) / 2], -1) * r
        z = np.zeros_like(t)
    elif trajectory_type == "trefoil_knot":
        xy = np.stack([np.sin(t) + 2 * np.sin(2 * t), np.cos(t) - 2 * np.cos(2 * t)], -1)
        xy = xy / 3.0 * r
        z = -np.sin(3 * t) / 3.0 * r
    elif trajectory_type == "figure_eight_knot":
        xy = np.stack(
            [
                (2 + np.cos(2 * t)) * np.cos(3 * t),
                (2 + np.cos(2 * t)) * np.sin(3 * t),
            ],
            -1,
        ) / 3.0 * r
        z = np.sin(4 * t) / 3.0 * r
    else:
        raise ValueError(f"unknown trajectory {trajectory_type}")

    eye = c0[None] + xy[:, :1] * e1[None] + xy[:, 1:2] * e2[None] + z[:, None] * n[None]
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.broadcast_to(jnp.asarray(scene_center, jnp.float32), eye.shape)
    up_vec = jnp.broadcast_to(jnp.asarray(-n, jnp.float32), eye.shape)
    R = look_at_rotation(eye, at, up_vec)
    T = -jnp.einsum("bi,bij->bj", eye, R)
    if focal is None:
        focal_arr = jnp.broadcast_to(
            jnp.mean(train_cameras.focal_length, axis=0, keepdims=True),
            (n_poses, 2),
        )
    else:
        focal_arr = jnp.full((n_poses, 2), focal)
    return PerspectiveCameras(
        R=R, T=T, focal_length=focal_arr, principal_point=jnp.zeros((n_poses, 2))
    )


def render_flyaround(
    model: HoloDiffusionModel,
    params,
    output_path: str,
    scene: Optional[FrameData] = None,
    sample_mode: bool = True,
    n_flyaround_poses: int = 40,
    n_source_views: int = 9,
    trajectory_type: str = "simple_360",
    trajectory_distance: float = 15.0,
    up=CANONICAL_CO3D_UP_AXIS,
    rng: Optional[jax.Array] = None,
    progressive_sampling_steps_per_render: int = -1,
    video_fps: int = 20,
    save_voxel_features: bool = False,
    seed: int = 0,
    shaded_depth_method: str = "gradient",  # gradient | pointcloud | mesh
    voxel_features: Optional[jnp.ndarray] = None,
    sample_use_ddim: bool = False,
    sample_max_iter: Optional[int] = None,
    empty_space_skip: bool = False,
) -> Dict[str, str]:
    """The inference driver (flyaround.py:44-298).

    sample_mode: generate a voxel grid by DDPM sampling and render it along
    the trajectory. Otherwise: pool the grid from `scene`'s source views
    (reconstruction; reproducible source-view choice via `seed`,
    flyaround.py:153-173).

    Returns {stream_name: video_path}.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(seed)

    if sample_mode:
        test_cameras = simple_360_cameras(
            n_flyaround_poses, dist=trajectory_distance, up=up
        )
        src_batch = None
    else:
        assert scene is not None
        # reproducible source view subset (forked RNG in the reference)
        view_rng = np.random.RandomState(seed)
        sel = view_rng.choice(
            scene.batch_size, size=min(n_source_views, scene.batch_size),
            replace=False,
        )
        src_batch = jax.tree.map(lambda x: x[jnp.asarray(sel)], scene)
        if trajectory_type == "simple_360":
            test_cameras = simple_360_cameras(
                n_flyaround_poses, dist=trajectory_distance, up=up
            )
        else:
            test_cameras = fitted_trajectory_cameras(
                scene.camera, n_flyaround_poses, trajectory_type
            )

    # --- obtain voxel features
    progressive_gen = None
    if sample_mode:
        rng, sample_rng = jax.random.split(rng)
        if voxel_features is not None:
            # precomputed grid (e.g. one of a mesh-sharded sampling batch —
            # generate_samples.py samples all grids in one SPMD scan)
            assert voxel_features.ndim == 5 and voxel_features.shape[0] == 1
        elif progressive_sampling_steps_per_render > 0:
            progressive_gen = sample_random_voxel_features_progressive(
                model, params, sample_rng, max_iter=sample_max_iter
            )
            voxel_features = next(progressive_gen)
        else:
            logger.info(
                "sampling voxel grid via %s ...",
                "DDIM" if sample_use_ddim else "DDPM",
            )
            voxel_features = sample_random_voxel_features(
                model, params, sample_rng,
                max_iter=sample_max_iter, use_ddim=sample_use_ddim,
            )
    else:
        # pool ONCE from the source views — the grid is constant along the
        # trajectory (the reference recomputes it per forward; pooling here is
        # hoisted out of the pose loop)
        from ..models.metrics import preprocess_input

        img, fg, _ = preprocess_input(
            src_batch.image_rgb, src_batch.fg_probability, None,
            model.mask_images, model.mask_depths, model.mask_threshold,
            model.bg_color,
        )
        grid = model.apply(
            params, img, src_batch.camera, fg, src_batch.mask_crop,
            method=HoloDiffusionModel.pool_features,
        )
        voxel_features = grid[None]

    # Dense flyaround frames at the release eval scale (512², 64+64 pts,
    # normals on) go through the CHUNKED renderer — same constant-memory /
    # TPU-chunk-autoscale path as the val epoch (render_eval.py); a single
    # full-grid program at that scale is an HBM gamble and recompiles per
    # render size. Small renders keep the one-program fast path.
    use_chunked = (
        (model.chunk_size_grid or 0) > 0
        and model.sampling_mode_evaluation == "full_grid"
    )
    if use_chunked:
        from ..render_eval import (
            compute_occupancy,
            make_chunk_render_fn,
            render_image_chunked,
        )

        chunk_fn = make_chunk_render_fn(model)
        # eval-only empty-space skip (ops/occupancy.py): probe the density
        # field once per grid and reuse the occupancy for every pose of the
        # trajectory (progressive mode re-probes per grid update below)
        occ_cache = {"grid_id": None, "occ": None}

        def render_one(params, camera: PerspectiveCameras, v, step_rng):
            occ = None
            if empty_space_skip:
                if occ_cache["grid_id"] != id(v):
                    occ_cache["occ"] = compute_occupancy(model, params, v[0])
                    occ_cache["grid_id"] = id(v)
                occ = occ_cache["occ"]
            out = render_image_chunked(
                model,
                params,
                camera,
                v[0],
                chunk_renderer=lambda g, b: chunk_fn(params, g, b),
                occupancy=occ,
            )
            return {k: val[None] for k, val in out.items()}

    else:

        @jax.jit
        def render_one(params, camera: PerspectiveCameras, v, step_rng):
            return model.apply(
                params,
                camera=camera,
                voxel_features=v,
                training=False,
                rng=step_rng,
            )

    streams: Dict[str, VideoWriter] = {}

    def add_frame(key, img):
        if key not in streams:
            base = os.path.join(output_path, f"{key}.mp4")
            streams[key] = VideoWriter(base, fps=video_fps)
        streams[key].write_frame(np.asarray(img))

    os.makedirs(output_path, exist_ok=True)
    for pose_i in range(n_flyaround_poses):
        cam = test_cameras[pose_i]
        rng, step_rng = jax.random.split(rng)
        if progressive_gen is not None and pose_i > 0:
            for _ in range(progressive_sampling_steps_per_render):
                try:
                    voxel_features = next(progressive_gen)
                except StopIteration:
                    break
        preds = render_one(params, cam, voxel_features, step_rng)
        add_frame("images_render", preds["images_render"][0])
        add_frame("masks_render", np.repeat(preds["masks_render"][0], 3, axis=-1))
        depth = np.asarray(preds["depths_render"][0, ..., 0])
        dmax = depth.max() + 1e-6
        add_frame("depths_render", np.repeat((depth / dmax)[..., None], 3, axis=-1))
        # shaded depth (flyaround.py:439-470): normals-based when the model
        # renders normals, depth-derived otherwise
        mask2d = jnp.asarray(preds["masks_render"][0, ..., 0])
        if "normals_render" in preds:
            shaded = shaded_from_normals(
                jnp.asarray(preds["normals_render"][0]), mask2d, cam,
                jnp.asarray(preds["depths_render"][0, ..., 0]),
            )
        else:
            shaded = depth_to_shaded(
                jnp.asarray(preds["depths_render"][0, ..., 0]), mask2d, cam,
                method=shaded_depth_method,
            )
        add_frame("shaded_depth_render", shaded)

    out_paths = {k: vw.get_video() for k, vw in streams.items()}
    if save_voxel_features and sample_mode:
        np.save(os.path.join(output_path, "voxel_features.npy"),
                np.asarray(voxel_features))
    return out_paths
