"""Camera math tests: pytorch3d-convention invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holo_diffusion_tpu.geometry import (
    PerspectiveCameras,
    camera_centers,
    look_at_view_transform,
    project_points_ndc,
    so3_exp_map,
    transform_points_world_to_camera,
    unproject_ndc_points,
)


def _random_cameras(n=4, seed=0):
    rng = np.random.RandomState(seed)
    log_rot = jnp.asarray(rng.randn(n, 3) * 0.7, jnp.float32)
    R = so3_exp_map(log_rot)
    T = jnp.asarray(rng.randn(n, 3), jnp.float32)
    T = T.at[:, 2].add(4.0)  # keep scene in front
    f = jnp.asarray(1.5 + rng.rand(n, 2), jnp.float32)
    p = jnp.asarray(rng.randn(n, 2) * 0.05, jnp.float32)
    return PerspectiveCameras(R=R, T=T, focal_length=f, principal_point=p)


def test_so3_exp_map_orthonormal():
    R = so3_exp_map(jnp.asarray(np.random.RandomState(1).randn(8, 3), jnp.float32))
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_exp_map_zero_is_identity():
    R = so3_exp_map(jnp.zeros((2, 3)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_camera_center_maps_to_origin():
    cams = _random_cameras()
    centers = camera_centers(cams)
    cam_coords = transform_points_world_to_camera(cams, centers[:, None, :])
    np.testing.assert_allclose(cam_coords, 0.0, atol=1e-5)


def test_project_unproject_roundtrip():
    cams = _random_cameras()
    pts = jnp.asarray(np.random.RandomState(2).randn(4, 10, 3), jnp.float32)
    # Push points in front of cameras: use camera z + offset
    pts_cam = transform_points_world_to_camera(cams, pts)
    pts_cam = pts_cam.at[..., 2].set(jnp.abs(pts_cam[..., 2]) + 1.0)
    from holo_diffusion_tpu.geometry.cameras import transform_points_camera_to_world

    pts_world = transform_points_camera_to_world(cams, pts_cam)
    ndc = project_points_ndc(cams, pts_world)
    back = unproject_ndc_points(cams, ndc)
    np.testing.assert_allclose(back, pts_world, atol=1e-4)


def test_look_at_projects_target_to_principal_point():
    at = (0.3, -0.2, 0.5)
    R, T = look_at_view_transform(dist=3.0, elev=[10.0, 45.0], azim=[0.0, 120.0], at=at)
    cams = PerspectiveCameras(
        R=R,
        T=T,
        focal_length=jnp.ones((2, 2)),
        principal_point=jnp.zeros((2, 2)),
    )
    ndc = project_points_ndc(cams, jnp.asarray(at, jnp.float32)[None, None, :].repeat(2, 0))
    # target lands at the principal point with positive depth == dist
    np.testing.assert_allclose(ndc[..., :2], 0.0, atol=1e-5)
    np.testing.assert_allclose(ndc[..., 2], 3.0, atol=1e-5)


def test_look_at_up_projects_up():
    R, T = look_at_view_transform(dist=4.0, elev=0.0, azim=0.0)
    cams = PerspectiveCameras(
        R=R, T=T, focal_length=jnp.ones((1, 2)), principal_point=jnp.zeros((1, 2))
    )
    up_pt = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)[None]
    ndc = project_points_ndc(cams, up_pt)
    assert ndc[0, 0, 1] > 0.0  # +y in world-up maps to +y NDC (up)


def test_getitem_keeps_batch_dim():
    cams = _random_cameras(4)
    one = cams[0]
    assert one.R.shape == (1, 3, 3)
    two = cams[1:3]
    assert two.T.shape == (2, 3)
