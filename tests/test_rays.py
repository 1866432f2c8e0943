"""Ray sampler tests."""
import jax
import jax.numpy as jnp
import numpy as np

from holo_diffusion_tpu.geometry import (
    PerspectiveCameras,
    look_at_view_transform,
    importance_sample_lengths,
    ray_bundle_to_ray_points,
    sample_rays_from_mask,
    sample_rays_full_grid,
    transform_points_world_to_camera,
)
from holo_diffusion_tpu.geometry.harmonic import HarmonicEmbedding


def _cams(n=2, dist=5.0):
    R, T = look_at_view_transform(
        dist=dist, elev=jnp.linspace(0, 30, n), azim=jnp.linspace(0, 90, n)
    )
    return PerspectiveCameras(
        R=R, T=T, focal_length=jnp.ones((n, 2)) * 2.0, principal_point=jnp.zeros((n, 2))
    )


def test_full_grid_ray_lengths_are_zdepth():
    cams = _cams()
    rb = sample_rays_full_grid(cams, 8, 8, 16, scene_extent=2.0)
    pts = ray_bundle_to_ray_points(rb)  # (B, N, P, 3)
    pts_cam = transform_points_world_to_camera(cams, pts)
    np.testing.assert_allclose(pts_cam[..., 2], rb.lengths, rtol=1e-4, atol=1e-4)


def test_full_grid_center_pixel_hits_origin():
    cams = _cams(1)
    rb = sample_rays_full_grid(cams, 9, 9, 8, scene_extent=1.0)
    # Center ray of a 9x9 grid passes near the look-at target (origin)
    center = rb.directions[0, 40]
    o = rb.origins[0, 40]
    # distance from origin to the ray line
    t = -jnp.dot(o, center) / jnp.dot(center, center)
    closest = o + t * center
    assert jnp.linalg.norm(closest) < 1e-4


def test_mask_sampling_respects_mask():
    cams = _cams(2)
    mask = jnp.zeros((2, 16, 16)).at[:, :8, :].set(1.0)  # top half only
    rb = sample_rays_from_mask(cams, mask, 64, 8, jax.random.PRNGKey(0))
    # top half of image -> +y NDC
    assert (rb.xys[..., 1] > 0).all()
    assert rb.lengths.shape == (2, 64, 8)


def test_mask_sampling_all_zero_fallback():
    cams = _cams(1)
    mask = jnp.zeros((1, 8, 8))
    rb = sample_rays_from_mask(cams, mask, 16, 4, jax.random.PRNGKey(1))
    assert jnp.isfinite(rb.xys).all()


def test_stratified_lengths_monotone():
    cams = _cams(1)
    rb = sample_rays_from_mask(
        cams, jnp.ones((1, 8, 8)), 32, 16, jax.random.PRNGKey(2), stratified=True
    )
    assert (jnp.diff(rb.lengths, axis=-1) > 0).all()


def test_importance_sampling_concentrates():
    lengths = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 32), (1, 4, 32))
    # weight mass near 0.75
    w = jnp.exp(-((lengths - 0.75) ** 2) / 0.001)
    fine = importance_sample_lengths(lengths, w, 64, jax.random.PRNGKey(3), append_coarse=False)
    assert (jnp.diff(fine, axis=-1) >= 0).all()
    frac_near = jnp.mean((jnp.abs(fine - 0.75) < 0.1).astype(jnp.float32))
    assert frac_near > 0.8


def test_importance_append_coarse_sorted():
    lengths = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (1, 3, 8))
    w = jnp.ones((1, 3, 8))
    fine = importance_sample_lengths(lengths, w, 16, None, append_coarse=True)
    assert fine.shape == (1, 3, 24)
    assert (jnp.diff(fine, axis=-1) >= 0).all()


def test_harmonic_embedding_dims_and_values():
    he = HarmonicEmbedding(n_harmonic_functions=4)
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    y = he(x)
    assert y.shape == (5, 3 * (2 * 4 + 1))
    assert he.get_output_dim(3) == 27
    # layout: sin block then cos block then input
    np.testing.assert_allclose(y[:, -3:], x, atol=1e-6)
    np.testing.assert_allclose(y[:, 0], np.sin(x[:, 0]), atol=1e-6)
    np.testing.assert_allclose(y[:, 1], np.sin(2 * x[:, 0]), atol=1e-6)
    np.testing.assert_allclose(y[:, 12], np.cos(x[:, 0]), atol=1e-6)


def test_harmonic_embedding_zero_freqs_identity():
    he = HarmonicEmbedding(n_harmonic_functions=0)
    x = jnp.ones((2, 7))
    assert he(x).shape == (2, 7)
    assert he.get_output_dim(7) == 7


def test_sample_pdf_matches_gather_formulation():
    """sample_pdf's one-hot-matmul inverse CDF (MXU-friendly; gathers are
    VPU-serial on TPU) must match the straightforward searchsorted + 4x
    take_along_axis formulation exactly — det and stochastic branches,
    including u past cdf[-1] and near-empty bins."""
    from holo_diffusion_tpu.geometry.rays import sample_pdf

    def reference(bins, weights, n_samples, u, eps=1e-5):
        weights = weights + eps
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        inds = jnp.sum(u[..., :, None] >= cdf[..., None, :], axis=-1)
        below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
        above = jnp.clip(inds, 0, cdf.shape[-1] - 1)
        cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
        bins_b = jnp.take_along_axis(bins, below, axis=-1)
        bins_a = jnp.take_along_axis(bins, above, axis=-1)
        denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
        return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)

    rs = np.random.RandomState(0)
    M, N = 17, 9
    bins = jnp.asarray(np.sort(rs.uniform(2.0, 10.0, (2, 5, M)), -1),
                       jnp.float32)
    weights = jnp.asarray(rs.uniform(0, 1, (2, 5, M - 1)), jnp.float32)
    # a few near-degenerate rows: all-zero weights, one spike
    weights = weights.at[0, 0].set(0.0)
    weights = weights.at[0, 1].set(
        jnp.zeros(M - 1).at[3].set(100.0)
    )

    # deterministic branch (linspace u includes exactly 0.0 and 1.0)
    got = sample_pdf(bins, weights, N, None)
    u_det = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N), (2, 5, N))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(reference(bins, weights, N, u_det)),
        atol=1e-6,
    )
    # monotone nondecreasing within each row for det (sorted u)
    assert (np.diff(np.asarray(got), axis=-1) >= -1e-6).all()

    # stochastic branch: same rng -> same u draw as the implementation
    rng = jax.random.PRNGKey(7)
    got_s = sample_pdf(bins, weights, N, rng)
    u_s = jax.random.uniform(rng, (2, 5, N))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(reference(bins, weights, N, u_s)),
        atol=1e-6,
    )
    # samples stay inside the bin support
    assert (np.asarray(got_s) >= float(bins.min()) - 1e-5).all()
    assert (np.asarray(got_s) <= float(bins.max()) + 1e-5).all()
