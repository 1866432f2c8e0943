"""Per-phase render timing on the real TPU: where do the render milliseconds
go at train-step scale? (VERDICT r2 #2 prerequisite — decide whether fusing
the EA epilogue into the fused decode kernel is the right lever.)

Phases (train scale: 3 targets x 1024 rays, coarse 64 + fine 80 pts, grid
16^3 x 64, hidden 256 — the release recipe, hydrant.yaml:115,141-150):

    sample_fwd / sample_grad   kron trilinear sampler alone (442k pts)
    decode_fwd / decode_grad   fused sample+decode kernel alone
    ea_grad                    EA raymarcher alone on precomputed (sigma, rgb)
    refine                     importance_sample_lengths alone
    raybundle                  mask raysampler alone
    render_grad                full two-pass multipass_ea_render f+b
    splat                      rasterize_sparse_rays fwd

All phases scan K iterations per dispatch (tunnel ~30 ms/dispatch) and report
the median of 5 blocks.

    python scripts/profile_render_phases.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_TARGETS, N_RAYS = 3, 1024
P_COARSE, P_FINE = 64, 80  # fine = 16 + 64 appended coarse
RESOL, C, HIDDEN = 16, 64, 256
EXTENT = 8.0


def timeit(fn, *args, iters=5, repeats=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # force full fetch
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        blocks.append((time.perf_counter() - t0) / iters)
    blocks.sort()
    return blocks[len(blocks) // 2], blocks


def scan_k(f, k):
    """Wrap f(rng) into a K-iteration scan, jitted."""

    def run(rng):
        def body(r, _):
            r, sub = jax.random.split(r)
            return r, f(sub)

        _, outs = jax.lax.scan(body, rng, jnp.arange(k))
        return jnp.sum(outs)

    return jax.jit(run), k


def main():
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction
    from holo_diffusion_tpu.models.renderer import (
        emission_absorption_raymarcher,
        multipass_ea_render,
    )
    from holo_diffusion_tpu.geometry.rays import (
        importance_sample_lengths,
        sample_rays_from_mask,
    )
    from holo_diffusion_tpu.ops.splat import rasterize_sparse_rays
    from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = jax.random.PRNGKey(0)
    grid = jax.random.normal(rng, (RESOL, RESOL, RESOL, C))
    n_pts_total = N_TARGETS * N_RAYS * (P_COARSE + P_FINE)
    print(f"[profile] total pts/step (2 passes): {n_pts_total}", flush=True)

    implicit = VoxelGridImplicitFunction(
        resol=RESOL, volume_extent=EXTENT, n_hidden=C, feature_dim=0,
        render_mlp_args=dict(dnet_hidden_dim=HIDDEN, rnet_hidden_dim=128),
    )
    pts0 = jax.random.uniform(
        rng, (N_TARGETS, N_RAYS, P_COARSE, 3), minval=-3.9, maxval=3.9
    )
    dirs = jax.random.normal(rng, (N_TARGETS, N_RAYS, 3))
    params = implicit.init(jax.random.PRNGKey(1), grid, pts0, dirs)

    results = {}

    # ---- sampler alone
    from holo_diffusion_tpu.ops.pallas.kron_sample import trilinear_sample_fused

    flat_pts = pts0.reshape(-1, 3)
    both_pts = jnp.concatenate(
        [flat_pts,
         jax.random.uniform(rng, (N_TARGETS * N_RAYS * P_FINE, 3),
                            minval=-3.9, maxval=3.9)],
        axis=0,
    )

    def sample_fwd(sub):
        p = both_pts + 1e-6 * jax.random.normal(sub, (1, 3))
        return jnp.sum(trilinear_sample_fused(grid, p, EXTENT))

    fn, k = scan_k(sample_fwd, 10)
    results["sample_fwd"], _ = timeit(fn, rng)

    def sample_grad(sub):
        p = both_pts + 1e-6 * jax.random.normal(sub, (1, 3))
        return jnp.sum(
            jax.grad(lambda g: jnp.sum(trilinear_sample_fused(g, p, EXTENT)))(
                grid
            )
        )

    fn, _ = scan_k(sample_grad, 10)
    results["sample_grad"], _ = timeit(fn, rng)

    # ---- fused decode alone (both passes' points)
    def apply_implicit(v, g, p, d):
        dens, feats, _ = implicit.apply(v, g, p, d)
        return jnp.sum(dens) + jnp.sum(feats)

    pts_fine = jax.random.uniform(
        rng, (N_TARGETS, N_RAYS, P_FINE, 3), minval=-3.9, maxval=3.9
    )

    def decode_fwd(sub):
        p0 = pts0 + 1e-6 * jax.random.normal(sub, (1, 3))
        p1 = pts_fine + 1e-6 * jax.random.normal(sub, (1, 3))
        return apply_implicit(params, grid, p0, dirs) + apply_implicit(
            params, grid, p1, dirs
        )

    fn, _ = scan_k(decode_fwd, 10)
    results["decode_fwd"], _ = timeit(fn, rng)

    def decode_grad(sub):
        p0 = pts0 + 1e-6 * jax.random.normal(sub, (1, 3))
        p1 = pts_fine + 1e-6 * jax.random.normal(sub, (1, 3))

        def loss(v_and_g):
            v, g = v_and_g
            return apply_implicit(v, g, p0, dirs) + apply_implicit(
                v, g, p1, dirs
            )

        gr = jax.grad(loss)((params, grid))
        return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

    fn, _ = scan_k(decode_grad, 10)
    results["decode_grad"], _ = timeit(fn, rng)

    # ---- EA raymarcher alone (both passes) on precomputed tensors
    dens0 = jax.random.normal(rng, (N_TARGETS, N_RAYS, P_COARSE, 1))
    feat0 = jax.random.normal(rng, (N_TARGETS, N_RAYS, P_COARSE, 3))
    len0 = jnp.cumsum(
        jax.random.uniform(rng, (N_TARGETS, N_RAYS, P_COARSE)), axis=-1
    )
    dens1 = jax.random.normal(rng, (N_TARGETS, N_RAYS, P_FINE, 1))
    feat1 = jax.random.normal(rng, (N_TARGETS, N_RAYS, P_FINE, 3))
    len1 = jnp.cumsum(
        jax.random.uniform(rng, (N_TARGETS, N_RAYS, P_FINE)), axis=-1
    )

    def ea_grad(sub):
        def loss(args):
            d0, f0, d1, f1 = args
            a = emission_absorption_raymarcher(
                d0, f0, len0, density_noise_std=1.0, rng=sub
            )
            b = emission_absorption_raymarcher(
                d1, f1, len1, density_noise_std=1.0, rng=sub
            )
            return sum(jnp.sum(x) for x in (a[:3] + b[:3]))

        gr = jax.grad(loss)((dens0, feat0, dens1, feat1))
        return sum(jnp.sum(x) for x in gr)

    fn, _ = scan_k(ea_grad, 10)
    results["ea_grad"], _ = timeit(fn, rng)

    # ---- importance refinement alone
    w0 = jax.nn.softmax(jax.random.normal(rng, (N_TARGETS, N_RAYS, P_COARSE)))

    def refine(sub):
        lens = importance_sample_lengths(len0, w0, 16, sub, append_coarse=True)
        return jnp.sum(lens)

    fn, _ = scan_k(refine, 10)
    results["refine"], _ = timeit(fn, rng)

    # ---- mask raysampler alone
    cam = PerspectiveCameras(
        R=jnp.broadcast_to(jnp.eye(3), (N_TARGETS, 3, 3)),
        T=jnp.zeros((N_TARGETS, 3)) + jnp.array([0.0, 0.0, 10.0]),
        focal_length=jnp.ones((N_TARGETS, 2)) * 2.0,
        principal_point=jnp.zeros((N_TARGETS, 2)),
    )
    mask = jnp.ones((N_TARGETS, 128, 128))

    def raybundle(sub):
        rb = sample_rays_from_mask(
            cam, mask, N_RAYS, P_COARSE, sub, (0.0, 0.0, 0.0), 4.0, True
        )
        return jnp.sum(rb.lengths) + jnp.sum(rb.origins)

    fn, _ = scan_k(raybundle, 10)
    results["raybundle"], _ = timeit(fn, rng)

    # ---- full two-pass render f+b (the whole hot path)
    def full_render(sub, v, g):
        def implicit_fn(points, directions, pass_number):
            return implicit.apply(v, g, points, directions)

        rb = sample_rays_from_mask(
            cam, mask, N_RAYS, P_COARSE, sub, (0.0, 0.0, 0.0), 4.0, True
        )
        out = multipass_ea_render(
            implicit_fn, rb, 16, sub, True,
            density_noise_std_train=1.0, num_passes=2,
        )
        return (
            jnp.sum(out.features) + jnp.sum(out.depths) + jnp.sum(out.masks)
            + jnp.sum(out.prev_stage.features)
        )

    def render_grad(sub):
        gr = jax.grad(lambda vg: full_render(sub, vg[0], vg[1]))((params, grid))
        return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

    fn, _ = scan_k(render_grad, 5)
    med, _ = timeit(fn, rng)
    results["render_grad"] = med * 2  # scale K=5 to the K=10 convention

    # ---- MC splat
    xys = jax.random.uniform(rng, (N_TARGETS, N_RAYS, 2), minval=-1, maxval=1)
    rgbs = jax.random.uniform(rng, (N_TARGETS, N_RAYS, 3))
    dep = jax.random.uniform(rng, (N_TARGETS, N_RAYS, 1))
    msk = jax.random.uniform(rng, (N_TARGETS, N_RAYS, 1))

    def splat(sub):
        imgs, deps, msks = rasterize_sparse_rays(
            xys + 0 * jax.random.normal(sub, (1, 2)), rgbs, (128, 128), dep, msk
        )
        return jnp.sum(imgs) + jnp.sum(deps) + jnp.sum(msks)

    fn, _ = scan_k(splat, 10)
    results["splat"], _ = timeit(fn, rng)

    print("\n[profile] per-iteration ms (median of 5 blocks, K=10 scan):")
    for k_, v in results.items():
        print(f"  {k_:>14s}: {v * 1000 / 10:8.2f} ms")
    ded = results["render_grad"] - results["decode_grad"] - results["ea_grad"] \
        - results["refine"] - results["raybundle"]
    print(f"  render_grad - (decode_grad+ea+refine+raybundle) = "
          f"{ded * 100:.2f} ms  <- unexplained/overhead")


if __name__ == "__main__":
    main()
