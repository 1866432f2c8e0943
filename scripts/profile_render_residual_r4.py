"""Round-4 attribution of the two-pass render's non-kernel milliseconds.

Round 3 (scripts/profile_render_phases.py) measured full two-pass render f+b
at 22.99 ms vs parts summing ~16.9 ms and left a ~6 ms residual "scales with
points". Candidates this script separates, at train scale (3 x 1024 rays,
coarse 64 -> fine 16+64, grid 16^3 x 64, hidden 256, release decoder):

    normals_kernel    trilinear_point_gradient alone (both passes' points) —
                      render_normals: true is the release default and the r3
                      phase profile did NOT include it
    render_nonorm     full two-pass render f+b with render_normals=False
    render_normals    same with render_normals=True (the benched config)
    cat_sort/merge    refine epilogue: bitonic sort of coarse+fine vs a
                      rank-merge of two sorted sequences
    points_glue       origins + dirs * lengths materialization

    python scripts/profile_render_residual_r4.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

N_TARGETS, N_RAYS = 3, 1024
P_COARSE, N_FINE = 64, 16
RESOL, C, HIDDEN = 16, 64, 256
EXTENT = 8.0


def timeit(fn, *args, iters=5, repeats=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        blocks.append((time.perf_counter() - t0) / iters)
    blocks.sort()
    return blocks[len(blocks) // 2]


def scan_k(f, k=10):
    def run(rng):
        def body(r, _):
            r, sub = jax.random.split(r)
            return r, f(sub)

        _, outs = jax.lax.scan(body, rng, jnp.arange(k))
        return jax.tree.map(jnp.sum, outs)

    return jax.jit(run), k


def merge_sorted(a, b):
    """Merge two per-ray SORTED length vectors (..., Pa)+(..., Pb) -> sorted
    (..., Pa+Pb): each element's output rank = own index + searchsorted into
    the other array; one argsort of ranks replaces the full bitonic sort."""
    Pa, Pb = a.shape[-1], b.shape[-1]
    ra = jnp.arange(Pa) + jax.vmap(
        lambda aa, bb: jnp.searchsorted(bb, aa, side="left")
    )(a.reshape(-1, Pa), b.reshape(-1, Pb)).reshape(a.shape)
    rb = jnp.arange(Pb) + jax.vmap(
        lambda bb, aa: jnp.searchsorted(aa, bb, side="right")
    )(b.reshape(-1, Pb), a.reshape(-1, Pa)).reshape(b.shape)
    return jnp.take_along_axis(
        jnp.concatenate([a, b], -1),
        jnp.argsort(jnp.concatenate([ra, rb], -1), axis=-1),
        axis=-1,
    )


def main():
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction
    from holo_diffusion_tpu.models.renderer import multipass_ea_render
    from holo_diffusion_tpu.geometry.rays import RayBundle, sample_pdf
    from holo_diffusion_tpu.ops.pallas.kron_sample import (
        trilinear_point_gradient,
    )

    print("backend:", jax.default_backend(), flush=True)
    rng = jax.random.PRNGKey(0)
    grid = jax.random.normal(rng, (RESOL, RESOL, RESOL, C))
    P_FINE = N_FINE + P_COARSE  # append_coarse
    n_pts = N_TARGETS * N_RAYS * (P_COARSE + P_FINE)
    print(f"pts/step (2 passes): {n_pts}", flush=True)

    shape = (N_TARGETS, N_RAYS)
    origins = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -6.0]), (*shape, 3)
    ) + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (*shape, 3))
    dirs = jnp.concatenate(
        [
            0.3 * jax.random.normal(jax.random.PRNGKey(2), (*shape, 2)),
            jnp.ones((*shape, 1)),
        ],
        axis=-1,
    )
    lengths = jnp.sort(
        jax.random.uniform(
            jax.random.PRNGKey(3), (*shape, P_COARSE), minval=2.0, maxval=10.0
        ),
        -1,
    )
    bundle = RayBundle(
        origins=origins, directions=dirs, lengths=lengths,
        xys=jnp.zeros((*shape, 2)),
    )

    results = {}

    # ---- normals kernel alone (both passes' point counts)
    pts_all = jax.random.uniform(
        jax.random.PRNGKey(4),
        (N_TARGETS, N_RAYS, P_COARSE + P_FINE, 3),
        minval=-3.9, maxval=3.9,
    )
    g1 = jnp.sum(grid, axis=-1, keepdims=True)

    def normals_body(sub):
        p = pts_all + 1e-6 * jax.random.normal(sub, (1, 3))
        return jnp.sum(trilinear_point_gradient(g1, p, EXTENT))

    fn, k = scan_k(normals_body)
    results["normals_kernel_fwd"] = timeit(fn, rng) / k

    # ---- full two-pass render f+b, normals off vs on
    for flag in (False, True):
        implicit = VoxelGridImplicitFunction(
            resol=RESOL, volume_extent=EXTENT, n_hidden=C, feature_dim=0,
            render_normals=flag,
            render_mlp_args=dict(dnet_hidden_dim=HIDDEN, rnet_hidden_dim=128),
        )
        pts0 = jax.random.uniform(
            rng, (N_TARGETS, N_RAYS, P_COARSE, 3), minval=-3.9, maxval=3.9
        )
        params = implicit.init(jax.random.PRNGKey(5), grid, pts0, dirs)

        def render_loss(v_and_g, sub):
            v, g = v_and_g

            def ifn(points, directions, pass_number):
                dens, feats, aux = implicit.apply(v, g, points, directions)
                return dens, feats, aux

            out = multipass_ea_render(
                ifn, bundle, N_FINE, sub, training=True,
            )
            s = jnp.sum(out.features) + jnp.sum(out.depths) + jnp.sum(out.masks)
            s = s + jnp.sum(out.prev_stage.features)
            if out.normals is not None:
                s = s + jnp.sum(out.normals)
            return s

        def grad_body(sub):
            gr = jax.grad(render_loss)((params, grid), sub)
            return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

        fn, k = scan_k(grad_body, 5)
        key = "render_grad_normals" if flag else "render_grad_nonorm"
        results[key] = timeit(fn, rng) / k

    # ---- refine epilogue: cat+bitonic-sort vs rank-merge
    weights = jax.random.uniform(jax.random.PRNGKey(6), (*shape, P_COARSE))
    mids = 0.5 * (lengths[..., 1:] + lengths[..., :-1])
    inner = weights[..., 1:-1]
    fine_det = sample_pdf(mids, inner, N_FINE, None)

    fn, k = scan_k(lambda r: jnp.sort(
        jnp.concatenate([lengths, jnp.sort(fine_det, -1)], -1), -1))
    results["cat_sort"] = timeit(fn, rng) / k

    fn, k = scan_k(lambda r: merge_sorted(lengths, jnp.sort(fine_det, -1)))
    results["merge"] = timeit(fn, rng) / k

    np.testing.assert_allclose(
        np.asarray(merge_sorted(lengths, jnp.sort(fine_det, -1))),
        np.asarray(jnp.sort(jnp.concatenate([lengths, fine_det], -1), -1)),
        atol=0,
    )

    fn, k = scan_k(lambda r: sample_pdf(mids, inner, N_FINE, r))
    results["sample_pdf"] = timeit(fn, rng) / k

    # ---- points glue
    all_len = jnp.sort(jnp.concatenate([lengths, fine_det], -1), -1)

    def glue(r):
        return jnp.sum(
            origins[..., None, :] + dirs[..., None, :] * all_len[..., None]
        )

    fn, k = scan_k(glue)
    results["points_glue"] = timeit(fn, rng) / k

    print("---- medians (ms/step) ----", flush=True)
    for kk, v in results.items():
        print(f"{kk:24s} {v * 1e3:8.3f}", flush=True)


if __name__ == "__main__":
    main()
