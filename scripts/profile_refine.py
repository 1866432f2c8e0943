"""Micro-profile of the two-pass render's NON-kernel milliseconds on TPU
(round-4 follow-up to scripts/profile_render_phases.py, which left a ~6 ms
residual "scales with points" unexplained and a 2.85 ms refine phase).

Phases at train scale (3 x 1024 rays, coarse 64 -> fine 16+64):
    sample_pdf        inverse-CDF draw alone (deterministic branch)
    cat_sort          jnp.concatenate + jnp.sort of coarse+fine lengths
    merge             rank-based merge of the two SORTED sequences (candidate
                      replacement: coarse lengths are sorted by construction,
                      inverse-CDF output is monotone in u which is monotone
                      for both det linspace and stratified (i+u_i)/n draws)
    refine_full       importance_sample_lengths as shipped
    points_glue       origins + dirs * lengths materialization alone
    ea_fwd / ea_grad  EA raymarcher on precomputed (sigma, rgb)

    python scripts/profile_refine.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_TARGETS, N_RAYS = 3, 1024
P_COARSE, N_FINE = 64, 16
EXTENT = 8.0


def timeit(fn, *args, iters=10, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        blocks.append((time.perf_counter() - t0) / iters)
    blocks.sort()
    return blocks[len(blocks) // 2] * 1e3


def scan_k(f, k=10):
    def run(rng):
        def body(r, _):
            r, sub = jax.random.split(r)
            return r, f(sub)

        _, outs = jax.lax.scan(body, rng, jnp.arange(k))
        return jax.tree.map(jnp.sum, outs)

    return jax.jit(run), k


def merge_sorted(a, b):
    """Merge two per-ray SORTED length vectors (..., Pa) and (..., Pb) into
    a sorted (..., Pa+Pb) without a bitonic sort: each element's output rank
    is its own index + searchsorted into the other array."""
    Pa, Pb = a.shape[-1], b.shape[-1]
    ra = jnp.arange(Pa) + jax.vmap(
        lambda aa, bb: jnp.searchsorted(bb, aa, side="left")
    )(a.reshape(-1, Pa), b.reshape(-1, Pb)).reshape(a.shape)
    rb = jnp.arange(Pb) + jax.vmap(
        lambda bb, aa: jnp.searchsorted(aa, bb, side="right")
    )(b.reshape(-1, Pb), a.reshape(-1, Pa)).reshape(b.shape)
    out = jnp.zeros((*a.shape[:-1], Pa + Pb), a.dtype)
    out = jnp.take_along_axis(
        jnp.concatenate([a, b], -1),
        jnp.argsort(jnp.concatenate([ra, rb], -1), axis=-1),
        axis=-1,
    )
    return out


def main():
    from holo_diffusion_tpu.geometry.rays import (
        importance_sample_lengths,
        sample_pdf,
    )
    from holo_diffusion_tpu.models.renderer import (
        emission_absorption_raymarcher,
    )

    print("backend:", jax.default_backend())
    rng = jax.random.PRNGKey(0)
    shape = (N_TARGETS, N_RAYS)
    lengths = jnp.sort(
        jax.random.uniform(rng, (*shape, P_COARSE), minval=0.5, maxval=8.0), -1
    )
    weights = jax.random.uniform(jax.random.PRNGKey(1), (*shape, P_COARSE))
    origins = jax.random.normal(jax.random.PRNGKey(2), (*shape, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (*shape, 3))

    mids = 0.5 * (lengths[..., 1:] + lengths[..., :-1])
    inner = weights[..., 1:-1]

    f, k = scan_k(lambda r: sample_pdf(mids, inner, N_FINE, None))
    print(f"sample_pdf(det):  {timeit(f, rng) / k:.3f} ms")

    fine = sample_pdf(mids, inner, N_FINE, None)

    f, k = scan_k(
        lambda r: jnp.sort(jnp.concatenate([lengths, fine], -1), -1)
    )
    print(f"cat_sort:         {timeit(f, rng) / k:.3f} ms")

    f, k = scan_k(lambda r: merge_sorted(lengths, fine))
    print(f"merge:            {timeit(f, rng) / k:.3f} ms")

    # correctness of the merge candidate
    np.testing.assert_allclose(
        np.asarray(merge_sorted(lengths, fine)),
        np.asarray(jnp.sort(jnp.concatenate([lengths, fine], -1), -1)),
        atol=0,
    )

    f, k = scan_k(
        lambda r: importance_sample_lengths(lengths, weights, N_FINE, None)
    )
    print(f"refine_full:      {timeit(f, rng) / k:.3f} ms")

    all_len = jnp.sort(jnp.concatenate([lengths, fine], -1), -1)
    f, k = scan_k(
        lambda r: origins[..., None, :] + dirs[..., None, :] * all_len[..., None]
    )
    print(f"points_glue:      {timeit(f, rng) / k:.3f} ms")

    P = P_COARSE + N_FINE
    sigma = jax.random.uniform(jax.random.PRNGKey(4), (*shape, P, 1))
    rgb = jax.random.uniform(jax.random.PRNGKey(5), (*shape, P, 3))

    def ea(r):
        return emission_absorption_raymarcher(sigma, rgb, all_len)

    f, k = scan_k(ea)
    print(f"ea_fwd:           {timeit(f, rng) / k:.3f} ms")


if __name__ == "__main__":
    main()
