"""Variant timing to localize the ~7 ms non-kernel overhead in the two-pass
render and tune the fused kernel's block size (follow-up to
profile_render_phases.py).

    python scripts/profile_render_variants.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_TARGETS, N_RAYS = 3, 1024
P_COARSE, P_FINE = 64, 80
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
        return jnp.sum(outs)

    return jax.jit(run), k


def main():
    from holo_diffusion_tpu.geometry.cameras import PerspectiveCameras
    from holo_diffusion_tpu.geometry.rays import sample_rays_from_mask
    from holo_diffusion_tpu.models.implicit import VoxelGridImplicitFunction
    from holo_diffusion_tpu.models.renderer import multipass_ea_render
    from holo_diffusion_tpu.ops.pallas.fused_decode import fused_sample_decode

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = jax.random.PRNGKey(0)
    grid = jax.random.normal(rng, (RESOL, RESOL, RESOL, C))

    implicit = VoxelGridImplicitFunction(
        resol=RESOL, volume_extent=EXTENT, n_hidden=C, feature_dim=0,
        render_mlp_args=dict(dnet_hidden_dim=HIDDEN, rnet_hidden_dim=128),
    )
    pts0 = jax.random.uniform(
        rng, (N_TARGETS, N_RAYS, P_COARSE, 3), minval=-3.9, maxval=3.9
    )
    dirs = jax.random.normal(rng, (N_TARGETS, N_RAYS, 3))
    params = implicit.init(jax.random.PRNGKey(1), grid, pts0, dirs)

    cam = PerspectiveCameras(
        R=jnp.broadcast_to(jnp.eye(3), (N_TARGETS, 3, 3)),
        T=jnp.zeros((N_TARGETS, 3)) + jnp.array([0.0, 0.0, 10.0]),
        focal_length=jnp.ones((N_TARGETS, 2)) * 2.0,
        principal_point=jnp.zeros((N_TARGETS, 2)),
    )
    mask = jnp.ones((N_TARGETS, 128, 128))

    results = {}

    def render_loss(sub, v, g, noise_std, n_passes, sg_dirs):
        def implicit_fn(points, directions, pass_number):
            if sg_dirs:
                directions = jax.lax.stop_gradient(directions)
            return implicit.apply(v, g, points, directions)

        rb = sample_rays_from_mask(
            cam, mask, N_RAYS, P_COARSE, sub, (0.0, 0.0, 0.0), 4.0, True
        )
        out = multipass_ea_render(
            implicit_fn, rb, 16, sub, True,
            density_noise_std_train=noise_std, num_passes=n_passes,
        )
        t = jnp.sum(out.features) + jnp.sum(out.depths) + jnp.sum(out.masks)
        if out.prev_stage is not None:
            t = t + jnp.sum(out.prev_stage.features)
        return t

    for name, kw in [
        ("base2pass", dict(noise_std=1.0, n_passes=2, sg_dirs=False)),
        ("sg_dirs", dict(noise_std=1.0, n_passes=2, sg_dirs=True)),
        ("no_noise", dict(noise_std=0.0, n_passes=2, sg_dirs=False)),
        ("one_pass", dict(noise_std=1.0, n_passes=1, sg_dirs=False)),
    ]:
        def rg(sub, kw=kw):
            gr = jax.grad(
                lambda vg: render_loss(sub, vg[0], vg[1], **kw)
            )((params, grid))
            return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

        fn, k = scan_k(rg, 5)
        results[name] = timeit(fn, rng) * 1000 / k
        print(f"  {name:>12s}: {results[name]:8.2f} ms", flush=True)

    # ---- fused kernel block_n sweep (fwd+bwd, both passes' point counts)
    n_all = N_TARGETS * N_RAYS * (P_COARSE + P_FINE)
    pts_all = jax.random.uniform(rng, (n_all, 3), minval=-3.9, maxval=3.9)
    pe_dim = 24
    pe = jax.random.normal(rng, (n_all, pe_dim))
    A = jax.random.normal(rng, (C, HIDDEN + 1)) * 0.05
    c = jax.random.normal(rng, (HIDDEN + 1,)) * 0.05
    Wr = jax.random.normal(rng, (HIDDEN + pe_dim, 3)) * 0.05
    br = jnp.zeros((3,))

    for block_n in (256, 512, 1024, 2048):
        def dec(sub, block_n=block_n):
            p = pts_all + 1e-6 * jax.random.normal(sub, (1, 3))

            def loss(args):
                g, a_, c_, wr_, br_ = args
                d, rgb = fused_sample_decode(
                    g, a_, c_, wr_, br_, p, pe, EXTENT, HIDDEN,
                    block_n=block_n,
                )
                return jnp.sum(d) + jnp.sum(rgb)

            gr = jax.grad(loss)((grid, A, c, Wr, br))
            return sum(jnp.sum(x) for x in jax.tree.leaves(gr))

        fn, k = scan_k(dec, 10)
        t = timeit(fn, rng) * 1000 / k
        print(f"  fused_grad block_n={block_n:5d}: {t:8.2f} ms", flush=True)

        def dec_fwd(sub, block_n=block_n):
            p = pts_all + 1e-6 * jax.random.normal(sub, (1, 3))
            d, rgb = fused_sample_decode(
                grid, A, c, Wr, br, p, pe, EXTENT, HIDDEN, block_n=block_n
            )
            return jnp.sum(d) + jnp.sum(rgb)

        fn, k = scan_k(dec_fwd, 10)
        t = timeit(fn, rng) * 1000 / k
        print(f"  fused_fwd  block_n={block_n:5d}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
