"""Sampler-strategy shootout on the real TPU: XLA gather vs one-hot XLA vs the
Pallas one-hot MXU kernel, across grid sizes, with dispatch latency amortized
by a K-rep lax.scan. Guides which sampler the implicit function defaults to.

    python scripts/bench_samplers.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit_scan(fn, grid, pts, warmup=2, iters=8):
    """Time one materialized call; N is sized so device time >> the ~30ms
    tunnel dispatch latency. A device->host fetch of the result forces true
    completion (block_until_ready through the tunnel can return early)."""
    import numpy as np

    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(grid, pts)
    _ = np.asarray(out[:4, :4])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(grid, pts)
    _ = np.asarray(out[:4, :4])
    return (time.perf_counter() - t0) / iters


def main():
    from holo_diffusion_tpu.ops.pallas.fused_render import (
        trilinear_sample_onehot_xla,
        trilinear_sample_pallas,
    )
    from holo_diffusion_tpu.ops.voxel import sample_voxel_grid_world

    print(f"device: {jax.devices()[0]}", flush=True)
    N = 2 * 1024 * 1024  # large enough that compute dominates dispatch latency
    for resol, C in [(16, 64), (32, 128)]:
        grid = jax.random.normal(
            jax.random.PRNGKey(0), (resol, resol, resol, C), jnp.float32
        )
        pts = jax.random.uniform(
            jax.random.PRNGKey(1), (N, 3), minval=-3.5, maxval=3.5
        )
        extent = 8.0
        strategies = {
            "gather": lambda g, p: sample_voxel_grid_world(g, p, extent),
            "onehot_xla": lambda g, p: trilinear_sample_onehot_xla(
                g, p, extent, block_n=2048
            ),
        }
        if resol * resol * resol * C * 4 <= 8 * 2**20:
            strategies["pallas"] = lambda g, p: trilinear_sample_pallas(
                g, p, extent, block_n=512
            )
        for name, fn in strategies.items():
            try:
                dt = timeit_scan(fn, grid, pts)
                print(
                    f"resol={resol} C={C} {name}: {dt * 1e3:.3f} ms "
                    f"({N / dt / 1e9:.2f} Gpts/s, "
                    f"{N * C * 4 * 8 / dt / 1e9:.0f} GB/s gathered)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"resol={resol} C={C} {name}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
