"""Sweep rays-per-chunk for the release-scale 512^2 chunked eval render.

The reference's `chunk_size_grid: 40960` (hydrant.yaml:112) is a CUDA memory
bound: at 64 eval pts/ray it yields 640-ray chunks -> ~410 dispatches per
512^2 image, which over the high-latency TPU tunnel is dispatch-bound
(measured 18.99 s/image). This sweep measures s/image vs chunk size on the
real chip to pick a TPU-native default.

Run: timeout 3000 python scripts/sweep_eval_chunk.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from holo_diffusion_tpu.render_eval import (
        make_chunk_renderer,
        render_image_chunked,
    )

    provider = bench._release_provider()
    batch = provider.train.sample_batch(np.random.RandomState(0), 9)
    model = bench._release_model()
    print("[sweep] init release model ...", flush=True)
    variables = bench._release_init(model, batch)
    grid = jax.jit(
        lambda v, cam, img, fg, mc: model.apply(
            v, cam, img, fg, mc, method=type(model).encode_eval
        )
    )(
        variables,
        batch.camera,
        jnp.asarray(batch.image_rgb),
        jnp.asarray(batch.fg_probability),
        jnp.asarray(batch.mask_crop),
    )
    jax.block_until_ready(grid)
    renderer = make_chunk_renderer(model, variables)
    n_pts = model.n_pts_per_ray_evaluation

    results = {}
    for rays in [640, 2560, 8192, 16384, 32768, 65536]:
        try:
            def render_once():
                out = render_image_chunked(
                    model, variables, batch.camera[:1], grid,
                    chunk_size_grid=rays * n_pts,
                    chunk_renderer=renderer,
                )
                return float(np.asarray(out["images_render"]).sum())

            t0 = time.perf_counter()
            render_once()  # compile
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                render_once()
                times.append(time.perf_counter() - t0)
            times.sort()
            sec = times[1]
            results[rays] = sec
            print(
                f"[sweep] rays/chunk {rays:6d}: {sec:6.2f} s/image "
                f"({512 * 512 / sec / 1e3:5.0f}k rays/s, "
                f"first-call {compile_s:.1f}s)",
                flush=True,
            )
        except Exception as e:  # OOM etc.
            print(f"[sweep] rays/chunk {rays:6d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break
    best = min(results, key=results.get) if results else None
    print(f"[sweep] best: {best} ({results.get(best):.2f} s/image)" if best
          else "[sweep] no results", flush=True)


if __name__ == "__main__":
    main()
