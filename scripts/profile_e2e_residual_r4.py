"""Round-4 attribution of the release e2e loop's host-side residual.

bench `train_release` (device-step ceiling, batch replayed from device
memory) measures ~93 ms/step; `train_release_e2e` (the real loop: host
sample -> compact cache -> AsyncLoader H2D -> step -> deferred metric fetch)
measures ~180-200 ms/step at K=2 steps/dispatch. This script separates the
~90-100 ms/step residual into named costs on the live TPU tunnel:

    h2d_cold/warm     device_put of one full K=2 compact group (~39 MB)
    h2d_overlap       device_put WHILE a long device program runs (does the
                      tunnel overlap transfers with compute, or serialize?)
    fetch_rtt         one scalar metric fetch round-trip
    e2e_K{2,4,8}      the bench e2e loop at steps_per_dispatch K — if
                      dispatch+fetch amortize away, K is the free lever; if
                      steps/s stays flat, the residual is H2D bytes and the
                      next lever is shipping presampled target rays

    python scripts/profile_e2e_residual_r4.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np


def main():
    import bench
    from collections import deque

    import jax.numpy as jnp

    from holo_diffusion_tpu.data.compact import (
        CompactSceneSampler,
        SourceCompactor,
    )
    from holo_diffusion_tpu.data.source import AsyncLoader
    from holo_diffusion_tpu.parallel import TrainState, make_train_step
    from holo_diffusion_tpu.train import make_optimizer

    print("backend:", jax.default_backend(), flush=True)
    provider = bench._release_provider()
    model = bench._release_model()
    batch = provider.train.sample_batch(np.random.RandomState(0), 33)
    variables = bench._release_init(model, batch)
    tx = make_optimizer(breed="Adam", lr=4e-5)
    comp = SourceCompactor.from_model(model, drop_depth=True)
    sampler = CompactSceneSampler(provider.train, comp, max_cached_scenes=4)

    # ---- H2D of one K=2 group, cold + warm (layout cached), + overlap
    group = [sampler.sample_batch(np.random.RandomState(j), 33)
             for j in range(2)]
    kb = jax.tree.map(lambda *xs: jnp.stack([np.asarray(x) for x in xs]),
                      *group)
    host_group = jax.tree.map(np.asarray, kb)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(host_group))
    print(f"group payload: {nbytes / 1e6:.2f} MB (K=2)", flush=True)

    def put_block():
        t0 = time.perf_counter()
        dev = jax.device_put(host_group)
        jax.block_until_ready(dev)
        return time.perf_counter() - t0

    t_cold = put_block()
    warms = sorted(put_block() for _ in range(5))
    print(f"h2d_cold: {t_cold * 1e3:.1f} ms   "
          f"h2d_warm median: {warms[2] * 1e3:.1f} ms "
          f"({nbytes / warms[2] / 1e6:.0f} MB/s)", flush=True)

    # ---- fetch round-trip
    x = jax.device_put(jnp.float32(1.0))
    fet = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(x))
        fet.append(time.perf_counter() - t0)
    print(f"fetch_rtt median: {sorted(fet)[2] * 1e3:.1f} ms", flush=True)

    # ---- overlap: run a long device program, then device_put mid-flight
    state0 = TrainState.create(variables, tx)
    step1 = make_train_step(model, tx, mesh=None, donate=False,
                            steps_per_call=2)
    rng = jax.random.PRNGKey(2)
    dev_kb = jax.device_put(kb)
    st, met = step1(state0, dev_kb, rng)  # compile
    jax.block_until_ready(met["objective"])
    t0 = time.perf_counter()
    st, met = step1(state0, dev_kb, rng)  # async dispatch (~186 ms device)
    t_put = put_block()                   # transfer while device busy
    jax.block_until_ready(met["objective"])
    t_total = time.perf_counter() - t0
    print(f"h2d_overlap: put={t_put * 1e3:.1f} ms inside a "
          f"{t_total * 1e3:.1f} ms busy-device window "
          f"(serialized if total ~= step+put)", flush=True)

    # ---- the real loop at K in {2, 4, 8}
    # host copy of the params: donate=True deletes the device buffers each
    # loop, so every K gets a fresh device_put of the same values
    host_vars = jax.tree.map(np.asarray, variables)
    for K in (2, 4, 8):
        step = make_train_step(model, tx, mesh=None, donate=True,
                               steps_per_call=K)
        state = TrainState.create(jax.device_put(host_vars), tx)
        N_WARM, N = 2, max(8 // (K // 2), 4)

        def gen():
            for i in range(N_WARM + N):
                g = [sampler.sample_batch(np.random.RandomState(K * i + j), 33)
                     for j in range(K)]
                yield jax.tree.map(lambda *xs: jnp.stack(xs), *g)

        it = iter(AsyncLoader(gen(), prefetch=2, transfer=jax.device_put))
        pending = deque()
        t0 = None
        done = 0
        rng = jax.random.PRNGKey(3)
        for b in it:
            rng, r = jax.random.split(rng)
            state, metrics = step(state, b, r)
            pending.append(metrics["objective"])
            if len(pending) > 1:
                float(np.asarray(pending.popleft()))
            done += 1
            if done == N_WARM:
                while pending:
                    float(np.asarray(pending.popleft()))
                t0 = time.perf_counter()
                done_at_t0 = done
        while pending:
            float(np.asarray(pending.popleft()))
        dt = time.perf_counter() - t0
        steps = (done - done_at_t0) * K
        print(f"e2e_K{K}: {steps / dt:.2f} steps/s "
              f"({dt / steps * 1e3:.1f} ms/step, {steps} steps)", flush=True)


if __name__ == "__main__":
    main()
