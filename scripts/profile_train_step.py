"""Capture a Perfetto/TensorBoard trace of the train step (the reference's
torch.profiler chrome traces, training_loop.py:463-473/525-538).

    python scripts/profile_train_step.py --trace-dir /tmp/hd_trace [--steps 3]

View with TensorBoard's profile plugin or ui.perfetto.dev.
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace-dir", default="/tmp/hd_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--config-name", default="synthetic_debug.yaml")
    args = ap.parse_args()

    import jax

    from holo_diffusion_tpu.config import load_config
    from holo_diffusion_tpu.experiment import Experiment
    from holo_diffusion_tpu.parallel import TrainState, make_train_step
    from holo_diffusion_tpu.utils.profiling import profile_trace

    cfg = load_config(args.config_name)
    exp = Experiment(cfg)
    state = exp.init_state()
    step = make_train_step(exp.model, exp.tx, mesh=None, donate=False)
    batch = exp.data.train.sample_batch(
        __import__("numpy").random.RandomState(0), exp.batch_size
    )
    rng = jax.random.PRNGKey(0)
    # warm up (compile outside the trace)
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics)

    with profile_trace(args.trace_dir):
        for _ in range(args.steps):
            state, metrics = step(state, batch, rng)
        jax.block_until_ready(metrics)
    print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
