"""Test config: run everything on a virtual 8-device CPU mesh.

jax is already imported at interpreter startup on this machine (sitecustomize
registers the TPU plugin), so env vars are too late — switch platform via
jax.config before any backend is created (SURVEY.md §4: multi-host tests on a
CPU jax mesh).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the slow tests are full-Experiment runs that
# re-jit identical tiny programs (init/train-step/eval) per test and per
# process; the disk cache turns every repeat compile into a load
# (VERDICT r3 weak #5: suite wall time).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("HD_TEST_COMPILE_CACHE", "/tmp/jax_test_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
