"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The axon TPU plugin registers itself eagerly at interpreter start (via
sitecustomize on PYTHONPATH) and force-sets JAX_PLATFORMS=axon; the config
update below wins as long as it runs before the first backend use, which
conftest import order guarantees.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity tests compare against torch float32 math; keep MXU/conv in f32.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: this box has one CPU core, so XLA compiles
# dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh; axon plugin leaked through"
    )
    assert len(jax.devices()) == 8
