"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication (c)).

Note: the environment may pre-import jax with a TPU platform pinned (a
sitecustomize registering a PJRT plugin), so setting JAX_PLATFORMS here is
too late — use jax.config.update, which works after import as long as no
backend has been initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# of scan-heavy render graphs; caching makes re-runs minutes faster.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_libre_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
