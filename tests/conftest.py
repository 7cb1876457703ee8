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
