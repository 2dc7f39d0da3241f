"""Test env: force the CPU backend with 8 virtual devices BEFORE jax loads.

This is the JAX idiom for "multi-chip without a cluster" (SURVEY §4): all
sharding/mesh tests run against a real 8-way Mesh on one host.

Note: the session pre-sets JAX_PLATFORMS=axon and the axon TPU plugin
re-asserts itself over the env var, so the override must go through
jax.config *after* import; XLA_FLAGS still must be set before.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
