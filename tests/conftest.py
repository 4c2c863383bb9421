"""Test configuration: run all tests on a virtual 8-device CPU mesh so
sharding code paths are exercised without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon latched into jax.config, so setting the env var here is
too late — we must go through jax.config.update.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# fail hub lookups fast instead of attempting network (zero-egress CI)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
