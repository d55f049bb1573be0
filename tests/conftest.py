"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), the TPU-world answer to testing
multi-node code without a cluster.

NOTE: this environment exports JAX_PLATFORMS=axon (the TPU tunnel) and jax
ignores re-exports of that variable, so the platform override must go
through jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
