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

# Persistent compilation cache: the suite's cost is dominated by repeated
# full-model CPU jit compiles (test_models / demo / e2e). Caching them on
# disk makes re-runs start-up-bound instead of compile-bound.
_cache_dir = os.environ.get(
    "MASKRCNN_TPU_TEST_CACHE", os.path.expanduser("~/.cache/maskrcnn_tpu_xla")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
