"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices, so every
sharding/collective test exercises the same GSPMD partitioning the real
v5e-8 slice would, minus the ICI.

Note: this environment's sitecustomize imports jax and registers the `axon`
TPU plugin at interpreter start, so `import jax` has already happened by the
time conftest runs. That is fine — no *backend* is initialized until first
use, so flipping the platform to CPU and forcing the host device count here
still takes effect. Unit tests never touch the TPU (the relay claim can add
minutes of latency per process and only one process may hold the chip).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: repeated suite runs (and the driver's
# test pass) reuse compiled executables across processes. One core, many
# conv compiles — this is the difference between ~15 min and ~3 min.
import os as _os

_cache_dir = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                           ".jax_cache")
_os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
