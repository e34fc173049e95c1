"""Persistent XLA compilation cache.

First compiles on TPU cost 20-40s; for production restarts (auto-resume after
preemption) the persistent cache makes them near-instant. Opt-in:

    from vae_mdl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()          # default: ~/.cache/vae_mdl_tpu/xla

or env: VAE_MDL_COMPILATION_CACHE=/path. The CLI enables it automatically.
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> str:
    import jax

    path = path or os.environ.get(
        "VAE_MDL_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/vae_mdl_tpu/xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
