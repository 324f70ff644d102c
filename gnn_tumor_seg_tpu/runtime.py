"""Runtime setup helpers: persistent XLA compilation cache, device info.

TPU (re)compiles of the big jitted train steps are expensive — especially via
remote-compile tunnels — so every CLI and the benchmark enable a persistent
on-disk compilation cache: the second run of any step with the same shapes loads
the executable instead of recompiling.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "device_summary"]

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/gnn_tumor_seg_tpu/xla_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("GTS_XLA_CACHE_DIR", _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def device_summary() -> str:
    import jax

    devs = jax.devices()
    return f"{len(devs)} x {devs[0].device_kind} ({devs[0].platform})"
