"""Runtime setup helpers: persistent XLA compilation cache, device info.

TPU (re)compiles of the big jitted train steps are expensive — especially via
remote-compile tunnels — so every CLI and the benchmark enable a persistent
on-disk compilation cache: the second run of any step with the same shapes loads
the executable instead of recompiling.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "device_summary",
           "enable_host_alloc_reuse"]

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/gnn_tumor_seg_tpu/xla_cache")

_alloc_reuse_enabled = False


def enable_host_alloc_reuse() -> bool:
    """Keep large host allocations in the glibc heap instead of mmap/munmap.

    glibc serves every allocation over M_MMAP_THRESHOLD (128 KB) with a fresh
    mmap and munmaps it on free — so each per-sample numpy volume (~80-140 MB
    in preprocessing) re-pays first-touch page faults every sample. On this
    class of VM first-touch runs at ~10 MB/s (measured: 82 MB np.empty+fill
    costs 7.8 s new vs 0.03 s reused), which dominated the 8.9 s/brain
    preprocess. mallopt(M_MMAP_MAX, 0) + a huge trim threshold route large
    blocks through the sbrk heap and never return them to the OS, so pages
    fault once per size class per process instead of once per sample.

    Also pins M_ARENA_MAX=1: glibc worker-thread arenas are 64 MB-capped
    sub-heaps, so >64 MB buffers allocated from loader threads would still
    mmap/munmap per sample; one shared main arena serves any size from brk.
    Call BEFORE spawning worker threads for full effect.

    Trade-off: RSS stays at the high-water mark (heap never shrinks). Call it
    from throughput-bound host pipelines (preprocess, dataset loaders, bench),
    not from short-lived CLIs that care about peak RSS. No-op without glibc.
    """
    global _alloc_reuse_enabled
    if _alloc_reuse_enabled:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX, M_ARENA_MAX = -1, -4, -8
        ok = bool(libc.mallopt(M_ARENA_MAX, 1))
        ok = bool(libc.mallopt(M_MMAP_MAX, 0)) and ok
        ok = bool(libc.mallopt(M_TRIM_THRESHOLD,
                               ctypes.c_int(2 ** 31 - 1))) and ok
        _alloc_reuse_enabled = ok
        return ok
    except Exception:
        return False


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
