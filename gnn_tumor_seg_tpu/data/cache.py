"""Byte-budgeted LRU cache for padded graphs.

The reference re-parses graph JSON and rebuilds DGL graphs every epoch
(`data_processing/data_loader.py:67-83`); this framework instead converts each
sample once to padded GraphBatch arrays and caches them. Unbounded, that cache
is multiple GB of host RAM at BraTS-2021 scale (1,251 brains x ~1.5 MB padded
arrays, ~2.3 MB more with Pallas tiling aux attached) — so both caches
(ImageGraphDataset and GNNTrainer's tiled-aux cache) are LRU with a byte
budget. Default budget: GTS_GRAPH_CACHE_MB env (MB), else 4096 MB per cache
instance — the trainer's cache holds HOST (numpy) graphs, so the budget costs
RAM, not HBM, and 4 GB covers the full 1,251-brain BraTS-2021 set (~3.0 GB
measured by scripts/bench_host_pipeline.py; a 2 GB budget left 27% of samples
rebuilding every epoch). Beyond budget the oldest entries are rebuilt on
demand (a disk read + repad + aux build, ~15 ms — not a JSON parse).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import jax

__all__ = ["LRUBytesCache", "pytree_nbytes", "default_cache_bytes",
           "device_cache_bytes"]


def default_cache_bytes() -> int:
    return int(float(os.environ.get("GTS_GRAPH_CACHE_MB", "4096")) * 2**20)


def device_cache_bytes() -> int:
    """HBM budget for the trainer's device-tier graph cache (a hit costs zero
    per-step transfer). 4 GB default: holds the full 1,251-brain BraTS-2021
    set (~3.0 GB padded+tiled) next to the flagship training state on a
    16 GB v5e; datasets beyond it spill to the host tier and re-ship 2.4 MB
    per evicted sample (H2D only, async)."""
    return int(float(os.environ.get("GTS_DEVICE_GRAPH_CACHE_MB", "4096"))
               * 2**20)


def pytree_nbytes(tree) -> int:
    """Total bytes of all array leaves (numpy or jax) of a pytree."""
    return sum(
        leaf.nbytes
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "nbytes")
    )


class LRUBytesCache:
    """An OrderedDict-backed LRU evicting by total stored bytes.

    Values are sized with pytree_nbytes at insert time. A single value larger
    than the budget is still stored (the cache then holds just that value) so
    a tiny budget degrades to "cache the current item", never to an error.
    """

    def __init__(self, max_bytes: int | None = None):
        self.max_bytes = default_cache_bytes() if max_bytes is None else int(max_bytes)
        self._data: OrderedDict = OrderedDict()
        self._sizes: dict = {}
        self.nbytes = 0

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key) -> bool:
        return key in self._data

    def get(self, key):
        if key not in self._data:
            return None
        self._data.move_to_end(key)
        return self._data[key]

    def put(self, key, value) -> None:
        if key in self._data:
            self._data.move_to_end(key)
            return
        size = pytree_nbytes(value)
        self._data[key] = value
        self._sizes[key] = size
        self.nbytes += size
        while self.nbytes > self.max_bytes and len(self._data) > 1:
            old_key, _ = self._data.popitem(last=False)
            self.nbytes -= self._sizes.pop(old_key)

    def clear(self) -> None:
        self._data.clear()
        self._sizes.clear()
        self.nbytes = 0
