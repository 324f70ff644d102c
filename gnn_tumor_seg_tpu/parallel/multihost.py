"""Multi-host SPMD plumbing: per-process data shards, global batch assembly,
coordinator-only checkpoint writes.

The reference is single-device (SURVEY §2.3); its only scaling knob is "run
the script multiple times" (`README.md:120`). Here multi-host runs are SPMD:
every host executes the same jitted step over a global mesh
(`mesh.initialize_multihost` -> `jax.distributed.initialize`), so the data
pipeline must guarantee

  1. each host reads ONLY its shard of the sample list (no duplicate IO),
  2. every host executes the SAME number of steps per epoch (a host running
     one extra step would hang the collectives), and
  3. exactly one host publishes checkpoints/progress files.

All logic here is pure/deterministic and unit-tested on a single process
(tests/test_parallel.py); real multi-host wall-clock is hardware-blocked in
this environment (one chip), matching the halo-path validation strategy.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np

__all__ = ["process_shard", "is_coordinator", "save_checkpoint_coordinator",
           "make_global_batch", "combine_eval_results"]


def process_shard(items: Sequence, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Contiguous per-host shard of `items`, wrap-padded to equal length.

    Every host gets ceil(len/items / P) items: hosts whose contiguous slice
    runs short wrap around to the front of the list. Equal shard lengths mean
    equal steps-per-epoch on every host — the SPMD liveness requirement —
    at the cost of a few duplicated samples on the last host (same trade as
    the reference's fold chunking, which *drops* the remainder instead,
    `utils/training_helpers.py:26-31`).
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    items = list(items)
    if n <= 1 or not items:
        return items
    per = -(-len(items) // n)                      # ceil
    start = p * per
    out = [items[(start + i) % len(items)] for i in range(per)]
    return out


def is_coordinator() -> bool:
    return jax.process_index() == 0


def save_checkpoint_coordinator(path: str, params: Any, model_type: str,
                                hp, opt_state: Any = None,
                                extra: dict | None = None) -> bool:
    """Checkpoint write for multi-host runs: process 0 writes, others no-op.

    Params/opt-state must be host-addressable (replicated or DP-sharded
    with fully-addressable replicas — true for this framework's DP/TP
    trainers, whose parameters are replicated or TP-sharded within one
    host's devices). Returns True on the writing process.

    All processes barrier after the write (sync_global_devices), so no host
    can observe-or-exit before the checkpoint is durably on disk.
    """
    from ..train.checkpoint import save_checkpoint

    wrote = False
    if is_coordinator():
        save_checkpoint(path, jax.device_get(params), model_type, hp,
                        opt_state=None if opt_state is None
                        else jax.device_get(opt_state), extra=extra)
        wrote = True
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt:{path}")
    return wrote


def combine_eval_results(metrics: np.ndarray, counts: np.ndarray,
                         n_local: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Combine per-host evaluation results into the global vector.

    Each host evaluates only its shard of the samples; the global result is
    the sample-count-weighted mean of the 10-metric vectors and the sum of the
    label counts (matching what a single host evaluating everything would
    compute). Single-process: identity. Returns (metrics, counts, n_total).
    """
    metrics = np.asarray(metrics, np.float64)
    counts = np.asarray(counts, np.float64)
    if jax.process_count() <= 1:
        return metrics, counts, n_local
    from jax.experimental import multihost_utils

    packed = np.concatenate([metrics * n_local, counts, [float(n_local)]])
    rows = multihost_utils.process_allgather(packed)   # [P, 10+8+1]
    n_total = rows[:, -1].sum()
    g_metrics = rows[:, :metrics.size].sum(axis=0) / max(n_total, 1.0)
    g_counts = rows[:, metrics.size:-1].sum(axis=0)
    return g_metrics, g_counts, int(n_total)


def make_global_batch(local_leaves: Any, sharding) -> Any:
    """Assemble a global device array from per-process local data.

    local_leaves: pytree of numpy/host arrays holding THIS process's slice of
    the global batch (leading axis). sharding: the global NamedSharding (e.g.
    mesh.data_sharding(mesh)). Single-process: equivalent to device_put.
    """
    def leaf(x):
        x = np.asarray(x)
        if jax.process_count() <= 1:
            return jax.device_put(x, sharding)
        # the global leading axis is the concatenation of every process's
        # equal-length local slice; without the explicit global shape jax
        # treats the LOCAL shape as global and the data-axis tiling fails
        # (found by the real 2-process run, tests/test_multiprocess.py)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(leaf, local_leaves)
