"""Device-mesh helpers.

The reference is strictly single-device (`model/gnn_model.py:23`; SURVEY §2.3 —
no torch.distributed anywhere). Distribution here is native: a 2-axis mesh

  "data"  — graphs-in-batch (DP): the GraphBatch leading axis is sharded
  "model" — hidden-dimension tensor parallelism for the layer weights (TP)

with XLA collectives over ICI. Multi-host initialization goes through
jax.distributed.initialize before mesh construction.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_graph_batch",
           "initialize_multihost"]


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up (SPMD over hosts); no-op for single-process runs.

    On the CPU backend the cross-process collectives need an explicit
    implementation (gloo ships with jaxlib) — that makes 2-process runs
    testable on one machine (tests/test_multiprocess.py), the CPU-world stand-
    in for a multi-host TPU slice."""
    if num_processes is not None and num_processes > 1:
        import os

        # The env var alone does not govern the platform on this image (the
        # TPU plugin force-registers via sitecustomize; tests pin CPU through
        # jax.config.update) — honor either selection mechanism. Checked
        # WITHOUT resolving a backend: jax.distributed.initialize must run
        # before backend initialization.
        env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
        cfg = (jax.config.jax_platforms or "").strip().lower()
        if env == "cpu" or cfg == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator, num_processes, process_id)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graph_batch(graph, mesh: Mesh):
    """Place a GraphBatch with its leading batch axis sharded over "data".

    Batch size must be a multiple of the data axis (pad with masked graphs
    upstream — GNNTrainer already pads short batches)."""
    ds = data_sharding(mesh)
    put = lambda x: jax.device_put(x, ds)
    return graph.replace(
        nbr=put(graph.nbr),
        nbr_mask=put(graph.nbr_mask),
        node_mask=put(graph.node_mask),
        feats=put(graph.feats),
        labels=None if graph.labels is None else put(graph.labels),
        n_nodes=put(graph.n_nodes),
    )
