"""Data-parallel (+ optional tensor-parallel) training over a device mesh.

TPU-native replacement for distribution the reference never had (SURVEY §2.3):
the GraphBatch leading axis shards over the mesh "data" axis; layer weight
matrices optionally shard their output features over "model" (TP). Everything is
expressed as sharding annotations on a single jitted step — XLA GSPMD inserts the
gradient psums and any TP collectives over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import GraphBatch
from ..train.gnn_trainer import GNNTrainer
from ..train.losses import weighted_cross_entropy
from ..train.optim import apply_updates
from .mesh import data_sharding

__all__ = ["tp_leaf_spec", "state_shardings", "graph_shardings", "ParallelGNNTrainer"]


def tp_leaf_spec(leaf, n_model: int) -> P:
    """Tensor-parallel spec by leaf shape: 2D [in, out] shards out over "model",
    1D [out] likewise — only when divisible; scalars and odd shapes replicate."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 2 and n_model > 1 and shape[1] % n_model == 0:
        return P(None, "model")
    if len(shape) == 1 and n_model > 1 and shape[0] % n_model == 0:
        return P("model")
    return P()


def state_shardings(state, mesh: Mesh) -> object:
    n_model = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, tp_leaf_spec(leaf, n_model)), state
    )


def graph_shardings(graph: GraphBatch, mesh: Mesh) -> GraphBatch:
    ds = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda _: ds, graph)


class ParallelGNNTrainer(GNNTrainer):
    """GNNTrainer whose step runs SPMD over a mesh.

    batch_size should be a multiple of the data axis size (short batches are
    padded with masked graphs by run_epoch, so any batch_size works, but aligned
    sizes avoid wasted compute).
    """

    def __init__(self, model_type: str, hp, train_data=None, seed: int = 0,
                 mesh: Mesh | None = None, **kw):
        if mesh is None:
            from .mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        super().__init__(model_type, hp, train_data, seed=seed, **kw)
        # batches are assembled host-side and device_put SHARDED over the
        # mesh; a single-device graph cache would force a per-step reshard
        # (and make_global_batch would D2H a device-assembled batch)
        self._device_tier = False
        # place optimizer state + params according to the TP specs
        shardings = state_shardings(self.state, mesh)
        self.state = jax.device_put(self.state, shardings)
        self._state_shardings = shardings
        if jax.process_count() > 1 and train_data is not None:
            self._sync_global_budgets()

    # ------------------------------------------------------------ multi-host
    def _sync_global_budgets(self) -> None:
        """SPMD liveness: every host must compile the SAME step shapes, or the
        gradient collectives deadlock. Node/degree buckets and the tiling-U
        budget are derived from each host's LOCAL data shard, so agree on the
        global max up front (one allgather at init)."""
        import numpy as np
        from jax.experimental import multihost_utils

        n_pad, d_pad = self._shape_budget
        u = 0
        if self.impl == "pallas":
            # one pass over the local shard: loads + tiles every graph (the
            # cache/prefetch would do this on epoch 1 anyway)
            for i in range(len(self.train_data)):
                u = max(u, self._get_graph(i).tiled.unique_budget)
        rows = multihost_utils.process_allgather(
            np.asarray([n_pad, d_pad, u], np.int64))
        n_pad, d_pad, u = np.max(np.atleast_2d(rows), axis=0)
        self._shape_budget = (int(n_pad), int(d_pad))
        self._u_budget = -(-int(u) // 16) * 16  # u_align quantum: no slack

    def _local_batch_size(self) -> int:
        """hp.batch_size is the GLOBAL batch; each host contributes its
        1/process_count slice (equal shard lengths from process_shard keep
        steps-per-epoch identical across hosts)."""
        n_proc = jax.process_count()
        if n_proc <= 1:
            return self.hp.batch_size
        if self.hp.batch_size % n_proc:
            raise ValueError(
                f"global batch_size {self.hp.batch_size} must divide evenly "
                f"over {n_proc} processes")
        return self.hp.batch_size // n_proc

    def _assemble_batch(self, graphs, n_pad: int, d_pad: int) -> GraphBatch:
        local = super()._assemble_batch(graphs, n_pad, d_pad)
        if jax.process_count() <= 1:
            return local
        from .multihost import make_global_batch

        return make_global_batch(local, data_sharding(self.mesh))

    def save_weights(self, folder: str, name: str,
                     include_opt_state: bool = True) -> None:
        """Coordinator-only checkpoint write with a cross-process barrier
        (single-process: plain write) — multi-host runs must not double-write
        (parallel/multihost.py)."""
        from .multihost import save_checkpoint_coordinator

        save_checkpoint_coordinator(
            f"{folder}{name}.ckpt",
            self.state.params,
            self.model_type,
            self.hp,
            opt_state=self.state.opt_state if include_opt_state else None,
            extra={"epoch": int(self.state.epoch)},
        )

    def _build_step(self):
        # note: self.mesh is set before super().__init__ runs, so it is visible
        # here even though the parent constructor triggers this build.
        model, cw, tx, mesh = self.model, self.class_weights, self._tx, self.mesh
        impl = self.impl
        # same rule as the single-chip step (train/gnn_trainer.py): unrolled
        # middle layers fuse across layer boundaries (~8% at the flagship
        # depth 7, CLAUDE.md cost model); scan only for very deep stacks
        scan_middle = getattr(model, "num_layers", 0) > 8
        ds = NamedSharding(mesh, P("data"))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, graph: GraphBatch, rng):
            # pin the batch axis to the data mesh axis; GSPMD derives the rest
            # (params/opt-state follow their device_put TP placement) and inserts
            # the gradient all-reduce over ICI.
            graph = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, ds), graph
            )

            def loss_fn(params):
                logits = model.apply(params, graph, train=True, rng=rng,
                                     impl=impl,
                                     **({"scan_middle": scan_middle}
                                        if hasattr(model, "aggregator") else {}))
                return weighted_cross_entropy(logits, graph.labels, cw, graph.node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_updates(tx, state, grads), loss

        return step
