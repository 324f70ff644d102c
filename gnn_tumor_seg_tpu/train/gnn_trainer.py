"""GNN training/eval engine — the TPU counterpart of `model/gnn_model.py`.

Differences by design, not accident:
  - the whole train step (forward, weighted CE, backward, AdamW update, LR decay)
    is one jitted function with donated state; no per-batch H2D hops beyond the
    input graphs (the reference re-parses JSON + rebuilds DGL graphs every epoch,
    `data_processing/data_loader.py:67-83` — here graphs arrive as padded arrays);
  - minibatches are stacks over a batch axis with dataset-wide bucket shapes, so
    the step compiles exactly once (+ once for a padded remainder batch);
  - short batches are padded with masked-out copies (zero node_mask, labels -1)
    that contribute nothing to the weighted-mean loss.

Metric vector matches the reference exactly: loss; WT/CT/ET node Dice; WT/CT/ET
voxel Dice; WT/CT/ET HD95; plus predicted/true node-label counts
(`model/gnn_model.py:51-74`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import evaluation
from ..config import HyperParams
from ..data.image import project_nodes_to_img
from ..models.factory import init_graph_net
from ..ops.graph import GraphBatch, batch_graphs, bucket_size, NODE_BUCKETS, DEGREE_BUCKETS
from .checkpoint import save_checkpoint
from .losses import weighted_cross_entropy
from .optim import make_train_state, apply_updates

__all__ = ["GNNTrainer"]


def _masked_copy(g: GraphBatch) -> GraphBatch:
    """A padding graph contributing nothing to the loss. Host (numpy) graphs
    stay host-side so the batch keeps its one-H2D-per-step assembly."""
    xp = np if isinstance(g.node_mask, np.ndarray) else jnp
    return g.replace(
        node_mask=xp.zeros_like(g.node_mask),
        nbr_mask=xp.zeros_like(g.nbr_mask),
        labels=None if g.labels is None else xp.full_like(g.labels, -1),
        n_nodes=xp.zeros_like(g.n_nodes),
    )


class GNNTrainer:
    def __init__(self, model_type: str, hp: HyperParams, train_data=None,
                 seed: int = 0, impl: str | None = None,
                 precision: str | None = None):
        self.model_type = model_type
        self.hp = hp
        self.model = init_graph_net(model_type, hp)
        # aggregation impl: the Pallas one-hot-MXU kernels on TPU (4x+ faster,
        # see ops/pallas/), the dense XLA path elsewhere
        if impl is None:
            impl = "pallas" if jax.default_backend() == "tpu" else "dense"
        self.impl = impl
        # kernel precision for TRAINING steps: "fast" (single-pass bf16 — the
        # TPU-native training norm; convergence parity with "exact" on the
        # pallas impl is pinned by tests/test_training.py::
        # test_fast_vs_exact_convergence_pallas) unless overridden by arg or
        # GTS_PALLAS_PRECISION. Scoped to this trainer's step calls
        # (ops/pallas/precision.py); eval/predict run the dense f32 path
        # regardless. Library default elsewhere stays exact.
        import os as _os

        if precision is None:
            precision = _os.environ.get("GTS_PALLAS_PRECISION", "fast")
        assert precision in ("exact", "fast"), precision
        self.precision = precision
        self._seed = seed
        key = jax.random.PRNGKey(seed)
        self.params = self.model.init(key)
        self.state, self._tx = make_train_state(
            self.params, hp.lr, hp.lr_decay, hp.w_decay
        )
        self.class_weights = jnp.asarray(hp.class_weights, jnp.float32)
        self.train_data = train_data
        self._shape_budget = None
        # two-tier graph cache (both byte-bounded LRUs):
        #   host tier  — numpy graphs + tiling aux, built from raw samples
        #                without ever touching the device (no per-sample D2H);
        #                budget costs host RAM, so dataset size is not
        #                HBM-bounded;
        #   device tier— device_put copies; a hit costs ZERO transfer per
        #                step, a spill re-ships 2.4 MB (H2D only, async).
        # measured at 1,251-brain scale by scripts/bench_host_pipeline.py
        from ..data.cache import LRUBytesCache, device_cache_bytes

        self._graph_cache = LRUBytesCache()
        self._device_cache = LRUBytesCache(device_cache_bytes())
        # mesh/multi-host trainers assemble the batch host-side and
        # device_put it SHARDED (make_global_batch) — pre-placing samples on
        # one device would just force a reshard (or a D2H) per step
        self._device_tier = True
        self._edge_counts: dict[int, int] = {}
        # monotone tiling-U budget (quantized): pins the batch unique budget so
        # the step shape does not float with batch composition (each distinct
        # U would be a fresh XLA compile); grows (one recompile) if exceeded
        self._u_budget = 0
        self.last_epoch_stats: dict = {}
        if train_data is not None:
            self._shape_budget = self._compute_shape_budget(train_data)
        self._step = self._build_step()
        # eval/predict run the dense path: per-brain B=1 forwards are cheap and
        # need no tiling aux
        self._forward = jax.jit(
            lambda params, graph: self.model.apply(params, graph, train=False)
        )
        # batched eval program (losses + argmax on device), built on first use
        self._eval_forward = None
        self.last_eval_stats: dict = {}

    # ---------------------------------------------------------------- shapes
    def _compute_shape_budget(self, data) -> tuple[int, int]:
        if hasattr(data, "shape_budget"):
            n, d = data.shape_budget()
            return bucket_size(n, NODE_BUCKETS), bucket_size(d, DEGREE_BUCKETS)
        n_max = d_max = 1
        for i in range(len(data)):
            g = data.get_graph(i)
            n_max = max(n_max, g.num_nodes_padded)
            d_max = max(d_max, g.max_degree)
        return n_max, d_max

    # ---------------------------------------------------------------- step
    def _build_step(self):
        model, cw, tx, impl = self.model, self.class_weights, self._tx, self.impl
        # unrolled middle layers fuse across layer boundaries (~8% faster at
        # depth 7 than lax.scan); scan only guards compile time for very deep
        # stacks. The persistent compilation cache absorbs the one-time cost.
        scan_middle = getattr(model, "num_layers", 0) > 8

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, graph: GraphBatch, rng):
            def loss_fn(params):
                logits = model.apply(params, graph, train=True, rng=rng,
                                     impl=impl,
                                     **({"scan_middle": scan_middle}
                                        if hasattr(model, "aggregator") else {}))
                return weighted_cross_entropy(
                    logits, graph.labels, cw, graph.node_mask
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            new_state = apply_updates(tx, state, grads)
            return new_state, loss

        return step

    def _get_graph(self, i: int) -> GraphBatch:
        """Fetch + (for the Pallas impl) attach and cache tiling aux."""
        if self.impl != "pallas":
            g = self.train_data.get_graph(i)
            if i not in self._edge_counts:
                self._edge_counts[i] = int(np.asarray(g.nbr_mask).sum())
            return g
        g_dev = self._device_cache.get(i) if self._device_tier else None
        if g_dev is not None:
            return g_dev
        g = self._graph_cache.get(i)
        if g is None:
            tile = getattr(self.model, "preferred_tile", None)
            if hasattr(self.train_data, "get_sample"):
                # host-side path: pad + build the tiling tables from the raw
                # numpy sample BEFORE device transfer. Going through
                # get_graph().with_tiled_aux() instead reads the device nbr
                # tables back — one D2H sync per sample, measured 8-270 s on
                # the first call through remote-attached chips
                from ..ops.graph import graph_from_arrays

                s = self.train_data.get_sample(i)
                n_pad, d_pad = self._shape_budget
                g = graph_from_arrays(
                    s.feats, s.src, s.dst, labels=s.labels,
                    n_pad=n_pad, d_pad=d_pad, edge_weights=s.edge_weights,
                    tiled=True, tile=tile, as_numpy=True)
                self._edge_counts.setdefault(i, len(s.src))
            else:
                g = self.train_data.get_graph(i).with_tiled_aux(tile=tile)
            self._graph_cache.put(i, g)
            if i not in self._edge_counts:
                # host-side count: a device-side sum here would synchronize
                # the step pipeline on every first-epoch fetch
                self._edge_counts[i] = int(np.asarray(g.nbr_mask).sum())
        if not self._device_tier:
            return g
        if isinstance(g.nbr, np.ndarray):
            g = jax.device_put(g)                       # async H2D, no sync
        self._device_cache.put(i, g)
        return g

    def _start_prefetch(self, order) -> None:
        """Warm the graph cache (disk IO + tiling aux) in a background thread
        so host-side loading overlaps device compute on the first epoch."""
        if self.impl != "pallas" or len(self._graph_cache) >= len(order):
            return
        import threading

        def warm():
            for i in order:
                try:
                    self._get_graph(int(i))
                except Exception:
                    return  # the consuming loop will surface the real error

        t = threading.Thread(target=warm, daemon=True)
        t.start()

    # ---------------------------------------------------------------- epochs
    def _local_batch_size(self) -> int:
        """Graphs THIS process contributes per step. Single-process: the full
        batch; multi-host DP (ParallelGNNTrainer) divides the global batch."""
        return self.hp.batch_size

    def _assemble_batch(self, graphs, n_pad: int, d_pad: int) -> GraphBatch:
        """Stack per-sample graphs into the step's GraphBatch. Overridden by
        the multi-host DP trainer to assemble a global sharded array from the
        per-process slices (parallel/multihost.py:make_global_batch)."""
        return batch_graphs(graphs, n_pad=n_pad, d_pad=d_pad,
                            u_pad=self._u_budget or None)

    def run_epoch(self) -> float:
        """One shuffled pass over the training data; returns mean batch loss.

        LR decays per epoch via the epoch counter in the train state
        (reference: lr_decay.step() at `model/gnn_model.py:47`).
        """
        import time

        assert self.train_data is not None, "trainer constructed without data"
        data = self.train_data
        bs = self._local_batch_size()
        # epoch-keyed RNG (not a stateful stream): a trainer resumed from a
        # checkpoint at epoch k shuffles/drops exactly like an uninterrupted
        # run — resume is bit-continuous by construction
        # (tests/test_training.py::test_resume_exact_continuation)
        epoch = int(self.state.epoch)
        order = np.random.default_rng((self._seed, epoch)).permutation(len(data))
        dropout_key = jax.random.fold_in(jax.random.PRNGKey(self._seed + 1),
                                         epoch)
        self._start_prefetch(order)
        n_pad, d_pad = self._shape_budget
        losses = []
        edges = 0
        t0 = time.perf_counter()
        for step_i, start in enumerate(range(0, len(order), bs)):
            idxs = order[start:start + bs]
            graphs = []
            for i in idxs:
                g = self._get_graph(int(i))
                graphs.append(g)
                edges += self._edge_counts[int(i)]
            while len(graphs) < bs:  # pad remainder batch: same compiled shape
                graphs.append(_masked_copy(graphs[0]))
            if any(g.tiled is not None for g in graphs):
                u_obs = max(g.tiled.unique_budget for g in graphs
                            if g.tiled is not None)
                if u_obs > self._u_budget:  # quantize: rare, bounded recompiles
                    # 16 = the aux u_align quantum: U is already 16-aligned,
                    # so this adds NO slack in the common case (a 32-round
                    # padded tile-64's U=80 to 96 — 20% extra gather rows and
                    # MXU work in every kernel)
                    self._u_budget = -(-u_obs // 16) * 16
            batch = self._assemble_batch(graphs, n_pad, d_pad)
            dropout_key, sub = jax.random.split(dropout_key)
            from ..ops.pallas.precision import precision_scope

            with precision_scope(self.precision), \
                    jax.profiler.StepTraceAnnotation("gnn_train_step",
                                                     step_num=step_i):
                self.state, loss = self._step(self.state, batch, sub)
            losses.append(loss)
        mean_loss = float(np.mean([jax.device_get(l) for l in losses]))
        dt = time.perf_counter() - t0  # device_get above synchronized
        n_layers = getattr(self.model, "num_layers", 1)
        self.last_epoch_stats = {
            "seconds": dt,
            "steps": len(losses),
            "edges_per_s": edges * n_layers / max(dt, 1e-9),
            "impl": self.impl,
            "precision": self.precision,
        }
        self.state = self.state.next_epoch()
        return mean_loss

    # ---------------------------------------------------------------- eval
    def predict_nodes(self, graph: GraphBatch) -> np.ndarray:
        """Node logits for one B=1 graph -> numpy [n_nodes, C] (unpadded)."""
        logits = jax.device_get(self._forward(self.state.params, graph))[0]
        return logits[: int(graph.n_nodes[0])]

    def _build_eval_forward(self):
        from .losses import weighted_cross_entropy_per_graph

        model, cw = self.model, self.class_weights

        @jax.jit
        def fwd(params, graph):
            logits = model.apply(params, graph, train=False)
            losses = weighted_cross_entropy_per_graph(
                logits, graph.labels, cw, graph.node_mask)
            preds = jnp.argmax(logits, -1).astype(jnp.int16)
            return losses, preds

        return fwd

    def evaluate(self, data, indices=None, batch_size: int | None = None,
                 workers: int | None = None):
        """Per-brain metrics averaged over the set.

        Returns (avg_metrics[10], total_counts[8]) exactly like
        `model/gnn_model.py:51-74`: [loss, node WT/CT/ET dice, voxel WT/CT/ET
        dice, WT/CT/ET hd95], [pred counts x4, true counts x4].

        Batched + pipelined (VERDICT r3 item 3): brains forward in stacks of
        `batch_size` (default hp.batch_size) through ONE compiled program
        (per-graph losses + argmax on device, one small D2H per batch instead
        of per-brain logits pulls), while the host voxel work per brain —
        supervoxel/label NIfTI decode, node->voxel projection, Dice and EDT
        HD95 — runs in a thread pool overlapping the next batch's device step
        and each other. `last_eval_stats` records the batch count/timing
        (regression-tested in tests/test_training.py)."""
        import concurrent.futures
        import time as _time

        from ..ops.graph import batch_graphs

        if indices is None:
            indices = range(len(data))
        indices = [int(i) for i in indices]
        t0 = _time.perf_counter()
        bs = batch_size or self._local_batch_size()
        workers = workers or min(8, (os.cpu_count() or 2) + 2)
        metrics = np.zeros((len(indices), 10))
        counts = np.zeros((len(indices), 8))
        if self._eval_forward is None:
            self._eval_forward = self._build_eval_forward()

        def host_metrics(row, i, node_preds, node_labels):
            counts[row] = np.concatenate([
                evaluation.count_node_labels(node_preds),
                evaluation.count_node_labels(node_labels),
            ])
            node_dices = evaluation.calculate_node_dices(node_preds,
                                                         node_labels)
            mri_id = data.ids[i]
            sv = data.get_supervoxel_partitioning(mri_id)
            true_vox = data.get_voxel_labels(mri_id)
            pred_vox = project_nodes_to_img(sv, node_preds)
            voxel_metrics = evaluation.calculate_brats_metrics(pred_vox,
                                                               true_vox)
            metrics[row][1:] = np.concatenate([node_dices, voxel_metrics])

        n_batches = 0
        with concurrent.futures.ThreadPoolExecutor(workers) as pool:
            futures = []
            for start in range(0, len(indices), bs):
                chunk = indices[start:start + bs]
                graphs = [data.get_graph(i) for i in chunk]
                for g in graphs:
                    assert g.labels is not None, \
                        "evaluate requires labelled graphs"
                while len(graphs) < bs:   # same compiled shape for the tail
                    graphs.append(graphs[0])
                # pin bucket shapes dataset-wide so every batch reuses ONE
                # compiled program regardless of its composition
                n_pad = d_pad = None
                if hasattr(data, "shape_budget"):
                    n_raw, d_raw = data.shape_budget()
                    n_pad = bucket_size(n_raw, NODE_BUCKETS)
                    d_pad = bucket_size(d_raw, DEGREE_BUCKETS)
                # pin the tiling unique budget too: graphs carrying Pallas aux
                # would otherwise pad U to each batch's own max and a batch
                # composition hitting a new U is a fresh 10-60 s tunnel
                # compile (advisor r4) — grow the same monotone quantized
                # budget run_epoch uses
                if any(g.tiled is not None for g in graphs):
                    u_obs = max(g.tiled.unique_budget for g in graphs
                                if g.tiled is not None)
                    if u_obs > self._u_budget:
                        self._u_budget = -(-u_obs // 16) * 16
                batch = batch_graphs(graphs, n_pad=n_pad, d_pad=d_pad,
                                     u_pad=self._u_budget or None)
                losses, preds = self._eval_forward(self.state.params, batch)
                n_batches += 1
                losses = np.asarray(losses)
                preds = np.asarray(preds)          # [bs, N] int16, one pull
                labels = np.asarray(batch.labels)
                n_nodes = np.asarray(batch.n_nodes)
                for j, i in enumerate(chunk):
                    row = start + j
                    n = int(n_nodes[j])
                    metrics[row][0] = float(losses[j])
                    futures.append(pool.submit(
                        host_metrics, row, i, preds[j][:n], labels[j][:n]))
            for f in futures:
                f.result()
        self.last_eval_stats = {
            "brains": len(indices),
            "batches": n_batches,
            "batch_size": bs,
            "workers": workers,
            "seconds": _time.perf_counter() - t0,
        }
        return np.mean(metrics, axis=0), np.sum(counts, axis=0)

    # ---------------------------------------------------------------- io
    def save_weights(self, folder: str, name: str,
                     include_opt_state: bool = True) -> None:
        """Checkpoint with embedded config and (by default) optimizer state +
        epoch counter, enabling exact training resume — which the reference's
        bare state_dicts cannot do (SURVEY §5.4)."""
        save_checkpoint(
            f"{folder}{name}.ckpt",
            self.state.params,
            self.model_type,
            self.hp,
            opt_state=self.state.opt_state if include_opt_state else None,
            extra={"epoch": int(self.state.epoch)},
        )

    def load_params(self, params) -> None:
        import dataclasses

        self.state = dataclasses.replace(self.state, params=params)

    def restore(self, path: str) -> None:
        """Resume training state (params + optimizer + epoch) from a checkpoint
        saved with include_opt_state=True; params-only checkpoints restore
        weights and reset the optimizer."""
        import dataclasses

        from .checkpoint import load_checkpoint, load_opt_state

        params, model_type, hp, manifest = load_checkpoint(path, self.state.params)
        assert model_type == self.model_type, (model_type, self.model_type)
        self.state = dataclasses.replace(self.state, params=params)
        opt = load_opt_state(path, self.state.opt_state)
        if opt is not None:
            self.state = dataclasses.replace(self.state, opt_state=opt)
        epoch = manifest.get("extra", {}).get("epoch")
        if epoch is not None:
            self.state = dataclasses.replace(
                self.state, epoch=jnp.asarray(epoch, jnp.int32)
            )

    @classmethod
    def from_checkpoint(cls, path: str, train_data=None, seed: int = 0,
                        impl: str | None = None) -> "GNNTrainer":
        """Reconstruct a trainer entirely from a checkpoint's embedded config."""
        from .checkpoint import load_checkpoint

        _, model_type, hp, _ = load_checkpoint(path)
        trainer = cls(model_type, hp, train_data, seed=seed, impl=impl)
        trainer.restore(path)
        return trainer
