"""Training loop for the node-partitioned (halo) giant-graph regime.

The reference has no distributed training of any kind (SURVEY §2.3); this is
the graph analog of sequence-parallel training (SURVEY §5.7): one giant
batched supervoxel graph whose nodes are split contiguously across the mesh,
trained full-graph-per-step with the same optimizer contract as the
single-device engine — AdamW + per-epoch exponential LR decay + weighted CE
(`model/gnn_model.py:28-30,47`).

Interop: the parameter pytrees are exactly the single-device models'
(models/sage.py, models/gat.py), and save_weights writes the standard
config-embedded checkpoint, so a halo-trained model can be loaded by the
predict CLIs and vice versa. The trainer also plugs into the existing fold
driver (train/folds.py:train_on_fold expects run_epoch + save_weights).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HyperParams
from ..train.checkpoint import load_checkpoint, load_opt_state, save_checkpoint
from ..train.optim import apply_updates, make_train_state
from .halo import (HaloGAT, HaloGATP2P, HaloGraphSage, HaloGraphSageP2P,
                   PartitionedGraph)

__all__ = ["init_halo_net", "shard_partitioned", "HaloTrainer"]

_SAGE_AGG = {"GSpool": "pool", "GSgcn": "gcn", "GSmean": "mean"}


def init_halo_net(model_type: str, hp: HyperParams, mesh: Mesh,
                  axis: str = "data", variant: str = "all_gather",
                  halo_width: int | None = None):
    """Halo-model factory mirroring models/factory.py:init_graph_net
    (reference `model/networks.py:68-81`) for the partitioned regime.

    variant: "all_gather" (any edge structure) or "p2p" (boundary-only
    ppermute exchange; needs a partition_graph_p2p graph + its halo_width).
    """
    if variant not in ("all_gather", "p2p"):
        raise ValueError(f"unknown halo variant {variant!r}")
    if variant == "p2p" and halo_width is None:
        raise ValueError("variant='p2p' requires halo_width")
    if model_type in _SAGE_AGG:
        agg = _SAGE_AGG[model_type]
        if variant == "p2p":
            return HaloGraphSageP2P(hp.in_feats, hp.layer_sizes,
                                    hp.out_classes, agg, mesh,
                                    halo_width=halo_width, axis=axis)
        return HaloGraphSage(hp.in_feats, hp.layer_sizes, hp.out_classes,
                             agg, mesh, axis=axis)
    if model_type == "GAT":
        if variant == "p2p":
            return HaloGATP2P(hp.in_feats, hp.layer_sizes, hp.out_classes,
                              hp.gat_heads, hp.gat_residuals, mesh,
                              halo_width=halo_width, axis=axis)
        return HaloGAT(hp.in_feats, hp.layer_sizes, hp.out_classes,
                       hp.gat_heads, hp.gat_residuals, mesh, axis=axis)
    raise ValueError(f"Unknown model type: {model_type}")


def shard_partitioned(pg: PartitionedGraph, mesh: Mesh,
                      axis: str = "data") -> PartitionedGraph:
    """Place a PartitionedGraph with its leading shard axis on the mesh axis,
    so each device holds only its own node shard in HBM."""
    ns = NamedSharding(mesh, P(axis))
    put = lambda x: None if x is None else jax.device_put(x, ns)
    return dataclasses.replace(
        pg, nbr=put(pg.nbr), nbr_mask=put(pg.nbr_mask),
        node_mask=put(pg.node_mask), feats=put(pg.feats),
        labels=put(pg.labels),
    )


class HaloTrainer:
    """Optimizer-driven training over one or more PartitionedGraphs.

    One step = full forward+backward+AdamW over one giant partitioned graph;
    one epoch = one pass over all graphs; LR decays per epoch exactly like the
    reference's ExponentialLR (`model/gnn_model.py:47`).
    """

    def __init__(self, model_type: str, hp: HyperParams,
                 graphs: Sequence[PartitionedGraph], mesh: Mesh,
                 variant: str = "all_gather", halo_width: int | None = None,
                 axis: str = "data", seed: int = 0,
                 resume_from: str | None = None):
        self.model_type = model_type
        self.hp = hp
        self.mesh = mesh
        self.model = init_halo_net(model_type, hp, mesh, axis=axis,
                                   variant=variant, halo_width=halo_width)
        self.class_weights = jnp.asarray(hp.class_weights, jnp.float32)
        self.graphs = [shard_partitioned(g, mesh, axis) for g in graphs]

        params = self.model.init(jax.random.PRNGKey(seed))
        self.state, self._tx = make_train_state(
            params, hp.lr, hp.lr_decay, hp.w_decay)
        if resume_from:
            self._resume(resume_from)
        self._step = self._build_step()

    # ------------------------------------------------------------------ step
    def _build_step(self):
        model, cw, tx = self.model, self.class_weights, self._tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, pg: PartitionedGraph):
            loss, grads = jax.value_and_grad(
                lambda p: model.loss(p, pg, cw))(state.params)
            return apply_updates(tx, state, grads), loss

        return step

    def run_epoch(self) -> float:
        total = 0.0
        for pg in self.graphs:
            self.state, loss = self._step(self.state, pg)
            total += float(loss)
        self.state = self.state.next_epoch()
        return total / max(len(self.graphs), 1)

    # ----------------------------------------------------------- checkpoints
    def save_weights(self, folder: str, name: str,
                     include_opt_state: bool = True) -> None:
        """Standard config-embedded checkpoint — byte-compatible with the
        single-device GNNTrainer's, so halo-trained params load anywhere."""
        save_checkpoint(
            f"{folder}{name}.ckpt",
            self.state.params,
            self.model_type,
            self.hp,
            opt_state=self.state.opt_state if include_opt_state else None,
            extra={"epoch": int(self.state.epoch)},
        )

    def _resume(self, path: str) -> None:
        params, model_type, _, manifest = load_checkpoint(
            path, params_template=self.state.params)
        if model_type != self.model_type:
            raise ValueError(
                f"checkpoint is {model_type}, trainer is {self.model_type}")
        params = jax.tree_util.tree_map(jnp.asarray, params)
        opt = load_opt_state(path, self.state.opt_state)
        self.state = dataclasses.replace(
            self.state, params=params,
            opt_state=opt if opt is not None else self.state.opt_state,
            epoch=jnp.asarray(manifest["extra"].get("epoch", 0), jnp.int32),
        )
