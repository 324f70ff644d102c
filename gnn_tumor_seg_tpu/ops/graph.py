"""TPU-native batched graph container.

The reference pipeline (rsinghlab/GNN-Tumor-Seg) represents supervoxel graphs as
networkx objects converted to DGL graphs (`data_processing/data_loader.py:67-83`) and
minibatches them via DGL's disjoint union (`data_processing/data_loader.py:165-169`);
all message passing then runs in DGL's C++ gather/scatter runtime.

Here the graph lives in a *dense padded neighbor-list* ("ELL") layout instead:

  nbr       int32  [B, N, D]   src node index for each (dst, slot); padded slots -> 0
  nbr_mask  f32    [B, N, D]   1.0 where a real edge exists
  node_mask f32    [B, N]      1.0 where a real node exists
  feats     f32    [B, N, F]   node features (padded rows are zero)
  labels    int32  [B, N]      optional node labels (padded rows are -1)

Why ELL and not CSR/COO: supervoxel graphs are near-regular (kNN adjacency with
enforce_regularity gives ~k neighbors each, `mri2graph/graphgen.py:120-153`;
contiguity adjacency has small bounded degree), so padding waste is low, and every
downstream op becomes a dense batched gather + masked reduce with static shapes —
exactly what XLA/TPU wants. Edge softmax for GAT degenerates to a masked row softmax.
Shapes are bucketed to limit recompilation; batching is a leading axis (stack), not a
disjoint union, so `vmap`/`shard_map` over B gives data parallelism for free.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "GraphBatch",
    "ell_from_edges",
    "ell_from_adjacency",
    "graph_from_arrays",
    "batch_graphs",
    "bucket_size",
    "NODE_BUCKETS",
    "DEGREE_BUCKETS",
]

# Node-count buckets: static shapes for XLA. BraTS supervoxel graphs are ~5-7k nodes
# (SURVEY §2.5); buckets cover synthetic/test sizes through full-scale graphs.
NODE_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 6144, 8192, 12288, 16384)
# Max-degree buckets. 12 earns its slot: the default kNN graphs (k=10 with
# regularity enforcement) have max degree 10-12, and aggregation cost scales
# with the slot count.
DEGREE_BUCKETS = (8, 12, 16, 24, 32, 48, 64, 96, 128)


def bucket_size(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; rounds up to a multiple of the largest bucket if oversize."""
    for b in buckets:
        if n <= b:
            return b
    step = buckets[-1]
    return ((n + step - 1) // step) * step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A batch of B padded graphs. All arrays have a leading batch axis.

    Single graphs are represented as B=1 batches; `vmap`-style code never needs to
    special-case. `labels` may be None when ground truth is unavailable (test time,
    mirroring read_label=False in the reference's ImageGraphDataset).
    """

    nbr: jax.Array        # int32 [B, N, D]
    nbr_mask: jax.Array   # f32   [B, N, D]
    node_mask: jax.Array  # f32   [B, N]
    feats: jax.Array      # f32   [B, N, F]
    labels: jax.Array | None  # int32 [B, N] or None
    n_nodes: jax.Array    # int32 [B]
    # optional per-edge weights aligned with nbr slots: edge_weight[b, v, d] is
    # the weight of the edge nbr[b, v, d] -> v (padded slots 0). Produced by the
    # weighted-adjacency option (`mri2graph/graphgen.py:120-153` weighted=True,
    # data/graph_build.intensity_edge_weights); consumed by sum/mean
    # aggregation (ops/aggregate.py)
    edge_weight: jax.Array | None = None
    # optional tile-compaction tables for the Pallas aggregation kernels
    # (ops/pallas/); None unless with_tiled_aux() has been called
    tiled: object | None = None

    @property
    def batch_size(self) -> int:
        return self.nbr.shape[0]

    @property
    def num_nodes_padded(self) -> int:
        return self.nbr.shape[1]

    @property
    def max_degree(self) -> int:
        return self.nbr.shape[2]

    @property
    def degrees(self) -> jax.Array:
        """f32 [B, N] number of real in-edges per node."""
        return jnp.sum(self.nbr_mask, axis=-1)

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)

    def with_tiled_aux(self, u_align: int = 16,
                       tile: int | None = None) -> "GraphBatch":
        """Host-side: attach the tile-compaction tables used by impl='pallas'.

        tile: dst-tile size (default ops/pallas/tiling.TILE_N); the kernels
        read it back from the tables, so any 8-multiple that divides N works —
        see scripts/sweep_tiling.py for the measured TILE_N x u_align surface.
        """
        if self.tiled is not None:
            return self
        from .pallas.tiling import TILE_N, build_tiled_aux

        aux = build_tiled_aux(np.asarray(self.nbr), np.asarray(self.nbr_mask),
                              tile=tile or TILE_N, u_align=u_align)
        return self.replace(tiled=aux)


def ell_from_edges(
    n_nodes: int,
    src: np.ndarray,
    dst: np.ndarray,
    n_pad: int | None = None,
    d_pad: int | None = None,
    edge_vals: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: COO edge list -> padded neighbor table.

    For each destination node, collects the source endpoints of its in-edges
    (per-destination aggregation semantics of DGL's update_all; edges here are
    already stored in both directions for undirected graphs).

    Returns (nbr int32 [n_pad, d_pad], nbr_mask float32 [n_pad, d_pad]); with
    edge_vals (a float per COO edge, e.g. weights), returns a third
    float32 [n_pad, d_pad] table slotted identically.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    counts = np.bincount(dst, minlength=n_nodes)
    max_deg = int(counts.max()) if len(dst) else 0
    if n_pad is None:
        n_pad = bucket_size(n_nodes, NODE_BUCKETS)
    if d_pad is None:
        d_pad = bucket_size(max(max_deg, 1), DEGREE_BUCKETS)
    if max_deg > d_pad:
        raise ValueError(f"max degree {max_deg} exceeds degree padding {d_pad}")
    if n_nodes > n_pad:
        raise ValueError(f"n_nodes {n_nodes} exceeds node padding {n_pad}")

    nbr = np.zeros((n_pad, d_pad), dtype=np.int32)
    mask = np.zeros((n_pad, d_pad), dtype=np.float32)
    # Stable fill: sort edges by dst, then slot edges per dst in order.
    order = np.argsort(dst, kind="stable")
    s_sorted = src[order]
    d_sorted = dst[order]
    # slot index within each dst group
    slot = np.arange(len(d_sorted)) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    nbr[d_sorted, slot] = s_sorted
    mask[d_sorted, slot] = 1.0
    if edge_vals is not None:
        vals = np.zeros((n_pad, d_pad), dtype=np.float32)
        vals[d_sorted, slot] = np.asarray(edge_vals, np.float32)[order]
        return nbr, mask, vals
    return nbr, mask


def ell_from_adjacency(
    adj: np.ndarray, n_pad: int | None = None, d_pad: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: boolean adjacency matrix -> padded neighbor table.

    adj[i, j] nonzero means an edge j -> i (and, for the symmetric matrices produced
    by the graph builder, also i -> j). Mirrors nx.from_numpy_array semantics used at
    `mri2graph/graphgen.py:259` (symmetric matrix -> undirected graph -> both
    directions in DGL).
    """
    adj = np.asarray(adj)
    dst, src = np.nonzero(adj)
    return ell_from_edges(adj.shape[0], src, dst, n_pad=n_pad, d_pad=d_pad)


def graph_from_arrays(
    feats: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    labels: np.ndarray | None = None,
    n_pad: int | None = None,
    d_pad: int | None = None,
    edge_weights: np.ndarray | None = None,
    tiled: bool = False,
    tile: int | None = None,
    u_align: int = 16,
    as_numpy: bool = False,
) -> GraphBatch:
    """Host-side: build a B=1 GraphBatch from numpy node features + COO edges.

    edge_weights (optional, one float per COO edge) lands on the slotted
    GraphBatch.edge_weight table.

    tiled=True builds the Pallas tile-compaction tables from the HOST arrays
    before anything is transferred — the per-sample loading path must never
    read device arrays back (with_tiled_aux on a device graph costs a D2H
    round-trip per sample, which stalls the dispatch pipeline and is
    pathologically slow through remote-attached chips: first-call D2H
    measured 8-270 s on this relay).

    as_numpy=True returns host (numpy) leaves throughout: the trainer caches
    per-sample graphs host-side and ships ONE assembled batch per step to the
    device (fewer, larger H2D; dataset size bounded by host RAM, not HBM)."""
    n_nodes, f_dim = feats.shape
    w_tab = None
    if edge_weights is not None:
        nbr, mask, w_tab = ell_from_edges(n_nodes, src, dst, n_pad=n_pad,
                                          d_pad=d_pad, edge_vals=edge_weights)
    else:
        nbr, mask = ell_from_edges(n_nodes, src, dst, n_pad=n_pad, d_pad=d_pad)
    aux = None
    if tiled:
        from .pallas.tiling import TILE_N, build_tiled_aux

        aux = build_tiled_aux(nbr[None], mask[None], tile=tile or TILE_N,
                              u_align=u_align, as_numpy=as_numpy)
    n_pad = nbr.shape[0]
    feats_p = np.zeros((n_pad, f_dim), dtype=np.float32)
    feats_p[:n_nodes] = feats
    node_mask = np.zeros((n_pad,), dtype=np.float32)
    node_mask[:n_nodes] = 1.0
    labels_p = None
    if labels is not None:
        labels_p = np.full((n_pad,), -1, dtype=np.int32)
        labels_p[:n_nodes] = labels
    conv = (lambda x: x) if as_numpy else jnp.asarray
    return GraphBatch(
        nbr=conv(nbr)[None],
        nbr_mask=conv(mask)[None],
        node_mask=conv(node_mask)[None],
        feats=conv(feats_p)[None],
        labels=None if labels_p is None else conv(labels_p)[None],
        n_nodes=conv(np.asarray([n_nodes], dtype=np.int32)),
        edge_weight=None if w_tab is None else conv(w_tab)[None],
        tiled=aux,
    )


def batch_graphs(
    graphs: Sequence[GraphBatch],
    n_pad: int | None = None,
    d_pad: int | None = None,
    u_pad: int | None = None,
) -> GraphBatch:
    """Stack B=1 graphs into one batch, repadding to shared bucket shapes.

    TPU-native replacement for dgl.batch's disjoint union + host-side concat
    (`data_processing/data_loader.py:165-169`): the batch axis stays explicit so it
    can be sharded across a device mesh. Passing n_pad/d_pad pins the bucket (e.g.
    a dataset-wide shape so every train step compiles exactly once); u_pad
    likewise pins the tiling unique budget (otherwise it floats with the batch
    composition and each distinct value is a fresh compile).
    """
    if n_pad is None:
        n_pad = bucket_size(max(g.num_nodes_padded for g in graphs), NODE_BUCKETS)
    if d_pad is None:
        d_pad = bucket_size(max(g.max_degree for g in graphs), DEGREE_BUCKETS)
    f_dim = graphs[0].feats.shape[-1]
    has_labels = graphs[0].labels is not None

    # fast path: every graph already sits at the target buckets (the common
    # case in training, where the dataset pins a shape budget). Device-array
    # inputs concatenate on-device (no host round-trip per step); all-numpy
    # inputs (host-resident graph caches) assemble host-side so the jitted
    # step does ONE H2D per leaf — async dispatch overlaps it with the
    # previous step's compute
    if all(g.num_nodes_padded == n_pad and g.max_degree == d_pad
           for g in graphs):
        host = all(isinstance(g.nbr, np.ndarray) for g in graphs)
        xp = np if host else jnp
        cat = lambda xs: xp.concatenate(xs, axis=0)
        tiled = None
        if all(g.tiled is not None for g in graphs):
            from .pallas.tiling import TiledAux

            # differing unique budgets pad on-device: extra uniq entries point
            # at row 0, which no lidx slot references — harmless
            u_max = max(g.tiled.unique_budget for g in graphs)
            if u_pad is not None:
                u_max = max(u_max, u_pad)
            pad_u = lambda x: xp.pad(x, ((0, 0), (0, 0),
                                         (0, u_max - x.shape[2])))
            tiled = TiledAux(
                uniq=cat([pad_u(g.tiled.uniq) for g in graphs]),
                lidx=cat([g.tiled.lidx for g in graphs]),
                rslot=cat([g.tiled.rslot for g in graphs]),
            )
        has_w = all(g.edge_weight is not None for g in graphs)
        out = GraphBatch(
            nbr=cat([g.nbr for g in graphs]),
            nbr_mask=cat([g.nbr_mask for g in graphs]),
            node_mask=cat([g.node_mask for g in graphs]),
            feats=cat([g.feats for g in graphs]),
            labels=(cat([g.labels for g in graphs]) if has_labels else None),
            n_nodes=cat([g.n_nodes for g in graphs]),
            edge_weight=(cat([g.edge_weight for g in graphs]) if has_w else None),
            tiled=tiled,
        )
        if tiled is None and any(g.tiled is not None for g in graphs):
            out = out.with_tiled_aux()
        return out

    def pad_to(x, n, d=None, fill=0):
        x = np.asarray(x)
        pads = [(0, 0)] * x.ndim
        pads[1] = (0, n - x.shape[1])
        if d is not None:
            pads[2] = (0, d - x.shape[2])
        return np.pad(x, pads, constant_values=fill)

    nbr = np.concatenate([pad_to(g.nbr, n_pad, d_pad) for g in graphs])
    nbr_mask = np.concatenate([pad_to(g.nbr_mask, n_pad, d_pad) for g in graphs])
    node_mask = np.concatenate([pad_to(g.node_mask, n_pad) for g in graphs])
    feats = np.concatenate([pad_to(g.feats, n_pad) for g in graphs])
    labels = None
    if has_labels:
        labels = jnp.asarray(
            np.concatenate([pad_to(g.labels, n_pad, fill=-1) for g in graphs])
        )
    n_nodes = np.concatenate([np.asarray(g.n_nodes) for g in graphs])
    assert feats.shape == (len(graphs), n_pad, f_dim)

    tiled = None
    if all(g.tiled is not None for g in graphs) and all(
        g.num_nodes_padded == n_pad and g.max_degree == d_pad for g in graphs
    ):
        from .pallas.tiling import TiledAux

        u_tgt = max(g.tiled.unique_budget for g in graphs)
        if u_pad is not None:
            u_tgt = max(u_tgt, u_pad)
        uniq = np.concatenate([
            np.pad(np.asarray(g.tiled.uniq),
                   ((0, 0), (0, 0), (0, u_tgt - g.tiled.unique_budget)))
            for g in graphs
        ])
        lidx = np.concatenate([np.asarray(g.tiled.lidx) for g in graphs])
        rslot = np.concatenate([np.asarray(g.tiled.rslot) for g in graphs])
        tiled = TiledAux(uniq=jnp.asarray(uniq), lidx=jnp.asarray(lidx),
                         rslot=jnp.asarray(rslot))

    edge_weight = None
    if all(g.edge_weight is not None for g in graphs):
        edge_weight = jnp.asarray(np.concatenate(
            [pad_to(g.edge_weight, n_pad, d_pad) for g in graphs]))

    out = GraphBatch(
        nbr=jnp.asarray(nbr),
        nbr_mask=jnp.asarray(nbr_mask),
        node_mask=jnp.asarray(node_mask),
        feats=jnp.asarray(feats),
        labels=labels,
        n_nodes=jnp.asarray(n_nodes, dtype=np.int32),
        edge_weight=edge_weight,
        tiled=tiled,
    )
    if tiled is None and any(g.tiled is not None for g in graphs):
        # inputs carried aux but bucket shapes diverged: rebuild on the batch
        out = out.with_tiled_aux()
    return out
