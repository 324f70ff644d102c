"""Dataset -> PartitionedGraph glue for the halo (node-partitioned) regime.

The reference trains on minibatches of 6 disjoint-union graphs
(`model/gnn_model.py:12,34-48`, union via `dgl.batch` at
`data_processing/data_loader.py:165-169`). The halo regime keeps the same
disjoint-union semantics but lays the union out as ONE giant graph whose nodes
are split contiguously across the mesh (parallel/halo.py), so graphs that do
not fit one chip still train full-graph-per-step.

This module is the host-side bridge the CLI uses:

  build_partitioned_sets     — chunk several index groups (e.g. train + val
                               fold) into unions and partition them with ONE
                               common (shard, degree, halo-width) shape, so a
                               single compiled step/model covers them all —
                               required for p2p, whose exchange width is baked
                               into the model;
  build_partitioned_batches  — single-group convenience wrapper;
  unpermute_nodes            — undo the shard layout, recovering per-node rows
                               in original union order (eval/predict side);
  PartitionedBatch           — the partitioned union plus the per-sample
                               bookkeeping (ids, node offsets) evaluation
                               needs to slice per-brain metrics back out.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from .halo import PartitionedGraph, partition_graph, partition_graph_p2p

__all__ = ["PartitionedBatch", "union_samples", "build_partitioned_sets",
           "build_partitioned_batches", "unpermute_nodes"]


@dataclasses.dataclass
class PartitionedBatch:
    """A partitioned disjoint-union graph + the metadata to undo it."""

    pg: PartitionedGraph
    variant: str                 # "all_gather" | "p2p"
    halo_width: int | None       # set iff variant == "p2p"
    sample_ids: list[str]        # mri ids of the union, in order
    offsets: np.ndarray          # int64 [B+1]: node range of sample b is
                                 # [offsets[b], offsets[b+1]) in union order
    n_total: int                 # real (unpadded) nodes in the union


def union_samples(samples: Sequence) -> tuple[np.ndarray, np.ndarray,
                                              np.ndarray, np.ndarray | None,
                                              np.ndarray, np.ndarray | None]:
    """Disjoint union of GraphSamples (same contract as the reference's
    `dgl.batch` + concat, `data_processing/data_loader.py:165-169`).

    Returns (feats, src, dst, labels_or_None, offsets[B+1],
    edge_weights_or_None); edge endpoints are offset into the union id space.
    """
    feats = np.concatenate([s.feats for s in samples], axis=0)
    offsets = np.zeros(len(samples) + 1, np.int64)
    offsets[1:] = np.cumsum([s.n_nodes for s in samples])
    src = np.concatenate(
        [s.src.astype(np.int64) + offsets[b] for b, s in enumerate(samples)])
    dst = np.concatenate(
        [s.dst.astype(np.int64) + offsets[b] for b, s in enumerate(samples)])
    labels = None
    if all(s.labels is not None for s in samples):
        labels = np.concatenate([s.labels for s in samples]).astype(np.int32)
    weights = None
    if all(getattr(s, "edge_weights", None) is not None for s in samples):
        weights = np.concatenate(
            [s.edge_weights for s in samples]).astype(np.float32)
    return feats.astype(np.float32), src, dst, labels, offsets, weights


def _collect_raw(dataset, indices: Sequence[int], graphs_per_batch: int):
    """[(feats, src, dst, labels, offsets, weights, ids)] per union chunk."""
    indices = list(indices)
    raw = []
    for i in range(0, len(indices), graphs_per_batch):
        chunk = indices[i:i + graphs_per_batch]
        samples = [dataset.get_sample(int(j)) for j in chunk]
        ids = [dataset.ids[int(j)] for j in chunk]
        raw.append((*union_samples(samples), ids))
    return raw


def _common_aux_budget(batches: Sequence["PartitionedBatch"]) -> None:
    """Pad every batch's Pallas aux to one unique budget so a single compiled
    step serves them all (same rationale as GNNTrainer's monotone _u_budget)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    auxes = [b.pg.tiled for b in batches if b.pg.tiled is not None]
    if not auxes:
        return
    u_max = max(a.unique_budget for a in auxes)
    for b in batches:
        a = b.pg.tiled
        if a is None or a.unique_budget == u_max:
            continue
        pad = u_max - a.unique_budget
        # extra uniq entries point at row 0, which no lidx slot references
        uniq = jnp.pad(jnp.asarray(a.uniq), ((0, 0), (0, 0), (0, pad)))
        b.pg = _dc.replace(b.pg, tiled=_dc.replace(a, uniq=uniq))


def _natural_shapes(n: int, dst, n_parts: int) -> tuple[int, int]:
    per = -(-n // n_parts)
    shard = -(-per // 8) * 8
    deg = np.bincount(dst, minlength=n)
    d_pad = -(-max(int(deg.max(initial=0)), 1) // 8) * 8
    return shard, d_pad


def build_partitioned_sets(dataset, n_parts: int, graphs_per_batch: int,
                           variant: str = "all_gather",
                           groups: Sequence[Sequence[int]] = (),
                           tiled: bool = False, tile: int | None = None,
                           ) -> tuple[list[list[PartitionedBatch]], str,
                                      int | None]:
    """Partition several index groups (e.g. [train_idx, val_idx]) with ONE
    common (shard, degree, halo, tiling-U) shape, so the same compiled step —
    and for p2p the same fixed-exchange-width model — serves every batch of
    every group.

    variant="p2p" uses the boundary-only ppermute exchange where the unions'
    edge structure allows it (contiguous SLIC ids give 1-shard locality); if
    ANY chunk violates it, ALL groups fall back to all_gather (mixing exchange
    variants would need two models and defeat the shape pinning).

    tiled=True builds the Pallas tile-compaction aux per shard (pass the
    model's preferred_tile) so HaloTrainer can run impl='pallas'.

    Returns (batches_per_group, variant_used, halo_width_or_None).
    """
    if variant not in ("all_gather", "p2p"):
        raise ValueError(f"unknown halo variant {variant!r}")
    raws = [_collect_raw(dataset, g, graphs_per_batch) for g in groups]
    flat = [r for group in raws for r in group]

    shard_max = d_max = 1
    for feats, _, dst, *_ in flat:
        shard, d_pad = _natural_shapes(feats.shape[0], dst, n_parts)
        shard_max, d_max = max(shard_max, shard), max(d_max, d_pad)

    def build(partition):
        out = []
        for group in raws:
            batches = []
            for feats, src, dst, labels, offsets, weights, ids in group:
                batches.append(partition(feats, src, dst, labels, offsets,
                                         weights, ids))
            out.append(batches)
        for batches in out:
            _common_aux_budget(batches)
        return out

    if variant == "p2p":
        # two-pass: natural W per chunk under the common pads, then rebuild
        # every chunk with the max so one exchange width covers them all
        try:
            w_max = 0
            for feats, src, dst, labels, *_ in flat:
                _, w = partition_graph_p2p(feats, src, dst, labels, n_parts,
                                           shard_pad_to=shard_max,
                                           d_pad_to=d_max)
                w_max = max(w_max, w)

            def p2p(feats, src, dst, labels, offsets, weights, ids):
                pg, w = partition_graph_p2p(feats, src, dst, labels, n_parts,
                                            shard_pad_to=shard_max,
                                            d_pad_to=d_max,
                                            halo_pad_to=w_max,
                                            edge_weights=weights,
                                            tiled=tiled, tile=tile)
                assert w == w_max
                return PartitionedBatch(pg, "p2p", w, ids, offsets,
                                        feats.shape[0])

            return build(p2p), "p2p", w_max
        except ValueError as e:
            print(f"halo p2p unavailable ({e}); falling back to all_gather")

    def ag(feats, src, dst, labels, offsets, weights, ids):
        pg = partition_graph(feats, src, dst, labels, n_parts,
                             shard_pad_to=shard_max, d_pad_to=d_max,
                             edge_weights=weights, tiled=tiled, tile=tile)
        return PartitionedBatch(pg, "all_gather", None, ids, offsets,
                                feats.shape[0])

    return build(ag), "all_gather", None


def build_partitioned_batches(dataset, n_parts: int, graphs_per_batch: int,
                              variant: str = "all_gather",
                              indices: Sequence[int] | None = None,
                              tiled: bool = False, tile: int | None = None,
                              ) -> list[PartitionedBatch]:
    """Single-group convenience wrapper around build_partitioned_sets."""
    if indices is None:
        indices = range(len(dataset))
    sets, _, _ = build_partitioned_sets(dataset, n_parts, graphs_per_batch,
                                        variant, [list(indices)],
                                        tiled=tiled, tile=tile)
    return sets[0]


def unpermute_nodes(x: np.ndarray, n_total: int) -> np.ndarray:
    """Undo the shard layout: [S, N_shard, ...] -> [n_total, ...] in original
    union node order (inverse of partition_graph's to_padded mapping)."""
    n_parts, shard = x.shape[0], x.shape[1]
    flat = np.asarray(x).reshape(n_parts * shard, *x.shape[2:])
    per = -(-n_total // n_parts)
    ids = np.arange(n_total)
    return flat[(ids // per) * shard + (ids % per)]
