"""Node-partitioned execution of one giant graph across a device mesh.

This is the graph-world analog of sequence parallelism (SURVEY §5.7): when a
batched supervoxel graph is too big for one chip, its *nodes* are partitioned
contiguously across devices; each device owns its nodes' features, computes their
layer outputs, and fetches neighbor features from peer devices over ICI.

Two exchange strategies, both exactly matching single-device numerics (tested):

  HaloGraphSage     — tiled all_gather of the (projected) node features inside
                      shard_map: a full halo; works for any edge structure.
  HaloGraphSageP2P  — boundary-only exchange: contiguous partitions of
                      spatially ordered supervoxel graphs have 1-shard edge
                      locality, so each device ppermutes just its 2*W boundary
                      rows to its ring neighbors over ICI (W = measured halo
                      width), instead of moving the whole table.

Because SAGE-pool projects before aggregating (W_pool h), the exchange moves
already-projected features, and each device's matmuls run only on its shard.

The parameter pytrees are shared with models/sage.py:GraphSage, so the same
checkpoint runs single-chip or partitioned.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.gat import GAT
from ..models.sage import GraphSage
from ..train.losses import weighted_cross_entropy

__all__ = ["PartitionedGraph", "partition_graph", "HaloGraphSage",
           "partition_graph_p2p", "HaloGraphSageP2P",
           "HaloGAT", "HaloGATP2P", "extend_halo", "exchange_bytes_per_step"]

_NEG_LARGE = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """One giant graph, nodes split contiguously into n_parts shards.

    Arrays carry a leading shard axis [n_parts, N_shard, ...]; `nbr` holds
    *global* node indices (into the concatenation of all shards).
    """

    nbr: jax.Array        # int32 [S, N_shard, D]
    nbr_mask: jax.Array   # f32   [S, N_shard, D]
    node_mask: jax.Array  # f32   [S, N_shard]
    feats: jax.Array      # f32   [S, N_shard, F]
    labels: jax.Array | None  # int32 [S, N_shard]

    @property
    def n_parts(self) -> int:
        return self.nbr.shape[0]

    @property
    def shard_size(self) -> int:
        return self.nbr.shape[1]


def partition_graph(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
                    labels: np.ndarray | None, n_parts: int,
                    shard_pad_to: int | None = None,
                    d_pad_to: int | None = None) -> PartitionedGraph:
    """Host-side: contiguous node partition -> PartitionedGraph.

    Contiguous ranges keep most supervoxel edges local (SLIC supervoxel ids are
    spatially coherent), which the future boundary-only exchange exploits.
    shard_pad_to / d_pad_to let a caller pin shapes across a sequence of
    partitioned batches so every batch hits the same compiled step.
    """
    n = feats.shape[0]
    shard = -(-n // n_parts)
    if shard_pad_to is not None:
        shard = max(shard, shard_pad_to)
    shard = -(-shard // 8) * 8  # sublane-align
    total = shard * n_parts

    deg = np.bincount(dst, minlength=n)
    d_pad = -(-max(int(deg.max()), 1) // 8) * 8
    if d_pad_to is not None:
        d_pad = max(d_pad, d_pad_to)

    nbr = np.zeros((total, d_pad), np.int32)
    mask = np.zeros((total, d_pad), np.float32)
    order = np.argsort(dst, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    slot = np.arange(len(d_sorted)) - np.repeat(
        np.concatenate(([0], np.cumsum(deg)[:-1])), deg
    )
    # map original node id -> padded global id (shard-local padding at the end
    # of each shard): node i lives in shard i//ceil; but contiguous ranges of
    # real ids must land in shard slots. real id i -> (i // per, i % per)
    per = -(-n // n_parts)  # real nodes per shard before padding

    def to_padded(i):
        return (i // per) * shard + (i % per)

    nbr[to_padded(d_sorted), slot] = to_padded(s_sorted)
    mask[to_padded(d_sorted), slot] = 1.0

    feats_p = np.zeros((total, feats.shape[1]), np.float32)
    feats_p[to_padded(np.arange(n))] = feats
    node_mask = np.zeros((total,), np.float32)
    node_mask[to_padded(np.arange(n))] = 1.0
    labels_p = None
    if labels is not None:
        lp = np.full((total,), -1, np.int32)
        lp[to_padded(np.arange(n))] = labels
        labels_p = jnp.asarray(lp.reshape(n_parts, shard))
    return PartitionedGraph(
        nbr=jnp.asarray(nbr.reshape(n_parts, shard, d_pad)),
        nbr_mask=jnp.asarray(mask.reshape(n_parts, shard, d_pad)),
        node_mask=jnp.asarray(node_mask.reshape(n_parts, shard)),
        feats=jnp.asarray(feats_p.reshape(n_parts, shard, feats.shape[1])),
        labels=labels_p,
    )


def _gather_reduce(h_full, nbr, mask, op):
    """h_full [N_total, F] (post-exchange), nbr [N_shard, D] global ids."""
    g = h_full[nbr]                                   # [N_shard, D, F]
    m = mask[..., None]
    if op == "sum":
        return jnp.sum(g * m, axis=1)
    if op == "mean":
        d = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return jnp.sum(g * m, axis=1) / d
    g = jnp.where(m > 0, g, _NEG_LARGE)
    out = jnp.max(g, axis=1)
    return jnp.where(jnp.sum(mask, axis=1, keepdims=True) > 0, out, 0.0)


class HaloGraphSage:
    """GraphSage forward/loss over a PartitionedGraph via shard_map.

    Same constructor/params as models.sage.GraphSage; apply() consumes a
    PartitionedGraph whose shard axis maps onto the mesh 'data' axis.
    """

    def __init__(self, in_feats, layer_sizes, n_classes, aggregator,
                 mesh: Mesh, axis: str = "data"):
        self.base = GraphSage(in_feats, layer_sizes, n_classes, aggregator)
        self.aggregator = aggregator
        self.mesh = mesh
        self.axis = axis

    def init(self, key):
        return self.base.init(key)

    # ---------------------------------------------------------------- layers
    def _layer(self, lp, h, nbr, mask, axis, last):
        agg = self.aggregator
        if agg == "pool":
            p = jax.nn.relu(h @ lp["w_pool"] + lp["b_pool"])
            p_full = jax.lax.all_gather(p, axis, tiled=True)   # halo exchange
            mx = _gather_reduce(p_full, nbr, mask, "max")
            out = h @ lp["w_self"] + mx @ lp["w_neigh"]
        elif agg == "mean":
            h_full = jax.lax.all_gather(h, axis, tiled=True)
            hn = _gather_reduce(h_full, nbr, mask, "mean")
            out = h @ lp["w_self"] + hn @ lp["w_neigh"]
        else:  # gcn
            h_full = jax.lax.all_gather(h, axis, tiled=True)
            s = _gather_reduce(h_full, nbr, mask, "sum")
            deg = jnp.sum(mask, axis=-1, keepdims=True)
            out = ((s + h) / (deg + 1.0)) @ lp["w_neigh"]
        out = out + lp["bias"]
        return out if last else jax.nn.relu(out)

    def apply(self, params, pg: PartitionedGraph) -> jax.Array:
        """-> logits [S, N_shard, C]."""
        axis = self.axis
        n_layers = self.base.num_layers

        def shard_fwd(params, feats, nbr, mask):
            # inside shard_map: leading shard axis is consumed; block shapes
            # [1, N_shard, ...] -> squeeze
            h = feats[0]
            nbr_, mask_ = nbr[0], mask[0]
            for i, lp in enumerate(params):
                h = self._layer(lp, h, nbr_, mask_, axis, last=(i == n_layers - 1))
            return h[None]

        fwd = shard_map(
            shard_fwd,
            mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        return fwd(params, pg.feats, pg.nbr, pg.nbr_mask)

    def loss(self, params, pg: PartitionedGraph, class_weights) -> jax.Array:
        logits = self.apply(params, pg)
        return weighted_cross_entropy(logits, pg.labels, class_weights,
                                      pg.node_mask)


# ---------------------------------------------------------------------------
# Boundary-only (ppermute) halo exchange
# ---------------------------------------------------------------------------


def partition_graph_p2p(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
                        labels: np.ndarray | None, n_parts: int,
                        shard_pad_to: int | None = None,
                        d_pad_to: int | None = None,
                        halo_pad_to: int | None = None):
    """Contiguous node partition with *boundary-only* halo metadata.

    Requires 1-shard locality: every edge connects nodes in the same or an
    adjacent shard (true for spatially ordered supervoxel graphs partitioned
    contiguously; raises ValueError otherwise — fall back to partition_graph's
    full all_gather exchange). Returns (PartitionedGraph with nbr holding
    *extended-buffer-local* indices, halo_width).

    Extended buffer layout per shard s (inside the shard_map body):
        [ last W rows of shard s-1 | own N_shard rows | first W rows of s+1 ]
    so only 2*W boundary rows cross ICI per step instead of the whole table.
    """
    n = feats.shape[0]
    per = -(-n // n_parts)
    shard = -(-per // 8) * 8
    if shard_pad_to is not None:
        shard = max(shard, -(-shard_pad_to // 8) * 8)
    total = shard * n_parts

    shard_of = lambda i: i // per
    off_of = lambda i: i % per

    s_u, s_v = shard_of(src), shard_of(dst)
    jump = np.abs(s_u - s_v)
    if jump.max(initial=0) > 1:
        raise ValueError(
            "edges span non-adjacent shards; use partition_graph (all_gather)"
        )
    # halo width: deepest reach into a neighboring shard, from either side
    right = s_u == s_v - 1   # dst needs a row from its LEFT neighbor: src at
    left = s_u == s_v + 1    # high offsets; and vice versa
    need = 1
    if left.any():
        need = max(need, int((off_of(src[left]) + 1).max()))
    if right.any():
        need = max(need, int((shard - off_of(src[right])).max()))
    W = -(-need // 8) * 8
    if halo_pad_to is not None:
        W = max(W, -(-halo_pad_to // 8) * 8)
    if W > shard:
        raise ValueError("halo wider than a shard; use partition_graph")

    deg = np.bincount(dst, minlength=n)
    d_pad = -(-max(int(deg.max()), 1) // 8) * 8
    if d_pad_to is not None:
        d_pad = max(d_pad, d_pad_to)

    def to_padded(i):
        return (i // per) * shard + (i % per)

    # extended-buffer-local index of src row, from the perspective of dst's shard
    def to_local(s_dst, src_ids):
        s_src = shard_of(src_ids)
        o = off_of(src_ids)
        same = W + o
        from_right = W + shard + o
        from_left = W - (shard - o)
        return np.where(s_src == s_dst, same,
                        np.where(s_src == s_dst + 1, from_right, from_left))

    nbr = np.zeros((total, d_pad), np.int32)
    mask = np.zeros((total, d_pad), np.float32)
    order = np.argsort(dst, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    slot = np.arange(len(d_sorted)) - np.repeat(
        np.concatenate(([0], np.cumsum(deg)[:-1])), deg
    )
    rows = to_padded(d_sorted)
    nbr[rows, slot] = to_local(shard_of(d_sorted), s_sorted)
    mask[rows, slot] = 1.0
    # padded slots self-reference so indices always stay in range
    own_local = W + (np.arange(total) % shard)
    pad_slots = mask == 0.0
    nbr[pad_slots] = np.broadcast_to(own_local[:, None], nbr.shape)[pad_slots]

    feats_p = np.zeros((total, feats.shape[1]), np.float32)
    feats_p[to_padded(np.arange(n))] = feats
    node_mask = np.zeros((total,), np.float32)
    node_mask[to_padded(np.arange(n))] = 1.0
    labels_p = None
    if labels is not None:
        lp = np.full((total,), -1, np.int32)
        lp[to_padded(np.arange(n))] = labels
        labels_p = jnp.asarray(lp.reshape(n_parts, shard))
    pg = PartitionedGraph(
        nbr=jnp.asarray(nbr.reshape(n_parts, shard, d_pad)),
        nbr_mask=jnp.asarray(mask.reshape(n_parts, shard, d_pad)),
        node_mask=jnp.asarray(node_mask.reshape(n_parts, shard)),
        feats=jnp.asarray(feats_p.reshape(n_parts, shard, feats.shape[1])),
        labels=labels_p,
    )
    return pg, W


def extend_halo(h, axis: str, W: int):
    """[N_shard, F] -> [W + N_shard + W, F] via two ring ppermutes: receive the
    left neighbor's LAST W rows and the right neighbor's FIRST W rows."""
    n_dev = jax.lax.axis_size(axis)
    from_left = jax.lax.ppermute(
        h[-W:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    from_right = jax.lax.ppermute(
        h[:W], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    return jnp.concatenate([from_left, h, from_right], axis=0)


class HaloGraphSageP2P(HaloGraphSage):
    """GraphSage over a p2p-partitioned graph: per layer, each device exchanges
    only its 2*W boundary rows with its ring neighbors via ppermute (ICI),
    instead of all-gathering the whole (projected) feature table. Numerics are
    identical to HaloGraphSage / single-device execution (tested)."""

    def __init__(self, in_feats, layer_sizes, n_classes, aggregator,
                 mesh: Mesh, halo_width: int, axis: str = "data"):
        super().__init__(in_feats, layer_sizes, n_classes, aggregator, mesh,
                         axis=axis)
        self.halo_width = halo_width

    def _extend(self, h, axis):
        return extend_halo(h, axis, self.halo_width)

    def _layer(self, lp, h, nbr, mask, axis, last):
        agg = self.aggregator
        if agg == "pool":
            p = jax.nn.relu(h @ lp["w_pool"] + lp["b_pool"])
            ext = self._extend(p, axis)                  # boundary-only halo
            mx = _gather_reduce(ext, nbr, mask, "max")
            out = h @ lp["w_self"] + mx @ lp["w_neigh"]
        elif agg == "mean":
            ext = self._extend(h, axis)
            hn = _gather_reduce(ext, nbr, mask, "mean")
            out = h @ lp["w_self"] + hn @ lp["w_neigh"]
        else:  # gcn
            ext = self._extend(h, axis)
            s = _gather_reduce(ext, nbr, mask, "sum")
            deg = jnp.sum(mask, axis=-1, keepdims=True)
            out = ((s + h) / (deg + 1.0)) @ lp["w_neigh"]
        out = out + lp["bias"]
        return out if last else jax.nn.relu(out)


# ---------------------------------------------------------------------------
# GAT over a partitioned graph
# ---------------------------------------------------------------------------


class HaloGAT:
    """GAT forward/loss over a PartitionedGraph via shard_map.

    The attention logits decompose into src + dst scalar terms (models/gat.py),
    so the halo exchange per layer moves ONE packed [z | el] table — the
    projected per-head features plus the src attention terms — and the edge
    softmax + combine then run entirely shard-locally. Numerics are identical
    to models.gat.GAT on the same graph (tested); the parameter pytrees are
    shared with it, so checkpoints run single-chip or partitioned.
    Reference semantics: `model/networks.py:39-66`.
    """

    def __init__(self, in_feats, layer_sizes, n_classes, heads, residuals,
                 mesh: Mesh, axis: str = "data", negative_slope: float = 0.2):
        self.base = GAT(in_feats, layer_sizes, n_classes, heads, residuals,
                        negative_slope=negative_slope)
        self.mesh = mesh
        self.axis = axis
        self.negative_slope = negative_slope

    @property
    def specs(self):
        return self.base.specs

    def init(self, key):
        return self.base.init(key)

    def _exchange(self, packed, axis):
        return jax.lax.all_gather(packed, axis, tiled=True)

    def _layer(self, lp, h, nbr, mask, axis, spec, last):
        f_in, f_out, heads, residual = spec
        ns = h.shape[0]
        z = (h @ lp["w"]).reshape(ns, heads, f_out)
        el = jnp.einsum("nhf,hf->nh", z, lp["attn_l"])
        er = jnp.einsum("nhf,hf->nh", z, lp["attn_r"])
        packed = jnp.concatenate([z.reshape(ns, heads * f_out), el], axis=-1)
        full = self._exchange(packed, axis)               # halo exchange
        el_src = full[:, heads * f_out:][nbr]             # [ns, D, heads]
        e = jax.nn.leaky_relu(el_src + er[:, None, :], self.negative_slope)
        e = jnp.where(mask[..., None] > 0, e, _NEG_LARGE)
        e = e - jax.lax.stop_gradient(jnp.max(e, axis=1, keepdims=True))
        w = jnp.exp(e) * mask[..., None]
        alpha = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-20)
        z_src = full[:, :heads * f_out][nbr].reshape(ns, -1, heads, f_out)
        out = jnp.einsum("ndh,ndhf->nhf", alpha, z_src)
        if residual:
            res = (h @ lp["w_res"] if "w_res" in lp else h).reshape(
                ns, heads, f_out)
            out = out + res
        out = out + lp["bias"].reshape(heads, f_out)
        if last:
            return jnp.mean(out, axis=1)                  # mean heads -> [ns, C]
        return jax.nn.elu(out).reshape(ns, heads * f_out)

    def apply(self, params, pg: PartitionedGraph) -> jax.Array:
        """-> logits [S, N_shard, C]."""
        axis = self.axis
        specs = self.base.specs
        n_layers = len(specs)

        def shard_fwd(params, feats, nbr, mask):
            h = feats[0]
            nbr_, mask_ = nbr[0], mask[0]
            for i, (lp, spec) in enumerate(zip(params, specs)):
                h = self._layer(lp, h, nbr_, mask_, axis, spec,
                                last=(i == n_layers - 1))
            return h[None]

        fwd = shard_map(
            shard_fwd,
            mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        return fwd(params, pg.feats, pg.nbr, pg.nbr_mask)

    def loss(self, params, pg: PartitionedGraph, class_weights) -> jax.Array:
        logits = self.apply(params, pg)
        return weighted_cross_entropy(logits, pg.labels, class_weights,
                                      pg.node_mask)


class HaloGATP2P(HaloGAT):
    """GAT with boundary-only halo exchange: the packed [z | el] boundary rows
    ppermute to ring neighbors (2*W rows/device/layer over ICI) instead of
    all-gathering the whole table. Requires a partition_graph_p2p graph."""

    def __init__(self, in_feats, layer_sizes, n_classes, heads, residuals,
                 mesh: Mesh, halo_width: int, axis: str = "data",
                 negative_slope: float = 0.2):
        super().__init__(in_feats, layer_sizes, n_classes, heads, residuals,
                         mesh, axis=axis, negative_slope=negative_slope)
        self.halo_width = halo_width

    def _exchange(self, packed, axis):
        return extend_halo(packed, axis, self.halo_width)


# ---------------------------------------------------------------------------
# ICI traffic accounting
# ---------------------------------------------------------------------------


def exchange_widths(model) -> list[int]:
    """Per-layer width (f32 lanes) of the halo-exchanged table.

    GraphSage exchanges the (projected) node features: the layer INPUT width
    (pool projects through the square w_pool first, same width). GAT exchanges
    the packed [z | el] block: heads*out + heads.
    """
    base = getattr(model, "base", model)
    if isinstance(base, GraphSage):
        return list(base.dims[:-1])
    if isinstance(base, GAT):
        return [fo * h + h for (_, fo, h, _) in base.specs]
    raise TypeError(f"unknown halo model {type(model)!r}")


def exchange_bytes_per_step(model, pg: PartitionedGraph, variant: str,
                            halo_width: int | None = None,
                            dtype_bytes: int = 4) -> dict:
    """Analytic ICI bytes moved per device per optimizer step (fwd + bwd).

    all_gather: each device receives the other S-1 shards of the exchanged
    table per layer (and the backward moves the mirrored cotangents:
    all_gather's transpose is reduce_scatter — same volume). ppermute: each
    device sends/receives 2*W boundary rows per layer, likewise doubled for
    the backward. Numbers are exact for ring implementations of these
    collectives (bytes crossing each device's ICI links).
    """
    widths = exchange_widths(model)
    s, n_shard = pg.n_parts, pg.shard_size
    if variant == "all_gather":
        rows = (s - 1) * n_shard
    elif variant == "p2p":
        assert halo_width is not None, "p2p accounting needs halo_width"
        rows = 2 * halo_width
    else:
        raise ValueError(variant)
    fwd = sum(w * rows * dtype_bytes for w in widths)
    return {
        "variant": variant,
        "n_parts": s,
        "shard_rows": n_shard,
        "rows_exchanged_per_layer": rows,
        "layer_widths": widths,
        "fwd_bytes_per_device": fwd,
        "step_bytes_per_device": 2 * fwd,   # + backward cotangent exchange
    }
