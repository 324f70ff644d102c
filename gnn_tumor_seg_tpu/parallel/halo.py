"""Node-partitioned execution of one giant graph across a device mesh.

This is the graph-world analog of sequence parallelism (SURVEY §5.7): when a
batched supervoxel graph is too big for one chip, its *nodes* are partitioned
contiguously across devices; each device owns its nodes' features, computes
their layer outputs, and fetches neighbor features from peer devices over ICI.

Since round 5 the partitioned regime runs the SAME layer implementation as the
single-chip models (`models/sage.py:sage_conv_apply`,
`models/gat.py:gat_conv_apply`) — including the Pallas one-hot-MXU aggregation
kernels, mixed-precision fast mode, feature/attention dropout and weighted
edges — instead of a second dense-XLA derivation of the layer math. The trick
is the *extended-buffer* graph layout:

  p2p (`HaloGraphSageP2P` / `HaloGATP2P`, the performance path)
      Each shard's neighbor table lives in the extended-local index space
      [ W halo rows from shard s-1 | own `shard` rows | W from s+1 | pad ].
      Per layer, each device ppermutes only its 2*W boundary rows to its ring
      neighbors (ICI), concatenates them around its own rows, and calls the
      single-chip conv on the result; own-row outputs are bit-identical to
      single-device execution and the halo-row outputs are sliced away.
      Halo ROWS of the table carry the halo node's neighbor list RESTRICTED
      to this shard's own rows — that keeps the per-shard table symmetric
      (every listed edge has its reverse listed), which is exactly the
      precondition of the scatter-free custom VJPs (`ops/aggregate.py`) and
      the Pallas kernels' backward (`ops/pallas/gather_agg.py`): the local
      gradient w.r.t. a halo row is a gather-reduce over the same table, and
      the ppermute transpose ships it back to the home shard.
      Requires 1-shard edge locality (contiguous partitions of spatially
      ordered supervoxel graphs; `partition_graph_p2p` raises otherwise).

  all_gather (`HaloGraphSage` / `HaloGAT`, the correctness/any-structure
      fallback)
      The neighbor table is the plain full-graph square table, replicated;
      inputs are sharded, all_gathered ONCE, and the unmodified single-chip
      model stack runs on the full table on every device, each keeping its
      own logits slice (the all_gather transpose reduce-scatters the
      cotangents). Compute is replicated — this variant trades FLOPs for
      generality and is NOT the scaling path; it exists so arbitrary edge
      structure still trains correctly, with maximal code reuse.

The parameter pytrees are shared with models/sage.py:GraphSage /
models/gat.py:GAT, so the same checkpoint runs single-chip or partitioned.
Reference layer semantics being preserved: `model/networks.py:20-66`.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.gat import GAT, gat_conv_apply
from ..models.sage import GraphSage, sage_conv_apply
from ..ops.graph import GraphBatch
from ..train.losses import weighted_cross_entropy

__all__ = ["PartitionedGraph", "partition_graph", "HaloGraphSage",
           "partition_graph_p2p", "HaloGraphSageP2P",
           "HaloGAT", "HaloGATP2P", "extend_halo", "exchange_bytes_per_step"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """One giant graph, nodes split contiguously into n_parts shards.

    Own-node arrays (feats/node_mask/labels) carry a leading shard axis
    [S, shard, ...]. The neighbor table's index space depends on the variant:

      p2p:        nbr/nbr_mask/edge_weight are [S, N_ext, D] in each shard's
                  extended-local space (W | shard | W | pad); `tiled` (when
                  built) stacks per-shard Pallas aux with the same leading S.
      all_gather: nbr/nbr_mask/edge_weight are the [N_tot, D] full-graph
                  table in padded-global ids, replicated (no S axis); `tiled`
                  is B=1 aux over that table.
    """

    nbr: jax.Array        # int32 [S, N_ext, D] (p2p) | [N_tot, D] (all_gather)
    nbr_mask: jax.Array   # f32, same shape as nbr
    node_mask: jax.Array  # f32   [S, shard]
    feats: jax.Array      # f32   [S, shard, F]
    labels: jax.Array | None  # int32 [S, shard]
    edge_weight: jax.Array | None = None  # f32, same shape as nbr
    tiled: object | None = None           # ops.pallas.tiling.TiledAux

    @property
    def n_parts(self) -> int:
        return self.feats.shape[0]

    @property
    def shard_size(self) -> int:
        return self.feats.shape[1]

    @property
    def table_rows(self) -> int:
        """Rows of the per-device neighbor table (N_ext or N_tot)."""
        return self.nbr.shape[-2]


def _align(x: int, q: int) -> int:
    return -(-x // q) * q


def _slot_fill(tab_rows: np.ndarray, rows: np.ndarray, vals: np.ndarray,
               n_rows_per_tab: int, n_tabs: int, d_pad: int,
               weights: np.ndarray | None = None):
    """Scatter (table, row, value[, weight]) edge entries into padded ELL
    tables [n_tabs, n_rows_per_tab, d_pad], assigning slots in stable edge
    order per destination row."""
    key = tab_rows.astype(np.int64) * n_rows_per_tab + rows
    order = np.argsort(key, kind="stable")
    ks = key[order]
    nbr = np.zeros((n_tabs * n_rows_per_tab, d_pad), np.int32)
    mask = np.zeros((n_tabs * n_rows_per_tab, d_pad), np.float32)
    w_tab = None
    if len(ks):
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        sizes = np.diff(np.r_[starts, len(ks)])
        if sizes.max() > d_pad:
            raise ValueError(
                f"max degree {int(sizes.max())} exceeds degree padding {d_pad}")
        slot = np.arange(len(ks)) - np.repeat(starts, sizes)
        nbr[ks, slot] = vals[order]
        mask[ks, slot] = 1.0
        if weights is not None:
            w_tab = np.zeros((n_tabs * n_rows_per_tab, d_pad), np.float32)
            w_tab[ks, slot] = np.asarray(weights, np.float32)[order]
            w_tab = w_tab.reshape(n_tabs, n_rows_per_tab, d_pad)
    elif weights is not None:
        w_tab = np.zeros((n_tabs, n_rows_per_tab, d_pad), np.float32)
    return (nbr.reshape(n_tabs, n_rows_per_tab, d_pad),
            mask.reshape(n_tabs, n_rows_per_tab, d_pad), w_tab)


def _own_arrays(feats, labels, n_parts, per, shard):
    """[S, shard, ...] own-node feats/node_mask/labels from union arrays."""
    n, f_dim = feats.shape
    total = n_parts * shard
    idx = np.arange(n)
    pos = (idx // per) * shard + (idx % per)
    feats_p = np.zeros((total, f_dim), np.float32)
    feats_p[pos] = feats
    node_mask = np.zeros((total,), np.float32)
    node_mask[pos] = 1.0
    labels_p = None
    if labels is not None:
        lp = np.full((total,), -1, np.int32)
        lp[pos] = labels
        labels_p = jnp.asarray(lp.reshape(n_parts, shard))
    return (jnp.asarray(feats_p.reshape(n_parts, shard, f_dim)),
            jnp.asarray(node_mask.reshape(n_parts, shard)), labels_p)


def _build_aux(nbr: np.ndarray, mask: np.ndarray, tile: int | None):
    from ..ops.pallas.tiling import TILE_N, build_tiled_aux

    return build_tiled_aux(nbr, mask, tile=tile or TILE_N)


def partition_graph(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
                    labels: np.ndarray | None, n_parts: int,
                    shard_pad_to: int | None = None,
                    d_pad_to: int | None = None,
                    edge_weights: np.ndarray | None = None,
                    tiled: bool = False,
                    tile: int | None = None) -> PartitionedGraph:
    """Host-side partition for the all_gather (replicated-table) variant.

    Own arrays shard contiguously; the neighbor table is the full-graph square
    ELL table in padded-global ids (node i -> (i // per) * shard + i % per),
    identical on every device. Works for ANY edge structure.
    shard_pad_to / d_pad_to pin shapes across a sequence of partitioned
    batches so every batch hits the same compiled step; tiled=True attaches
    the Pallas aux (requires the padded total to divide the tile, which the
    16-aligned shard gives for power-of-two meshes >= 8).
    """
    n = feats.shape[0]
    per = -(-n // n_parts)
    shard = _align(per, 16)
    if shard_pad_to is not None:
        shard = max(shard, _align(shard_pad_to, 16))
    total = shard * n_parts

    deg = np.bincount(dst, minlength=n)
    d_pad = _align(max(int(deg.max(initial=0)), 1), 8)
    if d_pad_to is not None:
        d_pad = max(d_pad, d_pad_to)

    to_padded = lambda i: (i // per) * shard + (i % per)
    nbr, mask, w_tab = _slot_fill(
        np.zeros(len(dst), np.int64), to_padded(dst.astype(np.int64)),
        to_padded(src.astype(np.int64)).astype(np.int32),
        total, 1, d_pad, weights=edge_weights)
    nbr, mask = nbr[0], mask[0]
    aux = None
    if tiled:
        t = tile or 128
        if total % t == 0:
            aux = _build_aux(nbr[None], mask[None], t)
    feats_p, node_mask, labels_p = _own_arrays(feats, labels, n_parts, per,
                                               shard)
    return PartitionedGraph(
        nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(mask),
        node_mask=node_mask, feats=feats_p, labels=labels_p,
        edge_weight=None if w_tab is None else jnp.asarray(w_tab[0]),
        tiled=aux,
    )


# ---------------------------------------------------------------------------
# Boundary-only (ppermute) halo partition
# ---------------------------------------------------------------------------


def partition_graph_p2p(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
                        labels: np.ndarray | None, n_parts: int,
                        shard_pad_to: int | None = None,
                        d_pad_to: int | None = None,
                        halo_pad_to: int | None = None,
                        edge_weights: np.ndarray | None = None,
                        tiled: bool = False,
                        tile: int | None = None):
    """Contiguous node partition with *boundary-only* halo metadata.

    Requires 1-shard locality: every edge connects nodes in the same or an
    adjacent shard (true for spatially ordered supervoxel graphs partitioned
    contiguously; raises ValueError otherwise — fall back to partition_graph's
    all_gather exchange). Returns (PartitionedGraph, halo_width W).

    Per-shard table layout (extended-local index space, N_ext rows):
        [ last W rows of shard s-1 | own `shard` rows | first W rows of s+1
          | zero pad to a 128 multiple ]
    Own rows carry their full neighbor lists; halo rows carry their lists
    RESTRICTED to this shard's own rows, keeping the table symmetric (see
    module docstring) so the single-chip scatter-free VJPs and Pallas kernels
    run unchanged inside shard_map. Only 2*W boundary rows cross ICI per
    layer instead of the whole table.
    """
    n = feats.shape[0]
    per = -(-n // n_parts)
    shard = _align(per, 16)
    if shard_pad_to is not None:
        shard = max(shard, _align(shard_pad_to, 16))

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    shard_of = lambda i: i // per
    off_of = lambda i: i % per

    s_u, s_v = shard_of(src), shard_of(dst)
    jump = np.abs(s_u - s_v)
    if jump.max(initial=0) > 1:
        raise ValueError(
            "edges span non-adjacent shards; use partition_graph (all_gather)"
        )
    # halo width: deepest reach into a neighboring shard, from either side
    from_left = s_u == s_v - 1   # src one shard to the LEFT of dst
    from_right = s_u == s_v + 1  # src one shard to the RIGHT of dst
    need = 8
    if from_left.any():
        # left src at padded pos off must land in the exchanged LAST W rows
        need = max(need, int((shard - off_of(src[from_left])).max()))
    if from_right.any():
        need = max(need, int((off_of(src[from_right]) + 1).max()))
    W = _align(need, 8)
    if halo_pad_to is not None:
        W = max(W, _align(halo_pad_to, 8))
    if W > shard:
        raise ValueError("halo wider than a shard; use partition_graph")
    n_ext = _align(2 * W + shard, 128)

    deg = np.bincount(dst, minlength=n)
    d_pad = _align(max(int(deg.max(initial=0)), 1), 8)
    if d_pad_to is not None:
        d_pad = max(d_pad, d_pad_to)

    # extended-local index of a node, seen from table shard s_tab
    def to_local(s_tab, ids):
        s_i, o = shard_of(ids), off_of(ids)
        same = W + o
        right = W + shard + o            # node owned by s_tab + 1
        left = W - (shard - o)           # node owned by s_tab - 1
        return np.where(s_i == s_tab, same,
                        np.where(s_i == s_tab + 1, right, left))

    # own rows: every edge lands in its dst's shard table
    tabs = [s_v]
    rows = [W + off_of(dst)]
    vals = [to_local(s_v, src)]
    wts = [edge_weights] if edge_weights is not None else None
    # halo rows: a cross edge (src own in s_tab, dst in s_tab +- 1) is ALSO
    # listed at dst's halo row of the SRC's shard table (the restricted
    # reverse list that keeps the table symmetric)
    cross = jump == 1
    if cross.any():
        cs, cd = src[cross], dst[cross]
        s_tab = shard_of(cs)
        rows_h = np.where(shard_of(cd) == s_tab - 1,
                          off_of(cd) - (shard - W),        # dst in left nbr
                          W + shard + off_of(cd))          # dst in right nbr
        if (rows_h < 0).any() or (rows_h >= 2 * W + shard).any():
            # W was derived from src offsets; a dst offset outside the halo
            # means the reverse edge is missing from the input list
            raise ValueError(
                "p2p partitioning requires a symmetric (undirected, both-"
                "direction) edge list")
        tabs.append(s_tab)
        rows.append(rows_h)
        vals.append(W + off_of(cs))
        if wts is not None:
            wts.append(np.asarray(edge_weights)[cross])
    tabs = np.concatenate(tabs)
    rows = np.concatenate(rows)
    vals = np.concatenate(vals).astype(np.int32)
    w_all = np.concatenate(wts) if wts is not None else None
    nbr, mask, w_tab = _slot_fill(tabs, rows, vals, n_ext, n_parts, d_pad,
                                  weights=w_all)

    aux = _build_aux(nbr, mask, tile) if tiled else None
    feats_p, node_mask, labels_p = _own_arrays(feats, labels, n_parts, per,
                                               shard)
    pg = PartitionedGraph(
        nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(mask),
        node_mask=node_mask, feats=feats_p, labels=labels_p,
        edge_weight=None if w_tab is None else jnp.asarray(w_tab),
        tiled=aux,
    )
    return pg, W


def extend_halo(h, axis: str, W: int, pad_tail: int = 0):
    """[shard, F] -> [W + shard + W (+ pad_tail), F] via two ring ppermutes:
    receive the left neighbor's LAST W rows and the right neighbor's FIRST W
    rows (plus a zero tail to the table's 128-aligned row count)."""
    n_dev = jax.lax.axis_size(axis)
    from_left = jax.lax.ppermute(
        h[-W:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    from_right = jax.lax.ppermute(
        h[:W], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    parts = [from_left, h, from_right]
    if pad_tail:
        parts.append(jnp.zeros((pad_tail, h.shape[1]), h.dtype))
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Unified halo models: thin exchange-and-slice wrappers around the
# single-chip conv implementations
# ---------------------------------------------------------------------------


def _dummy_batch(nbr, nbr_mask, edge_weight, tiled) -> GraphBatch:
    """B=1 GraphBatch view over a per-device table block inside shard_map.
    feats/node_mask/n_nodes are unused by the conv functions (h is passed
    explicitly) — zero-size/constant placeholders keep the container honest."""
    n = nbr.shape[-2]
    return GraphBatch(
        nbr=nbr, nbr_mask=nbr_mask,
        node_mask=jnp.zeros((1, n), jnp.float32),
        feats=jnp.zeros((1, n, 1), jnp.float32),
        labels=None,
        n_nodes=jnp.zeros((1,), jnp.int32),
        edge_weight=edge_weight,
        tiled=tiled,
    )


class _HaloBase:
    """Shared init/loss plumbing; `base` is the single-chip model whose
    parameter pytree (and therefore checkpoints) the halo model shares."""

    def init(self, key):
        return self.base.init(key)

    def loss(self, params, pg: PartitionedGraph, class_weights,
             train: bool = False, rng=None, impl: str | None = None):
        logits = self.apply(params, pg, train=train, rng=rng, impl=impl)
        return weighted_cross_entropy(logits, pg.labels, class_weights,
                                      pg.node_mask)

    # ---------------------------------------------------- shard_map plumbing
    def _run(self, shard_fwd, params, pg: PartitionedGraph, rng,
             table_spec: P):
        """Common shard_map invocation: own arrays split over the mesh axis,
        the neighbor table either split (p2p) or replicated (all_gather)."""
        axis = self.axis
        args = [params, pg.feats, pg.nbr, pg.nbr_mask, pg.edge_weight,
                pg.tiled, rng]
        specs = [P(), P(axis), table_spec, table_spec,
                 None if pg.edge_weight is None else table_spec,
                 None if pg.tiled is None else table_spec,
                 None if rng is None else P()]
        keep = [i for i, s in enumerate(specs) if s is not None]
        fwd = shard_map(
            lambda *a: shard_fwd(*a),
            mesh=self.mesh,
            in_specs=tuple(specs[i] for i in keep),
            out_specs=P(axis),
            # pallas_call inside the body does not annotate varying mesh axes
            # (vma) on its out_shape, which the default check rejects
            check_vma=False,
        )
        return fwd(*(args[i] for i in keep))


class _HaloP2P(_HaloBase):
    """Boundary-only exchange: per layer, ppermute 2*W rows, run the
    single-chip conv over the extended buffer, keep own rows."""

    def apply(self, params, pg: PartitionedGraph, train: bool = False,
              rng=None, impl: str | None = None) -> jax.Array:
        """-> logits [S, shard, C] (own rows)."""
        axis, W = self.axis, self.halo_width
        shard = pg.shard_size
        pad_tail = pg.table_rows - (shard + 2 * W)
        assert pad_tail >= 0, (pg.table_rows, shard, W)
        from ..ops.pallas.precision import compute_dtype

        use_rng = train and rng is not None and self._needs_rng()

        def shard_fwd(params, feats, nbr, mask, *rest):
            rest = list(rest)
            ew = rest.pop(0) if pg.edge_weight is not None else None
            tiled = rest.pop(0) if pg.tiled is not None else None
            key = rest.pop(0) if use_rng else None
            if key is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            g = _dummy_batch(nbr, mask, ew, tiled)
            h = feats[0]
            cd = compute_dtype()
            n_layers = self._num_layers()
            for i in range(n_layers):
                key, sub = (jax.random.split(key) if key is not None
                            else (None, None))
                h = self._pre_exchange(params[i], h, i, sub, train)
                # cast before the exchange: fast mode moves bf16 over ICI
                ext = extend_halo(h.astype(cd), axis, W, pad_tail)
                out = self._conv(params[i], g, ext[None], i, sub, train,
                                 impl)[0]
                h = out[W:W + shard]
            return h.astype(jnp.float32)[None]

        table_spec = P(axis)
        return self._run(shard_fwd,
                         params, pg,
                         rng if use_rng else None, table_spec)


class _HaloAllGather(_HaloBase):
    """Replicated-table fallback: all_gather the sharded inputs once, run the
    unmodified single-chip model on the full table on every device, and keep
    the own logits slice (the all_gather transpose reduce-scatters the
    cotangents). Compute is replicated across the axis — a correctness/
    any-edge-structure fallback, not the scaling path (use p2p for that)."""

    def apply(self, params, pg: PartitionedGraph, train: bool = False,
              rng=None, impl: str | None = None) -> jax.Array:
        """-> logits [S, shard, C] (own rows)."""
        axis = self.axis
        shard = pg.shard_size
        use_rng = train and rng is not None and self._needs_rng()

        def shard_fwd(params, feats, nbr, mask, *rest):
            rest = list(rest)
            ew = rest.pop(0) if pg.edge_weight is not None else None
            tiled = rest.pop(0) if pg.tiled is not None else None
            key = rest.pop(0) if use_rng else None  # replicated: same mask on
            #                                         every device, so the
            #                                         full-table forwards agree
            h_full = jax.lax.all_gather(feats[0], axis, tiled=True)
            n_tot = nbr.shape[0]
            g = GraphBatch(
                nbr=nbr[None], nbr_mask=mask[None],
                node_mask=jnp.zeros((1, n_tot), jnp.float32),
                feats=h_full[None], labels=None,
                n_nodes=jnp.zeros((1,), jnp.int32),
                edge_weight=None if ew is None else ew[None],
                tiled=tiled,
            )
            logits = self.base.apply(params, g, train=train, rng=key,
                                     impl=impl)        # [1, N_tot, C]
            start = jax.lax.axis_index(axis) * shard
            own = jax.lax.dynamic_slice_in_dim(logits[0], start, shard, 0)
            return own[None]

        return self._run(shard_fwd, params, pg,
                         rng if use_rng else None, P())


# ------------------------------------------------------------------- SAGE


class _SageMixin:
    def _num_layers(self) -> int:
        return self.base.num_layers

    def _needs_rng(self) -> bool:
        return self.base.dropout > 0.0

    def _pre_exchange(self, lp, h, i, sub, train):
        # feature dropout on all but the last layer, applied at the node's
        # HOME shard before the exchange so every copy of a node sees the
        # same mask (`model/networks.py:25-30`; models/sage.py applies it to
        # the conv input — same math)
        if train and sub is not None and i < self._num_layers() - 1:
            from ..models.sage import _dropout

            h = _dropout(h, self.base.dropout, sub)
        return h

    def _conv(self, lp, g, h, i, sub, train, impl):
        last = i == self._num_layers() - 1
        return sage_conv_apply(
            lp, g, h, self.aggregator,
            activation=None if last else jax.nn.relu,
            feat_drop=0.0,            # applied pre-exchange
            impl=impl,
        )


class HaloGraphSage(_SageMixin, _HaloAllGather):
    """GraphSage over a partition_graph PartitionedGraph (all_gather
    fallback). Same constructor/params as models.sage.GraphSage."""

    def __init__(self, in_feats, layer_sizes, n_classes, aggregator,
                 mesh: Mesh, axis: str = "data", dropout: float = 0.0):
        self.base = GraphSage(in_feats, layer_sizes, n_classes, aggregator,
                              dropout=dropout)
        self.aggregator = aggregator
        self.mesh = mesh
        self.axis = axis


class HaloGraphSageP2P(_SageMixin, _HaloP2P):
    """GraphSage over a partition_graph_p2p graph: per layer, each device
    exchanges only its 2*W boundary rows with its ring neighbors via ppermute
    (ICI) and runs the single-chip conv (Pallas kernels included) on the
    extended buffer. Numerics are identical to single-device execution
    (tested, incl. gradients and dropout)."""

    def __init__(self, in_feats, layer_sizes, n_classes, aggregator,
                 mesh: Mesh, halo_width: int, axis: str = "data",
                 dropout: float = 0.0):
        self.base = GraphSage(in_feats, layer_sizes, n_classes, aggregator,
                              dropout=dropout)
        self.aggregator = aggregator
        self.mesh = mesh
        self.axis = axis
        self.halo_width = halo_width


# -------------------------------------------------------------------- GAT


class _GATMixin:
    def _num_layers(self) -> int:
        return len(self.base.specs)

    def _needs_rng(self) -> bool:
        return self.base.feat_drop > 0.0 or self.base.attn_drop > 0.0

    def _pre_exchange(self, lp, h, i, sub, train):
        # DGL applies feat_drop on EVERY layer (incl. the output layer); the
        # residual uses the dropped features too (models/gat.py), so dropping
        # at the home shard before the exchange reproduces single-chip math
        if train and sub is not None and self.base.feat_drop > 0.0:
            from ..models.gat import _dropout

            h = _dropout(h, self.base.feat_drop, sub)
        return h

    def _conv(self, lp, g, h, i, sub, train, impl):
        specs = self.base.specs
        fi, fo, heads, res = specs[i]
        last = i == len(specs) - 1
        out = gat_conv_apply(
            lp, g, h, heads, fo, residual=res,
            activation=None if last else jax.nn.elu,
            feat_drop=0.0,            # applied pre-exchange
            attn_drop=self.base.attn_drop if train else 0.0,
            negative_slope=self.base.negative_slope,
            rng=sub,                  # per-shard key; only the attn split is
            #                           consumed (feat_drop=0), and attention
            #                           rows are dst-local so shard-local
            #                           masks match single-chip semantics
            impl=impl,
        )
        B, N = out.shape[:2]
        if last:
            return jnp.mean(out, axis=2)          # mean heads -> [1, N, C]
        return out.reshape(B, N, heads * fo)      # flatten heads


class HaloGAT(_GATMixin, _HaloAllGather):
    """GAT over a partition_graph PartitionedGraph (all_gather fallback).
    Parameter pytrees are shared with models.gat.GAT, so checkpoints run
    single-chip or partitioned. Reference: `model/networks.py:39-66`."""

    def __init__(self, in_feats, layer_sizes, n_classes, heads, residuals,
                 mesh: Mesh, axis: str = "data", negative_slope: float = 0.2,
                 feat_drop: float = 0.0, attn_drop: float = 0.0):
        self.base = GAT(in_feats, layer_sizes, n_classes, heads, residuals,
                        feat_drop=feat_drop, attn_drop=attn_drop,
                        negative_slope=negative_slope)
        self.mesh = mesh
        self.axis = axis
        self.negative_slope = negative_slope

    @property
    def specs(self):
        return self.base.specs


class HaloGATP2P(_GATMixin, _HaloP2P):
    """GAT with boundary-only halo exchange: the (dropped) layer-input rows
    ppermute to ring neighbors (2*W rows/device/layer over ICI) and the
    single-chip gat_conv (fused Pallas attention included) runs on the
    extended buffer. Requires a partition_graph_p2p graph."""

    def __init__(self, in_feats, layer_sizes, n_classes, heads, residuals,
                 mesh: Mesh, halo_width: int, axis: str = "data",
                 negative_slope: float = 0.2,
                 feat_drop: float = 0.0, attn_drop: float = 0.0):
        self.base = GAT(in_feats, layer_sizes, n_classes, heads, residuals,
                        feat_drop=feat_drop, attn_drop=attn_drop,
                        negative_slope=negative_slope)
        self.mesh = mesh
        self.axis = axis
        self.negative_slope = negative_slope
        self.halo_width = halo_width

    @property
    def specs(self):
        return self.base.specs


# ---------------------------------------------------------------------------
# ICI traffic accounting
# ---------------------------------------------------------------------------


def exchange_widths(model) -> list[int]:
    """Per-layer width (lanes) of the halo-exchanged rows: the p2p variant
    exchanges each layer's (dropped, compute-dtype) INPUT rows, so widths are
    the layer input widths for both SAGE and GAT."""
    base = getattr(model, "base", model)
    if isinstance(base, GraphSage):
        return list(base.dims[:-1])
    if isinstance(base, GAT):
        return [fi for (fi, _, _, _) in base.specs]
    raise TypeError(f"unknown halo model {type(model)!r}")


def exchange_bytes_per_step(model, pg: PartitionedGraph, variant: str,
                            halo_width: int | None = None,
                            dtype_bytes: int = 4) -> dict:
    """Analytic ICI bytes moved per device per optimizer step (fwd + bwd).

    all_gather: ONE exchange of the raw input features — each device receives
    the other S-1 shards and then runs the model replicated; the backward
    reduce-scatters the mirrored cotangents (same volume). p2p: each device
    sends/receives 2*W boundary rows per layer, likewise doubled for the
    backward. Numbers are exact for ring implementations of these collectives
    (bytes crossing each device's ICI links). dtype_bytes=2 reflects
    fast-mode bf16 exchanges (p2p casts before the ppermute)."""
    widths = exchange_widths(model)
    s, n_shard = pg.n_parts, pg.shard_size
    if variant == "all_gather":
        widths = widths[:1]           # input features, exchanged once
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
