"""GraphSAGE for TPU: functional layers over the ELL graph container.

Re-implements the semantics of the reference's GraphSage stack
(`model/networks.py:20-36`), whose math lives inside DGL's SAGEConv
(imported at `model/networks.py:7`). Aggregator formulas (DGL >= 0.8):

  mean: out_v = W_self h_v + W_neigh mean_{u in N(v)} h_u
  gcn:  out_v = W_neigh (sum_{u in N(v)} h_u + h_v) / (deg_in(v) + 1)   [no W_self]
  pool: out_v = W_self h_v + W_neigh max_{u in N(v)} relu(W_pool h_u + b_pool)

followed by a bias and optional activation; feature dropout is applied to the layer
input (`feat_drop`). Nodes with no in-edges aggregate to zero. All ops are dense
batched matmuls (MXU) plus a masked neighbor gather-reduce (ops/aggregate.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.aggregate import aggregate_neighbors
from ..ops.graph import GraphBatch
from .initializers import xavier_uniform

__all__ = ["sage_conv_init", "sage_conv_apply", "GraphSage"]

AGGREGATORS = ("mean", "gcn", "pool")


def sage_conv_init(key, in_feats: int, out_feats: int, aggregator: str) -> dict:
    assert aggregator in AGGREGATORS, aggregator
    keys = jax.random.split(key, 4)
    params = {"bias": jnp.zeros((out_feats,))}
    params["w_neigh"] = xavier_uniform(keys[0], (in_feats, out_feats))
    if aggregator != "gcn":
        params["w_self"] = xavier_uniform(keys[1], (in_feats, out_feats))
    if aggregator == "pool":
        params["w_pool"] = xavier_uniform(keys[2], (in_feats, in_feats))
        params["b_pool"] = jnp.zeros((in_feats,))
    return params


def _dropout(h, rate, rng):
    if rate <= 0.0 or rng is None:
        return h
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, h.shape)
    return jnp.where(mask, h / keep, 0.0)


def sage_conv_apply(
    params: dict,
    graph: GraphBatch,
    h: jax.Array,
    aggregator: str,
    activation=None,
    feat_drop: float = 0.0,
    rng=None,
    impl: str | None = None,
) -> jax.Array:
    """One SAGEConv layer. h: [B, N, F_in] -> [B, N, F_out].

    Under precision mode 'fast' the layer runs in bf16 (mixed precision):
    activations and the per-use parameter casts are bf16, grads flow back to
    the f32 master params through the cast's VJP."""
    from ..ops.pallas.precision import compute_dtype

    cd = compute_dtype()
    h = _dropout(h, feat_drop, rng).astype(cd)
    if cd != jnp.float32:
        params = {k: v.astype(cd) for k, v in params.items()}
    if impl == "pallas" and graph.num_nodes_padded < _pallas_min_nodes():
        # small graphs: the dense XLA path is already fast, and Mosaic lowering
        # is fragile at tiny block shapes — not worth a kernel compile
        impl = "dense"
    agg = functools.partial(
        aggregate_neighbors, nbr=graph.nbr, nbr_mask=graph.nbr_mask,
        impl=impl, tiled=graph.tiled,
    )
    # weighted graphs (GraphBatch.edge_weight): mean becomes a weighted
    # average, gcn's sum and degree become weighted; pool's max is unweighted
    # by construction (ops/aggregate.py)
    ew = graph.edge_weight
    if aggregator == "mean":
        h_n = agg(h, op="mean", edge_weight=ew)
        out = h @ params["w_self"] + h_n @ params["w_neigh"]
    elif aggregator == "gcn":
        s = agg(h, op="sum", edge_weight=ew)
        w_mask = graph.nbr_mask if ew is None else graph.nbr_mask * ew
        deg = jnp.sum(w_mask, axis=-1, keepdims=True)  # [B, N, 1]
        h_n = (s + h) / (deg + 1.0).astype(s.dtype)
        out = h_n @ params["w_neigh"]
    elif aggregator == "pool":
        p = jax.nn.relu(h @ params["w_pool"] + params["b_pool"])
        mx = agg(p, op="max")
        out = h @ params["w_self"] + mx @ params["w_neigh"]
    else:
        raise ValueError(f"unknown aggregator {aggregator!r}")
    out = out + params["bias"]
    if activation is not None:
        out = activation(out)
    return out


class GraphSage:
    """Input + hidden + output SAGEConv stack (`model/networks.py:20-36`):

    layer_sizes gives the widths of the input layer output and hidden layers; one
    extra output layer maps to n_classes. ReLU + feature dropout on all layers
    except the last (no activation / no dropout there).
    """

    def __init__(
        self,
        in_feats: int,
        layer_sizes: Sequence[int],
        n_classes: int,
        aggregator: str,
        dropout: float = 0.0,
    ):
        assert aggregator in AGGREGATORS, aggregator
        self.aggregator = aggregator
        self.dropout = float(dropout)
        self.dims = [in_feats, *layer_sizes, n_classes]
        # Pallas dst-tile size: the aggregation kernels are MXU-bound on the
        # one-hot dots (work ∝ N·U), so the smaller unique budget of 64-tiles
        # beats their extra gather rows — measured 16.2 vs 17.9 ms/step at
        # flagship scale (scripts/sweep_tiling.py, table in BASELINE.md)
        self.preferred_tile = 64

    @property
    def num_layers(self) -> int:
        return len(self.dims) - 1

    def init(self, key) -> list[dict]:
        keys = jax.random.split(key, self.num_layers)
        return [
            sage_conv_init(k, self.dims[i], self.dims[i + 1], self.aggregator)
            for i, k in enumerate(keys)
        ]

    def apply(self, params, graph: GraphBatch, h=None, train: bool = False,
              rng=None, impl: str | None = None,
              scan_middle: bool = False) -> jax.Array:
        """Forward pass -> logits [B, N, n_classes].

        scan_middle=True rolls the identically-shaped hidden layers into one
        lax.scan over stacked parameters — the compiled program contains ONE
        hidden-layer body instead of num_layers copies, cutting XLA compile time
        for deep stacks (the 7-layer flagship) with identical numerics.
        """
        if h is None:
            h = graph.feats
        n = self.num_layers
        rngs = [None] * n
        use_dropout = train and self.dropout > 0.0 and rng is not None
        if use_dropout:
            rngs = list(jax.random.split(rng, n))

        mid = self.dims[1:-1]
        can_scan = (scan_middle and n >= 4
                    and all(w == mid[0] for w in mid))
        if not can_scan:
            for i, lp in enumerate(params):
                last = i == n - 1
                h = sage_conv_apply(
                    lp, graph, h, self.aggregator,
                    activation=None if last else jax.nn.relu,
                    feat_drop=0.0 if (last or not train) else self.dropout,
                    rng=None if last else rngs[i],
                    impl=impl,
                )
            return h.astype(jnp.float32)      # logits f32 for loss/metrics

        h = sage_conv_apply(params[0], graph, h, self.aggregator,
                            activation=jax.nn.relu,
                            feat_drop=self.dropout if train else 0.0,
                            rng=rngs[0], impl=impl)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params[1:-1])
        mid_rngs = (jnp.stack(rngs[1:n - 1]) if use_dropout
                    else jnp.zeros((n - 2, 2), jnp.uint32))

        def body(carry, xs):
            lp, r = xs
            out = sage_conv_apply(
                lp, graph, carry, self.aggregator, activation=jax.nn.relu,
                feat_drop=self.dropout if use_dropout else 0.0,
                rng=r if use_dropout else None, impl=impl,
            )
            return out, None

        h, _ = jax.lax.scan(body, h, (stacked, mid_rngs))
        return sage_conv_apply(params[-1], graph, h, self.aggregator,
                               activation=None, feat_drop=0.0, rng=None,
                               impl=impl).astype(jnp.float32)


def _pallas_min_nodes() -> int:
    """Node-count threshold below which impl='pallas' falls back to dense
    (override with GTS_PALLAS_MIN_NODES; tests set 0 to force kernels)."""
    import os

    return int(os.environ.get("GTS_PALLAS_MIN_NODES", "1024"))
