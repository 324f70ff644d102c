"""Graph attention (GAT) for TPU over the ELL graph container.

Re-implements the semantics of the reference's GAT stack (`model/networks.py:39-66`)
whose math lives in DGL's GATConv (`model/networks.py:6`):

  z_v      = W h_v                      (per-head projection, no bias)
  el_v     = a_l . z_v ; er_v = a_r . z_v
  e_{u->v} = LeakyReLU(el_u + er_v)     (negative_slope, default 0.2)
  alpha    = softmax over in-edges of v (DGL edge_softmax)
  out_v    = sum_u alpha_{u->v} z_u  (+ residual) (+ bias) (-> activation)

In the ELL layout the edge softmax is just a masked row softmax over the neighbor
slot axis — no SDDMM scatter needed, because GAT's attention logits decompose into
src + dst scalar terms that are computed densely per node and gathered per slot.
Hidden layers flatten the head axis; the output layer averages heads
(`model/networks.py:63-65`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.graph import GraphBatch
from .initializers import xavier_uniform

__all__ = ["gat_conv_init", "gat_conv_apply", "GAT"]

_NEG_LARGE = -1e30


def gat_conv_init(key, in_feats: int, out_feats: int, num_heads: int,
                  residual: bool) -> dict:
    keys = jax.random.split(key, 4)
    params = {
        "w": xavier_uniform(keys[0], (in_feats, num_heads * out_feats)),
        "attn_l": xavier_uniform(keys[1], (1, num_heads, out_feats)).reshape(num_heads, out_feats),
        "attn_r": xavier_uniform(keys[2], (1, num_heads, out_feats)).reshape(num_heads, out_feats),
        "bias": jnp.zeros((num_heads * out_feats,)),
    }
    if residual and in_feats != num_heads * out_feats:
        params["w_res"] = xavier_uniform(keys[3], (in_feats, num_heads * out_feats))
    return params


def _dropout(x, rate, rng):
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def gat_conv_apply(
    params: dict,
    graph: GraphBatch,
    h: jax.Array,
    num_heads: int,
    out_feats: int,
    residual: bool = False,
    activation=None,
    feat_drop: float = 0.0,
    attn_drop: float = 0.0,
    negative_slope: float = 0.2,
    rng=None,
    impl: str | None = None,
) -> jax.Array:
    """One GATConv layer. h: [B, N, F_in] -> [B, N, num_heads, out_feats].

    impl='pallas' (requires graph.tiled) fetches the src attention terms with
    the one-hot slot-gather kernel and computes the alpha-weighted combine as a
    weighted-histogram MXU SpMM (ops/pallas/weighted_sum.py) — no per-edge
    feature rows are ever materialized.
    """
    from ..ops.pallas.precision import compute_dtype

    cd = compute_dtype()
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    h = h.astype(cd)
    if cd != jnp.float32:
        # mixed precision (fast mode): bf16 activations, f32 master params
        # cast at use — grads reach the f32 params through the cast's VJP
        params = {k: v.astype(cd) for k, v in params.items()}
    h = _dropout(h, feat_drop, rngs[0])
    # residual comes from the DROPPED features, matching DGL GATConv
    # (h_src = h_dst = self.feat_drop(feat); resval = self.res_fc(h_dst))
    h_in = h
    B, N, _ = h.shape
    z = (h @ params["w"]).reshape(B, N, num_heads, out_feats)
    el = jnp.einsum("bnhf,hf->bnh", z, params["attn_l"])
    er = jnp.einsum("bnhf,hf->bnh", z, params["attn_r"])

    # small graphs: dense is already fast and Mosaic lowering is fragile at
    # tiny block shapes (observed compile failures at N=128/F=32 scales)
    from .sage import _pallas_min_nodes

    use_pallas = (impl == "pallas"
                  and graph.num_nodes_padded >= _pallas_min_nodes())
    if use_pallas:
        assert graph.tiled is not None, "impl='pallas' needs GraphBatch.with_tiled_aux()"
        if (attn_drop <= 0.0 or rngs[1] is None) and activation in (
                None, jax.nn.elu):
            # fused path: edge softmax + weighted combine + the layer epilogue
            # (residual + bias + ELU) in one kernel; attention dropout needs
            # materialized alpha, so it falls through to the decomposed path
            from ..ops.pallas.fused_gat import fused_gat_attention

            res = None
            if residual:
                res = (h_in @ params["w_res"] if "w_res" in params
                       else h_in)                       # [B, N, H*F]
            act = "elu" if activation is jax.nn.elu else None
            out = fused_gat_attention(z, el, er, graph.tiled, graph.nbr_mask,
                                      negative_slope, act, res,
                                      params["bias"])
            return out                                  # epilogue fused
        from ..ops.pallas.slot_gather import slot_gather

        el_src = slot_gather(el, graph.tiled, graph.nbr_mask)   # [B, N, D, H]
    else:
        gather = jax.vmap(lambda x, idx: x[idx])      # over B
        el_src = gather(el, graph.nbr)                # [B, N, D, H]
    e = jax.nn.leaky_relu(el_src + er[:, :, None, :], negative_slope)
    e = jnp.where(graph.nbr_mask[..., None] > 0, e, _NEG_LARGE)
    e = e - jax.lax.stop_gradient(jnp.max(e, axis=2, keepdims=True))
    w = jnp.exp(e) * graph.nbr_mask[..., None]
    denom = jnp.sum(w, axis=2, keepdims=True)
    alpha = w / jnp.maximum(denom, 1e-20)             # [B, N, D, H]
    alpha = _dropout(alpha, attn_drop, rngs[1])

    if use_pallas:
        from ..ops.pallas.weighted_sum import tiled_weighted_sum

        out = tiled_weighted_sum(z, alpha, graph.tiled, graph.nbr_mask)
    else:
        gather = jax.vmap(lambda x, idx: x[idx])
        z_src = gather(z.reshape(B, N, num_heads * out_feats), graph.nbr)
        z_src = z_src.reshape(B, N, -1, num_heads, out_feats)
        out = jnp.einsum("bndh,bndhf->bnhf", alpha, z_src)

    return _gat_epilogue(params, out, h_in, residual, num_heads, out_feats,
                         activation)


def _gat_epilogue(params, out, h_in, residual, num_heads, out_feats,
                  activation):
    B, N = out.shape[:2]
    if residual:
        if "w_res" in params:
            res = (h_in @ params["w_res"]).reshape(B, N, num_heads, out_feats)
        else:
            res = h_in.reshape(B, N, num_heads, out_feats)
        out = out + res
    out = out + params["bias"].reshape(num_heads, out_feats)
    if activation is not None:
        out = activation(out)
    return out


class GAT:
    """Input + hidden + output GATConv stack (`model/networks.py:39-66`).

    heads/residuals are per-layer lists; hidden layers flatten the head axis
    (so hidden in_dim = width * heads), the output layer has 1-class-width heads
    averaged (here: a single head, matching GATConv(..., 1) + mean at
    `model/networks.py:56-58,65`). ELU activation on all but the output layer;
    the input layer never has a residual.
    """

    def __init__(self, in_feats: int, layer_sizes: Sequence[int], n_classes: int,
                 heads: Sequence[int], residuals: Sequence[bool],
                 feat_drop: float = 0.0, attn_drop: float = 0.0,
                 negative_slope: float = 0.2):
        self.layer_sizes = list(layer_sizes)
        self.heads = list(heads)
        self.residuals = list(residuals)
        # Pallas dst-tile size: the attention kernels are VPU-pass-bound per
        # tile (softmax + histograms), so halving the tile doubles T and loses
        # — measured 47.4 (64) vs 45.4 ms (128) at flagship scale
        # (scripts/sweep_tiling.py methodology; table in BASELINE.md)
        self.preferred_tile = 128
        self.n_classes = n_classes
        self.feat_drop = feat_drop
        self.attn_drop = attn_drop
        self.negative_slope = negative_slope
        # (in_dim, out_dim, heads, residual) per layer
        self.specs = [(in_feats, layer_sizes[0], self.heads[0], False)]
        for i in range(1, len(layer_sizes)):
            self.specs.append(
                (layer_sizes[i - 1] * self.heads[i - 1], layer_sizes[i],
                 self.heads[i], bool(self.residuals[i]))
            )
        self.specs.append(
            (layer_sizes[-1] * self.heads[len(layer_sizes) - 1], n_classes, 1, False)
        )

    @property
    def num_layers(self) -> int:
        return len(self.specs)

    def init(self, key) -> list[dict]:
        keys = jax.random.split(key, self.num_layers)
        return [
            gat_conv_init(k, fi, fo, h, res)
            for k, (fi, fo, h, res) in zip(keys, self.specs)
        ]

    def apply(self, params, graph: GraphBatch, h=None, train: bool = False,
              rng=None, impl: str | None = None) -> jax.Array:
        if h is None:
            h = graph.feats
        n = self.num_layers
        rngs = [None] * n
        if train and rng is not None and (self.feat_drop > 0 or self.attn_drop > 0):
            rngs = list(jax.random.split(rng, n))
        for i, (lp, (fi, fo, heads, res)) in enumerate(zip(params, self.specs)):
            last = i == n - 1
            out = gat_conv_apply(
                lp, graph, h, heads, fo, residual=res,
                activation=None if last else jax.nn.elu,
                feat_drop=self.feat_drop if train else 0.0,
                attn_drop=self.attn_drop if train else 0.0,
                negative_slope=self.negative_slope,
                rng=rngs[i],
                impl=impl,
            )
            B, N = out.shape[:2]
            if last:
                h = jnp.mean(out, axis=2)             # mean over heads -> [B, N, C]
            else:
                h = out.reshape(B, N, heads * fo)     # flatten heads
        return h.astype(jnp.float32)                  # logits f32 for loss/metrics
