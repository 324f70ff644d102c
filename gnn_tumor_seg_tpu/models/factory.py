"""Model factory — mirrors init_graph_net (`model/networks.py:68-81`).

Model types: GSpool / GSgcn / GSmean (GraphSAGE with pool/gcn/mean aggregator)
and GAT (heads + residuals from hyperparameters).
"""

from __future__ import annotations

from .sage import GraphSage
from .gat import GAT

__all__ = ["init_graph_net", "GRAPH_MODEL_TYPES"]

GRAPH_MODEL_TYPES = ("GSpool", "GSgcn", "GSmean", "GAT")

_SAGE_AGG = {"GSpool": "pool", "GSgcn": "gcn", "GSmean": "mean"}


def init_graph_net(model_type: str, hp):
    """hp needs: in_feats, out_classes, layer_sizes (+ feature_dropout for GS*,
    gat_heads/gat_residuals for GAT). Returns an uninitialized model object with
    .init(key) -> params and .apply(params, graph, ...)."""
    dropout = getattr(hp, "feature_dropout", 0) or 0
    if model_type in _SAGE_AGG:
        return GraphSage(
            in_feats=hp.in_feats,
            layer_sizes=hp.layer_sizes,
            n_classes=hp.out_classes,
            aggregator=_SAGE_AGG[model_type],
            dropout=dropout,
        )
    if model_type == "GAT":
        return GAT(
            in_feats=hp.in_feats,
            layer_sizes=hp.layer_sizes,
            n_classes=hp.out_classes,
            heads=hp.gat_heads,
            residuals=hp.gat_residuals,
            feat_drop=dropout,
        )
    raise ValueError(f"Unknown model type: {model_type}; expected {GRAPH_MODEL_TYPES}")
