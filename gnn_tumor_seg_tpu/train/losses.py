"""Losses. Class-weighted softmax cross-entropy with torch-parity normalization.

torch.nn.CrossEntropyLoss(weight=w) (used at `model/gnn_model.py:30` and
`model/cnn_model.py:32`) computes  sum_i w[y_i] * nll_i / sum_i w[y_i]  — a
*weighted mean*, not a plain mean. Padded elements (mask 0 / label < 0) are
excluded from both sums so bucket padding never perturbs the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["weighted_cross_entropy", "weighted_cross_entropy_per_graph"]


def weighted_cross_entropy_per_graph(
    logits: jax.Array,      # [B, N, C]
    labels: jax.Array,      # [B, N] int
    class_weights: jax.Array,  # [C]
    mask: jax.Array | None = None,  # [B, N] 1.0 = real element
) -> jax.Array:
    """Per-graph weighted CE [B]: the batched-evaluation form — each graph's
    loss equals `weighted_cross_entropy` on that graph alone (the reference
    computes eval loss per brain, `model/gnn_model.py:51-74`)."""
    labels_safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    w = class_weights[labels_safe]
    valid = (labels >= 0).astype(logits.dtype)
    if mask is not None:
        valid = valid * mask
    w = w * valid
    return jnp.sum(w * nll, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)


def weighted_cross_entropy(
    logits: jax.Array,      # [..., C]
    labels: jax.Array,      # [...] int
    class_weights: jax.Array,  # [C]
    mask: jax.Array | None = None,  # [...] 1.0 = real element
) -> jax.Array:
    labels_safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    w = class_weights[labels_safe]
    valid = (labels >= 0).astype(logits.dtype)
    if mask is not None:
        valid = valid * mask
    w = w * valid
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
