"""SDDMM: sampled dense-dense matmul — per-edge scores from node embeddings.

score[b, v, d, h] = < a[b, v, h, :], c[b, nbr[b, v, d], h, :] >   (masked)

This is the general per-edge similarity op (GAT-style attention uses the
cheaper decomposed form a_l.z_src + a_r.z_dst, which needs only slot_gather;
full SDDMM covers bilinear/dot-product attention and edge-feature scoring).

TPU path (impl='pallas'): per dst tile, one all-pairs dot matrix per head
M_h = A_h @ C_uniq_h^T on the MXU, then a one-hot slot pick — no per-edge
feature rows are materialized (ops/pallas/weighted_sum._pairdot). The dense
fallback gathers rows and reduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sddmm"]


def sddmm(a: jax.Array, c: jax.Array, nbr: jax.Array, nbr_mask: jax.Array,
          impl: str | None = None, tiled=None) -> jax.Array:
    """a, c: [B, N, H, F]; nbr [B, N, D]; -> scores [B, N, D, H]."""
    if impl == "pallas":
        assert tiled is not None, "impl='pallas' needs GraphBatch.with_tiled_aux()"
        from .pallas.weighted_sum import _gather_values, _pairdot

        g = _gather_values(c, tiled)
        scores = _pairdot(a, c.shape, g, tiled, nbr_mask, jnp.float32)
        return scores * (nbr_mask[..., None] > 0)
    B, N, H, F = a.shape
    gather = jax.vmap(lambda x, i: x[i])
    c_src = gather(c.reshape(B, N, H * F), nbr).reshape(B, N, -1, H, F)
    scores = jnp.einsum("bnhf,bndhf->bndh", a, c_src)
    return scores * (nbr_mask[..., None] > 0)
