"""Per-slot neighbor gather as a Pallas one-hot-MXU primitive (GAT's SDDMM path).

slot_gather(x, aux, nbr_mask) : x [B, N, W] -> [B, N, D, W]
    out[b, v, d, :] = x[b, nbr[b, v, d], :]   (0 for padded slots)

This is the "per-edge feature fetch" underlying GAT's attention logits (the src
terms el; W = heads) and other SMALL-width per-edge quantities. On TPU, XLA
lowers this to a per-row gather (overhead-bound, see gather_agg.py); here each
dst tile instead runs one one-hot matmul per slot against its compacted unique
block (hi/lo bf16 split for f32-exact results).

Keep W small (heads / slot-count scale): the backward materializes
[B, N, D, D, W]. Wide per-edge combines (attention-weighted feature sums) should
use weighted_sum.tiled_weighted_sum instead, which never materializes per-edge
feature rows.

The backward is the transposed routing — a scatter in autodiff terms — computed
scatter-free on the symmetric table: the cotangent of x at node u collects, for
each of u's slots d (peer v = nbr[u, d]), the cotangent row g[v, rslot[u, d], :]
— i.e. a slot_gather of g over the reverse table followed by a D-way slot
select. rslot comes from tiling.build_tiled_aux.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import TiledAux, gather_unique_rows

__all__ = ["slot_gather"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fast_precision() -> bool:
    from .precision import fast_precision

    return fast_precision()


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_unique(x, uniq):
    return gather_unique_rows(x, uniq)


def _slot_gather_kernel(lidx_ref, mask_ref, g_ref, out_ref, *, W, fast):
    # out block is [TN, D*W] (slots flattened into lanes): contiguous writes;
    # tiny-W trailing output dims lower terribly on TPU (measured ~17 ms/layer)
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    g = g_ref[0, 0]
    if fast:
        g_hi, g_lo = g.astype(jnp.bfloat16), None
    else:
        g_hi, g_lo = _hi_lo(g)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    cols = []
    for d in range(D):
        oh = ((iota_u == lidx[:, d:d + 1]) &
              (mask[:, d:d + 1] > 0)).astype(jnp.bfloat16)
        row = jnp.dot(oh, g_hi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        if not fast:
            row = row + jnp.dot(oh, g_lo, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        cols.append(row)
    out_ref[0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


def _slot_gather_raw(x, aux: TiledAux, nbr_mask):
    import functools

    B, N, W = x.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    g = _gather_unique(x, aux.uniq)
    mask_t = nbr_mask.reshape(B, T, TN, D)
    out = pl.pallas_call(
        functools.partial(_slot_gather_kernel, W=W, fast=_fast_precision()),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U, W), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, D * W), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D * W), x.dtype),
        interpret=_interpret(),
    )(aux.lidx, mask_t, g)
    return out.reshape(B, N, D, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def slot_gather(x, aux: TiledAux, nbr_mask):
    """x [B, N, W] -> per-slot gathered rows [B, N, D, W] (padded slots -> 0)."""
    return _slot_gather_raw(x, aux, nbr_mask)


def _slot_gather_fwd(x, aux, nbr_mask):
    return _slot_gather_raw(x, aux, nbr_mask), (aux, nbr_mask)


def _slot_gather_bwd(res, gout):
    aux, nbr_mask = res
    B, N, D, W = gout.shape
    # fetch the peers' full cotangent slot-rows over the symmetric table, then
    # select the column block each peer stored *us* under (rslot)
    g_flat = gout.reshape(B, N, D * W)
    fetched = _slot_gather_raw(g_flat, aux, nbr_mask)   # [B, N, D, D*W]
    fetched = fetched.reshape(B, N, D, D, W)            # [., u, d, peer_slot, W]
    rs = aux.rslot[..., None, None]                     # [B, N, D, 1, 1]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (B, N, D, D, 1), 3)
    picked = jnp.sum(jnp.where(slot_iota == rs, fetched, 0.0), axis=3)
    picked = picked * (nbr_mask[..., None] > 0).astype(picked.dtype)
    return jnp.sum(picked, axis=2).astype(gout.dtype), None, None  # [B, N, W]


slot_gather.defvjp(_slot_gather_fwd, _slot_gather_bwd)
