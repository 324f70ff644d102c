"""Edge-weighted neighbor combine (GAT's alpha-weighted SpMM) on the MXU.

tiled_weighted_sum(values, weights, aux, nbr_mask):
    values  [B, N, H, F]   per-head node features (z)
    weights [B, N, D, H]   per-edge per-head coefficients (attention alpha)
    ->      [B, N, H, F]   out[v, h] = sum_d weights[v, d, h] * values[nbr[v,d], h]

Instead of gathering per-edge feature rows, each dst tile builds a *weighted
histogram* matrix per head — W_h[v, u] = sum_d alpha[v, d, h] * [uniq[u] ==
nbr[v, d]] — with iota compares (no gather), and contracts it against the
compacted unique block on the MXU: one [TN, U] x [U, F] dot per head per tile,
independent of D. Weights/values are carried hi/lo in bf16 for f32-level
accuracy (GTS_PALLAS_PRECISION=fast: single bf16 pass — halves both the dot
count and, since the [U, H*F] row-gathers feeding the kernels are HBM-byte-
bound at GAT widths, the gather time).

The custom VJP is self-contained and scatter-free on symmetric graphs:
  d/d(values): the same weighted sum over the reverse(=same) table with the
               reverse-edge weights alpha_rev[u, d, h] = alpha[v, rslot[u,d], h]
               (fetched by a small slot_gather + slot select);
  d/d(weights): per tile, the all-pairs dot matrix M_h = gout_h @ values_uniq^T
               (one MXU dot), then a per-slot row pick via the one-hot masks.
The forward's gathered values block is saved as a VJP residual so the
d/d(weights) pass never re-gathers it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slot_gather import slot_gather
from .tiling import TiledAux, gather_unique_rows

__all__ = ["tiled_weighted_sum"]


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


def _gather_values(values, aux):
    """[B, N, H, F] -> gathered unique block [B, T, U, H*F].

    fast mode gathers bf16 (the 4KB f32 rows at GAT widths are byte-bound, so
    this halves gather time); exact gathers f32 and splits hi/lo in-kernel."""
    B, N, H, F = values.shape
    flat = values.reshape(B, N, H * F)
    if _fast_precision():
        flat = flat.astype(jnp.bfloat16)
    return _gather_unique(flat, aux.uniq)


def _planes(x, fast):
    """Kernel-side: bf16 (hi, lo|None) planes from a VMEM block."""
    if fast:
        return x if x.dtype == jnp.bfloat16 else x.astype(jnp.bfloat16), None
    return _hi_lo(x)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _wsum_kernel(lidx_ref, mask_ref, w_ref, g_ref, out_ref, *, H, F, fast):
    # flattened layouts: w block [TN, D*H], out block [TN, H*F] — no tiny
    # trailing dims, contiguous full-lane writes
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    w = w_ref[0, 0]                                    # [TN, D*H]
    g = g_ref[0, 0]                                    # [U, H*F]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    oh = []
    for d in range(D):
        oh.append(((iota_u == lidx[:, d:d + 1]) &
                   (mask[:, d:d + 1] > 0)).astype(jnp.float32))
    outs = []
    for h in range(H):
        whist = jnp.zeros((TN, U), jnp.float32)
        for d in range(D):
            whist = whist + oh[d] * w[:, d * H + h:d * H + h + 1]
        wh_hi, wh_lo = _planes(whist, fast)
        g_hi, g_lo = _planes(g[:, h * F:(h + 1) * F], fast)
        out = _dot(wh_hi, g_hi)
        if not fast:
            out = out + _dot(wh_hi, g_lo) + _dot(wh_lo, g_hi)
        outs.append(out)
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _wsum_raw(values, weights, aux: TiledAux, nbr_mask, g=None):
    B, N, H, F = values.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    if g is None:
        g = _gather_values(values, aux)                # [B,T,U,H*F]
    mask_t = nbr_mask.reshape(B, T, TN, D)
    w_t = weights.reshape(B, T, TN, D * H)
    kernel = functools.partial(_wsum_kernel, H=H, F=F, fast=_fast_precision())
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D * H), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U, H * F), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, H * F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * F), values.dtype),
        interpret=_interpret(),
    )(aux.lidx, mask_t, w_t, g)
    return out.reshape(B, N, H, F)


def _pairdot_kernel(lidx_ref, mask_ref, gout_ref, g_ref, out_ref, *, H, F,
                    fast):
    """grad wrt weights: e[v, d, h] = <gout[v, h], values[nbr[v, d], h]>."""
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    go = gout_ref[0, 0].reshape(TN, H, F)
    g = g_ref[0, 0].reshape(U, H, F)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)

    def pair(a, b):  # [TN, F] x [U, F] -> [TN, U] contraction over F
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    for h in range(H):
        go_hi, go_lo = _planes(go[:, h, :], fast)
        g_hi, g_lo = _planes(g[:, h, :], fast)
        m = pair(go_hi, g_hi)
        if not fast:
            m = m + pair(go_hi, g_lo) + pair(go_lo, g_hi)
        for d in range(D):
            sel = (iota_u == lidx[:, d:d + 1]) & (mask[:, d:d + 1] > 0)
            out_ref[0, :, d * H + h:d * H + h + 1] = jnp.sum(
                jnp.where(sel, m, 0.0), axis=1, keepdims=True
            ).astype(out_ref.dtype)


def _pairdot(gout, values_shape, g, aux: TiledAux, nbr_mask, out_dtype):
    """g: the forward's gathered values block (residual — no re-gather)."""
    B, N, H, F = values_shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    mask_t = nbr_mask.reshape(B, T, TN, D)
    go_t = gout.reshape(B, T, TN, H * F)
    kernel = functools.partial(_pairdot_kernel, H=H, F=F,
                               fast=_fast_precision())
    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, H * F), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U, H * F), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, D * H), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D * H), out_dtype),
        interpret=_interpret(),
    )(aux.lidx, mask_t, go_t, g).reshape(B, N, D, H)


def _reverse_weights(weights, aux: TiledAux, nbr_mask):
    """alpha_rev[u, d, h] = weights[nbr[u,d], rslot[u,d], h]."""
    B, N, D, H = weights.shape
    fetched = slot_gather(weights.reshape(B, N, D * H), aux, nbr_mask)
    fetched = fetched.reshape(B, N, D, D, H)
    rs = aux.rslot[..., None, None]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (B, N, D, D, 1), 3)
    picked = jnp.sum(jnp.where(slot_iota == rs, fetched, 0.0), axis=3)
    return picked * (nbr_mask[..., None] > 0)


@jax.custom_vjp
def tiled_weighted_sum(values, weights, aux: TiledAux, nbr_mask):
    return _wsum_raw(values, weights, aux, nbr_mask)


def _tws_fwd(values, weights, aux, nbr_mask):
    g = _gather_values(values, aux)
    out = _wsum_raw(values, weights, aux, nbr_mask, g=g)
    return out, (values.shape, g, weights, aux, nbr_mask)


def _tws_bwd(res, gout):
    values_shape, g, weights, aux, nbr_mask = res
    w_rev = _reverse_weights(weights, aux, nbr_mask)
    B, N, H, F = values_shape
    grad_values = _wsum_raw(gout, w_rev, aux, nbr_mask)
    grad_weights = _pairdot(gout, values_shape, g, aux, nbr_mask, weights.dtype)
    grad_weights = grad_weights * (nbr_mask[..., None] > 0).astype(
        grad_weights.dtype)
    return grad_values, grad_weights, None, None


tiled_weighted_sum.defvjp(_tws_fwd, _tws_bwd)
