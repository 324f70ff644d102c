"""Pallas TPU aggregation kernels: one-hot MXU SpMM over tiled neighborhoods.

Why not a plain gather: XLA's TPU row-gather is per-row-overhead bound
(~12 ns/row measured on v5e — width- and locality-independent), so ELL
aggregation at B x N x D = ~800k rows costs ~13 ms/layer and dominates the
whole train step. This kernel replaces the per-edge gather with:

  1. one XLA row-gather of each dst tile's COMPACTED unique neighborhood
     (5-10x fewer rows on spatially ordered supervoxel graphs), then
  2. in-VMEM one-hot matmuls on the MXU: a [TN, U] slot-indicator matrix
     (built from iota==index compares — no gather) contracted with the
     [U, F] unique-feature block.

MXU matmuls run in bf16; to keep the "gather" exact the feature block is split
hi/lo (v = bf16(v) + bf16(v - bf16(v))) and contracted twice — indicator
matrices are exact in bf16, so the result carries ~2^-16 relative error instead
of bf16's 2^-8.

sum/mean collapse all D slots into one histogram matrix (one hi/lo dot pair per
tile). max runs one dot pair per slot with a running masked max and records the
winning slot for scatter-free gradient routing (first-winner semantics,
matching scatter-max backends). Backward passes reuse the same kernels over the
symmetric (reverse = forward) table — no TPU scatter anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import TiledAux, gather_unique_rows

__all__ = ["tiled_aggregate", "tiled_aggregate_max_fwd", "tiled_max_backward"]

_NEG_LARGE = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fast_precision() -> bool:
    from .precision import fast_precision

    return fast_precision()


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_unique(h, uniq):
    """h [B, N, F], uniq [B, T, U] -> [B, T, U, F] via one flat XLA row gather."""
    return gather_unique_rows(h, uniq)


# ---------------------------------------------------------------------------
# sum / mean
# ---------------------------------------------------------------------------


def _sum_kernel(lidx_ref, mask_ref, g_ref, out_ref, *, mean: bool, fast: bool):
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    g = g_ref[0, 0]
    if fast:
        g_hi, g_lo = g.astype(jnp.bfloat16), None     # single bf16 pass
    else:
        g_hi, g_lo = _hi_lo(g)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    cnt = jnp.zeros((TN, U), jnp.float32)
    for d in range(D):
        oh = (iota_u == lidx[:, d:d + 1]).astype(jnp.float32)
        cnt = cnt + oh * mask[:, d:d + 1]
    cnt_b = cnt.astype(jnp.bfloat16)  # integer counts <= D: exact
    out = jnp.dot(cnt_b, g_hi, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    if not fast:
        out = out + jnp.dot(cnt_b, g_lo, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    if mean:
        deg = jnp.sum(mask, axis=1, keepdims=True)
        out = out / jnp.maximum(deg, 1.0)
    out_ref[0] = out.astype(out_ref.dtype)


def tiled_aggregate(h, aux: TiledAux, nbr_mask, op: str):
    """sum/mean aggregation. h [B, N, F] -> [B, N, F] f32.

    The unique-block row-gather stays f32: XLA's TPU gather costs
    max(rows x ~12ns, bytes / ~225GB/s), and at F=256 the f32 row is exactly at
    that knee — narrower (bf16) rows save no time, they just become row-bound.
    """
    assert op in ("sum", "mean")
    B, N, F = h.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    fast = _fast_precision() or h.dtype == jnp.bfloat16
    g = _gather_unique(h, aux.uniq)                   # [B, T, U, F]
    mask_t = nbr_mask.reshape(B, T, TN, D)

    kernel = functools.partial(_sum_kernel, mean=(op == "mean"), fast=fast)
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U, F), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), h.dtype),
        interpret=_interpret(),
    )(aux.lidx, mask_t, g)
    return out


# ---------------------------------------------------------------------------
# max (forward with winner slots, scatter-free backward)
# ---------------------------------------------------------------------------


def _max_kernel(lidx_ref, mask_ref, g_ref, out_ref, arg_ref, *, fast):
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    g = g_ref[0, 0]
    if fast:
        g_hi, g_lo = g.astype(jnp.bfloat16), None     # single bf16 pass
    else:
        g_hi, g_lo = _hi_lo(g)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    best = jnp.full((TN, g.shape[-1]), _NEG_LARGE, jnp.float32)
    arg = jnp.zeros((TN, g.shape[-1]), jnp.float32)
    for d in range(D):
        oh = (iota_u == lidx[:, d:d + 1]).astype(jnp.bfloat16)
        g_d = jnp.dot(oh, g_hi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        if not fast:
            g_d = g_d + jnp.dot(oh, g_lo, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        valid = mask[:, d:d + 1] > 0
        take = valid & (g_d > best)
        best = jnp.where(take, g_d, best)
        arg = jnp.where(take, float(d), arg)
    deg = jnp.sum(mask, axis=1, keepdims=True)
    out_ref[0] = jnp.where(deg > 0, best, 0.0).astype(out_ref.dtype)
    # winner slots as bf16 (ids < D <= 128: exact) — halves the residual
    # HBM traffic between forward and backward
    arg_ref[0] = arg.astype(jnp.bfloat16)


def tiled_aggregate_max_fwd(h, aux: TiledAux, nbr_mask):
    """max aggregation -> (out [B,N,F] f32, arg_slot bf16 [B,N,F])."""
    B, N, F = h.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    fast = _fast_precision() or h.dtype == jnp.bfloat16
    g = _gather_unique(h, aux.uniq)
    mask_t = nbr_mask.reshape(B, T, TN, D)
    out, arg = pl.pallas_call(
        functools.partial(_max_kernel, fast=fast),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U, F), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TN, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, F), h.dtype),
            jax.ShapeDtypeStruct((B, N, F), jnp.bfloat16),
        ),
        interpret=_interpret(),
    )(aux.lidx, mask_t, g)
    return out, arg


def _max_bwd_kernel(lidx_ref, mask_ref, rslot_ref, packed_ref, out_ref,
                    *, F, fast):
    """Route gout through the winner slots over the symmetric table.

    For dst-tile nodes u: grad[u, f] = sum_d mask[u,d] * gout[v_d, f] *
    [arg[v_d, f] == rslot[u, d]], where v_d = nbr[u, d]. gout and arg arrive
    PACKED into one bf16 unique block — [gout_hi | gout_lo | arg] ([U, 3F],
    exact) or [gout_bf16 | arg] ([U, 2F], fast). One gather instead of two
    keeps the row count at the XLA gather's ~12ns/row floor, and bf16 planes
    keep the bytes at/below its ~225GB/s byte bound. arg < D <= 128 is exact
    in bf16.
    """
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = packed_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    rslot = rslot_ref[0, 0]
    packed = packed_ref[0, 0]
    gg_hi = packed[:, :F]
    gg_lo = None if fast else packed[:, F:2 * F]
    ga = packed[:, (F if fast else 2 * F):]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    acc = jnp.zeros((TN, F), jnp.float32)
    for d in range(D):
        oh = (iota_u == lidx[:, d:d + 1]).astype(jnp.bfloat16)
        g_d = jnp.dot(oh, gg_hi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        if not fast:
            g_d = g_d + jnp.dot(oh, gg_lo, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        a_d = jnp.dot(oh, ga, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        hit = (a_d == rslot[:, d:d + 1].astype(jnp.float32))
        hit = hit & (mask[:, d:d + 1] > 0)
        acc = acc + jnp.where(hit, g_d, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def tiled_max_backward(gout, arg, aux: TiledAux, nbr_mask):
    """Gradient of tiled max aggregation w.r.t. h (symmetric table).

    gout [B, N, F] f32, arg bf16 winner slots from tiled_aggregate_max_fwd.
    """
    B, N, F = gout.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    fast = _fast_precision()
    if fast:
        packed = jnp.concatenate([gout.astype(jnp.bfloat16), arg], axis=-1)
    else:
        hi, lo = _hi_lo(gout)
        packed = jnp.concatenate([hi, lo, arg], axis=-1)
    W = packed.shape[-1]
    gp = _gather_unique(packed, aux.uniq)             # [B, T, U, W] bf16
    mask_t = nbr_mask.reshape(B, T, TN, D)
    rslot_t = aux.rslot.reshape(B, T, TN, D)
    blk = lambda w: pl.BlockSpec((1, 1, TN, w), lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_max_bwd_kernel, F=F, fast=fast),
        grid=(B, T),
        in_specs=[
            blk(D), blk(D), blk(D),
            pl.BlockSpec((1, 1, U, W), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, F), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), gout.dtype),
        interpret=_interpret(),
    )(aux.lidx, mask_t, rslot_t, gp)


# ---------------------------------------------------------------------------
# public op with custom VJP (symmetric graphs)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def aggregate_neighbors_tiled(h, aux: TiledAux, nbr_mask, op: str):
    """Drop-in tiled/Pallas replacement for ops.aggregate.aggregate_neighbors
    (symmetric graphs). h [B, N, F] -> [B, N, F]."""
    if op == "max":
        out, _ = tiled_aggregate_max_fwd(h, aux, nbr_mask)
        return out
    return tiled_aggregate(h, aux, nbr_mask, op)


def _agg_tiled_fwd(h, aux, nbr_mask, op):
    if op == "max":
        out, arg = tiled_aggregate_max_fwd(h, aux, nbr_mask)
        return out, (aux, nbr_mask, arg)
    return tiled_aggregate(h, aux, nbr_mask, op), (aux, nbr_mask, None)


def _agg_tiled_bwd(op, res, gout):
    aux, nbr_mask, arg = res
    if op == "max":
        grad_h = tiled_max_backward(gout, arg, aux, nbr_mask)
        return grad_h, None, None
    if op == "mean":
        deg = jnp.maximum(jnp.sum(nbr_mask, axis=-1, keepdims=True), 1.0)
        gout = gout / deg.astype(gout.dtype)
    grad_h = tiled_aggregate(gout, aux, nbr_mask, "sum")
    return grad_h, None, None


aggregate_neighbors_tiled.defvjp(_agg_tiled_fwd, _agg_tiled_bwd)
