"""Fused GAT attention: edge softmax + alpha-weighted combine in ONE kernel.

fused_gat_attention(z, el, er, aux, nbr_mask, negative_slope):
    z  [B, N, H, F]  per-head projected features
    el [B, N, H]     src attention terms   (a_l . z)
    er [B, N, H]     dst attention terms   (a_r . z)
    -> out [B, N, H, F]:
       e[v,d,h]     = LeakyReLU(el[nbr[v,d],h] + er[v,h])
       alpha[v,:,h] = softmax_d(e)        (masked; zero-degree rows -> 0)
       out[v,h]     = sum_d alpha[v,d,h] * z[nbr[v,d],h]

Semantics match DGL GATConv's edge_softmax + message reduce, used by the
reference's GAT stack (`model/networks.py:39-66`).

Why fused: run separately (slot-gather el -> XLA softmax -> weighted-sum
kernel), each hidden layer pays one [U, H] slot-gather kernel, two XLA
elementwise passes over [B, N, D, H], one [U, H*F] row-gather, and a combine
kernel — with alpha/el_src round-tripping HBM in between. Here ONE row-gather
fetches the packed [z | el] unique block and ONE kernel per dst tile computes
attention logits (one-hot MXU dots against the el columns), the masked softmax
over neighbor slots (VPU), and the weighted combine (weighted-histogram MXU
dots against the z columns) entirely in VMEM.

The custom VJP is scatter-free on symmetric graphs, two kernels total:
  - kernel 1 recomputes nothing non-local: d_alpha via per-head all-pairs dots
    gout_h @ z_uniq_h^T + one-hot row picks, then softmax and LeakyReLU
    backward in-register -> d_pre (per-edge) and d_er (sum over slots), using
    the bf16 `pre` activations saved by the forward;
  - kernel 2 (_bwd2_kernel, "reverse-combine") is fed by ONE packed
    [gout | alpha | d_pre] unique-row gather and routes everything through the
    reverse table in-VMEM: per slot d it one-hot-fetches the neighbor's packed
    slot rows, selects the slot under which the neighbor stored *us* via a
    lane-block rslot mask + tiled-projection MXU dot (no XLA [B,N,D,D,W]
    select), slot-sums d_pre_rev into d_el, and accumulates the reverse-edge
    weights alpha_rev into per-head weighted histograms contracted against the
    gathered gout block for d_z — the wsum combine fused in.
The el/er -> z chain (el = a_l . z) stays outside in XLA autodiff.

GTS_PALLAS_PRECISION=fast: single bf16 passes everywhere (halves the
byte-bound z gather and the MXU dot count); exact (default) carries hi/lo bf16
splits for ~2^-16 relative error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import TiledAux, gather_unique_rows

__all__ = ["fused_gat_attention"]

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


def _planes(x, fast):
    if fast:
        return x if x.dtype == jnp.bfloat16 else x.astype(jnp.bfloat16), None
    return _hi_lo(x)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _pair(a, b):
    """[TN, F] x [U, F] -> [TN, U] contraction over the last axis."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _gather_packed(z, el, aux):
    """One row-gather of the packed [z | el] unique block -> [B,T,U, H*F+H]."""
    B, N, H, F = z.shape
    packed = jnp.concatenate([z.reshape(B, N, H * F), el], axis=-1)
    if _fast_precision():
        packed = packed.astype(jnp.bfloat16)
    return gather_unique_rows(packed, aux.uniq)


def _fwd_kernel(lidx_ref, mask_ref, er_ref, g_ref, *refs,
                H, F, slope, fast, act, with_res):
    # refs: bias_ref [1, H*F], [res_ref [1,1,TN,H*F]], out_ref, alpha_ref, pre_ref
    bias_ref = refs[0]
    res_ref = refs[1] if with_res else None
    out_ref, alpha_ref, pre_ref = refs[1 + bool(with_res):]
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    er = er_ref[0, 0]                                   # [TN, H] f32
    g = g_ref[0, 0]                                     # [U, H*F+H]
    el_hi, el_lo = _planes(g[:, H * F:], fast)          # [U, H]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)

    # one-hot slot masks; the el fetch runs as ONE stacked [D*TN, U] MXU dot
    # (D small [TN, U] x [U, H] dots are launch-bound, not FLOP-bound)
    ohs = [(iota_u == lidx[:, d:d + 1]) & (mask[:, d:d + 1] > 0)
           for d in range(D)]
    oh_f = [m.astype(jnp.float32) for m in ohs]
    oh_all = jnp.concatenate([m.astype(jnp.bfloat16) for m in ohs], axis=0)
    el_all = _dot(oh_all, el_hi)                        # [D*TN, H]
    if not fast:
        el_all = el_all + _dot(oh_all, el_lo)

    # attention logits + masked softmax over slots, in-register
    pre, mx = [], jnp.full((TN, H), _NEG_LARGE, jnp.float32)
    for d in range(D):
        p = el_all[d * TN:(d + 1) * TN] + er
        p = jnp.where(p >= 0, p, p * slope)             # LeakyReLU
        pre.append(p)
        masked = jnp.where(mask[:, d:d + 1] > 0, p, _NEG_LARGE)
        mx = jnp.maximum(mx, masked)
    w, z_sum = [], jnp.zeros((TN, H), jnp.float32)
    for d in range(D):
        # exp over the MASKED logits: padded slots give exp(-1e30 - mx) = 0
        # even on zero-degree rows (where mx = -1e30 and raw pre - mx would
        # overflow to inf and poison the row with inf * 0 = NaN)
        masked = jnp.where(mask[:, d:d + 1] > 0, pre[d], _NEG_LARGE)
        wd = jnp.exp(masked - mx) * mask[:, d:d + 1]
        w.append(wd)
        z_sum = z_sum + wd
    inv = 1.0 / jnp.maximum(z_sum, 1e-20)
    alpha = [wd * inv for wd in w]                      # D x [TN, H]

    # weighted combine: one histogram + hi/lo dot pair per head. For multi-
    # head layers the histogram builds STACKED ([D*TN, U] multiply + sublane-
    # block reduce) instead of D separate [TN, U] passes — VPU passes at these
    # shapes are launch-overhead-bound (~50 ns/pass), so fewer, bigger ops
    # win. H=1 keeps the per-slot loop: Mosaic rejects the stacked reshape
    # next to the narrow H*F=n_classes lane blocks of the output layer.
    oh_f_all = jnp.concatenate(oh_f, axis=0) if H > 1 else None
    outs = []
    for h in range(H):
        if H > 1:
            a_h = jnp.concatenate([alpha[d][:, h:h + 1] for d in range(D)],
                                  axis=0)               # [D*TN, 1]
            whist = jnp.sum((oh_f_all * a_h).reshape(D, TN, U), axis=0)
        else:
            whist = jnp.zeros((TN, U), jnp.float32)
            for d in range(D):
                whist = whist + oh_f[d] * alpha[d][:, h:h + 1]
        wh_hi, wh_lo = _planes(whist, fast)
        zh_hi, zh_lo = _planes(g[:, h * F:(h + 1) * F], fast)
        o = _dot(wh_hi, zh_hi)
        if not fast:
            o = o + _dot(wh_hi, zh_lo) + _dot(wh_lo, zh_hi)
        outs.append(o)
    # fused epilogue (reference `model/networks.py:60-66` + DGL GATConv tail):
    # combine + residual + bias + ELU in-register — saves one full-width XLA
    # elementwise pass over [B, N, H*F] per layer
    s = jnp.concatenate(outs, axis=1) + bias_ref[0].astype(jnp.float32)
    if with_res:
        s = s + res_ref[0, 0].astype(jnp.float32)
    if act:  # ELU (alpha=1); exp argument clamped so the dead branch of the
        # select cannot overflow to inf
        s = jnp.where(s > 0, s, jnp.exp(jnp.minimum(s, 0.0)) - 1.0)
    out_ref[0] = s.astype(out_ref.dtype)
    alpha_ref[0] = jnp.concatenate(alpha, axis=1)       # [TN, D*H] f32
    # pre-activations (bf16: only sign/scale needed for LeakyReLU backward)
    pre_ref[0] = jnp.concatenate(pre, axis=1).astype(jnp.bfloat16)


def _bwd_kernel(lidx_ref, mask_ref, g_ref, alpha_ref, pre_ref, gout_ref,
                dpre_ref, *, H, F, slope, fast):
    """-> packed [TN, (D+1)*H]: per-slot d_pre columns, then d_er."""
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = g_ref.shape[2]
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    g = g_ref[0, 0]
    alpha = alpha_ref[0, 0]                             # [TN, D*H] f32
    pre = pre_ref[0, 0]                                 # [TN, D*H] bf16
    go = gout_ref[0, 0]                                 # [TN, H*F] f32
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)

    # d_alpha[v,d,h] = <gout[v,h], z_uniq[lidx[v,d], h]> : all-pairs dot + pick
    m_h = []
    for h in range(H):
        go_hi, go_lo = _planes(go[:, h * F:(h + 1) * F], fast)
        zh_hi, zh_lo = _planes(g[:, h * F:(h + 1) * F], fast)
        m = _pair(go_hi, zh_hi)
        if not fast:
            m = m + _pair(go_hi, zh_lo) + _pair(go_lo, zh_hi)
        m_h.append(m)                                   # [TN, U]

    # per-slot picks d_alpha[v,d,h] = m_h[v, lidx[v,d]] — STACKED: one
    # [D*TN, U] multiply + lane reduce per head instead of D*H separate
    # [TN, U] where+reduce passes (launch-overhead-bound at these shapes)
    sel_all = jnp.concatenate(
        [((iota_u == lidx[:, d:d + 1]) & (mask[:, d:d + 1] > 0)).astype(
            jnp.float32) for d in range(D)], axis=0)    # [D*TN, U]
    picks = []                                          # H x [D, TN, 1]
    for h in range(H):
        m_t = jnp.concatenate([m_h[h]] * D, axis=0)     # [D*TN, U]
        picks.append(jnp.sum(sel_all * m_t, axis=1,
                             keepdims=True).reshape(D, TN, 1))
    # softmax backward: d_e = alpha * (d_alpha - sum_d alpha*d_alpha)
    d_alpha = []
    s = jnp.zeros((TN, H), jnp.float32)
    for d in range(D):
        da = jnp.concatenate([picks[h][d] for h in range(H)], axis=1)
        d_alpha.append(da)                              # [TN, H]
        s = s + alpha[:, d * H:(d + 1) * H] * da
    cols = []
    for d in range(D):
        a_d = alpha[:, d * H:(d + 1) * H]
        d_e = a_d * (d_alpha[d] - s)
        p_d = pre[:, d * H:(d + 1) * H].astype(jnp.float32)  # bf16 cmp: no TPU op
        d_p = jnp.where(p_d >= 0, d_e, d_e * slope)     # LeakyReLU'
        cols.append(d_p * mask[:, d:d + 1])
    d_er = functools.reduce(jnp.add, cols)
    dpre_ref[0] = jnp.concatenate(cols + [d_er], axis=1)


def _bwd2_kernel(lidx_ref, mask_ref, rslot_ref, p_ref, out_ref, del_ref,
                 *, H, F, fast):
    """Reverse-combine: ONE kernel for the whole d_z/d_el tail of the VJP.

    Per dst tile, for each slot d (neighbor v = nbr[u, d]):
      row_d   = one-hot fetch of v's packed [alpha | d_pre] slot rows  [TN, 2DH]
      picked  = (row_d * [lane_block == rslot[u, d]]) @ tiled-projection
                -> (alpha_rev_d, d_pre_rev_d)  [TN, 2H]
      d_el   += d_pre_rev_d
      whist_h += one_hot_d * alpha_rev_d[:, h]
    d_z_h = whist_h @ gout_uniq_h (weighted-histogram MXU dots, as in wsum).

    Replaces: slot_gather kernel + XLA [B,N,D,D,2H] select (+~700MB/layer HBM
    traffic) + a second unique-gather + the separate wsum kernel.
    """
    TN, D = lidx_ref.shape[2], lidx_ref.shape[3]
    U = p_ref.shape[2]
    HF, DH = H * F, D * H
    lidx = lidx_ref[0, 0]
    mask = mask_ref[0, 0]
    rslot = rslot_ref[0, 0]
    p = p_ref[0, 0]                                     # [U, HF + 2DH]
    adp_hi, adp_lo = _planes(p[:, HF:], fast)           # [U, 2DH]
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TN, U), 1)
    # tiled projection [2DH, 2H]: sums the rslot-selected j-block per part/head
    pr = jax.lax.broadcasted_iota(jnp.int32, (2 * DH, 2 * H), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (2 * DH, 2 * H), 1)
    proj = (((pr // DH) == (pc // H)) & ((pr % H) == (pc % H))).astype(
        jnp.bfloat16)

    # stack the D per-slot one-hots along sublanes and run the whole fetch +
    # projection as TWO large MXU dots instead of 2*D small ones — the small
    # [TN, .]x[., 96/8] dots are launch/shape-bound, not FLOP-bound
    ohs = [(iota_u == lidx[:, d:d + 1]) & (mask[:, d:d + 1] > 0)
           for d in range(D)]
    oh_all = jnp.concatenate([m.astype(jnp.bfloat16) for m in ohs], axis=0)
    row_all = _dot(oh_all, adp_hi)                      # [D*TN, 2DH]
    if not fast:
        row_all = row_all + _dot(oh_all, adp_lo)
    # lane-block id over the 2DH picked columns: the neighbor slot j each lane
    # belongs to (alpha part lanes [0, DH), d_pre part [DH, 2DH)); built per-d
    # at [TN, 2DH] and stacked wide (Mosaic rejects concats of [TN, 1] slices)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, 2 * DH), 1)
    jblk = (lane % DH) // H
    bm = jnp.concatenate(
        [(jblk == rslot[:, d:d + 1]).astype(jnp.float32) for d in range(D)],
        axis=0)                                         # [D*TN, 2DH]
    rm_hi, rm_lo = _planes(row_all * bm, fast)
    picked = _dot(rm_hi, proj)                          # [D*TN, 2H]
    if not fast:
        picked = picked + _dot(rm_lo, proj)

    # d_el and the per-head reverse-weight histograms via sublane-block
    # reduces over the stacked layout (no per-(d,h) lane slicing — tiny
    # lane-offset slices force Mosaic relayouts)
    d_el = jnp.sum(picked.reshape(D, TN, 2 * H), axis=0)[:, H:]
    oh_f_all = oh_all.astype(jnp.float32)               # [D*TN, U]
    whists = [
        jnp.sum((oh_f_all * picked[:, h:h + 1]).reshape(D, TN, U), axis=0)
        for h in range(H)
    ]
    outs = []
    for h in range(H):
        wh_hi, wh_lo = _planes(whists[h], fast)
        gh_hi, gh_lo = _planes(p[:, h * F:(h + 1) * F], fast)
        o = _dot(wh_hi, gh_hi)
        if not fast:
            o = o + _dot(wh_hi, gh_lo) + _dot(wh_lo, gh_hi)
        outs.append(o)
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)
    del_ref[0] = d_el


def _reverse_combine(gout, alpha, d_pre, aux: TiledAux, nbr_mask):
    """gout [B,N,H,F], alpha/d_pre [B,N,D*H] (slot-major) ->
    (d_z [B,N,H,F], d_el [B,N,H]) via one packed gather + one kernel."""
    B, N, H, F = gout.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    fast = _fast_precision()
    packed = jnp.concatenate([gout.reshape(B, N, H * F), alpha, d_pre], axis=-1)
    if fast:
        packed = packed.astype(jnp.bfloat16)
    W = packed.shape[-1]
    gp = gather_unique_rows(packed, aux.uniq)           # [B, T, U, W]
    mask_t = nbr_mask.reshape(B, T, TN, D)
    rslot_t = aux.rslot.reshape(B, T, TN, D)
    blk = lambda w: pl.BlockSpec((1, 1, TN, w), lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    d_z, d_el = pl.pallas_call(
        functools.partial(_bwd2_kernel, H=H, F=F, fast=fast),
        grid=(B, T),
        in_specs=[
            blk(D), blk(D), blk(D),
            pl.BlockSpec((1, 1, U, W), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TN, H * F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, H), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H * F), gout.dtype),
            jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        ),
        interpret=_interpret(),
    )(aux.lidx, mask_t, rslot_t, gp)
    return d_z.reshape(B, N, H, F), d_el


def _fused_fwd_raw(z, el, er, aux: TiledAux, nbr_mask, slope, res, bias, act):
    B, N, H, F = z.shape
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    g = _gather_packed(z, el, aux)
    mask_t = nbr_mask.reshape(B, T, TN, D)
    er_t = er.reshape(B, T, TN, H)
    blk = lambda w: pl.BlockSpec((1, 1, TN, w), lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    if bias is None:
        bias = jnp.zeros((H * F,), jnp.float32)
    operands = [aux.lidx, mask_t, er_t, g, bias.reshape(1, H * F)]
    in_specs = [
        blk(D), blk(D), blk(H),
        pl.BlockSpec((1, 1, U, H * F + H), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H * F), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if res is not None:
        operands.append(res.reshape(B, T, TN, H * F))
        in_specs.append(blk(H * F))
    out, alpha, pre = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, F=F, slope=slope,
                          fast=_fast_precision(), act=bool(act),
                          with_res=res is not None),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, TN, H * F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, D * H), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, D * H), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H * F), z.dtype),
            jax.ShapeDtypeStruct((B, N, D * H), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D * H), jnp.bfloat16),
        ),
        interpret=_interpret(),
    )(*operands)
    return out.reshape(B, N, H, F), alpha, pre, g


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_gat_attention(z, el, er, aux: TiledAux, nbr_mask, negative_slope=0.2,
                        activation=None, res=None, bias=None):
    """Fused attention; optionally also the layer epilogue in-kernel:
    out = act(combine + res + bias), with act in (None, "elu") — the two
    epilogues the reference GAT stack uses (`model/networks.py:60-66`).
    res: [B, N, H*F] residual (already projected), bias: [H*F]."""
    out, _, _, _ = _fused_fwd_raw(z, el, er, aux, nbr_mask, negative_slope,
                                  res, bias, activation)
    return out


def _fga_fwd(z, el, er, aux, nbr_mask, slope, act, res, bias):
    out, alpha, pre, g = _fused_fwd_raw(z, el, er, aux, nbr_mask, slope,
                                        res, bias, act)
    # zero-size dtype sentinels: cotangents must match primal dtypes, and
    # dtype objects are not valid residual leaves
    sent = (jnp.zeros((0,), el.dtype), jnp.zeros((0,), er.dtype),
            None if res is None else jnp.zeros((0,), res.dtype),
            None if bias is None else jnp.zeros((0,), bias.dtype))
    y = out if act else None  # ELU backward needs only the OUTPUT: y>0?1:y+1
    return out, (z.shape, sent, g, alpha, pre, aux, nbr_mask, y)


def _fga_bwd(slope, act, resid, gout):
    (B, N, H, F), (el_s, er_s, res_s, bias_s), g, alpha, pre, aux, \
        nbr_mask, y = resid
    el_dt, er_dt = el_s.dtype, er_s.dtype
    T, U, TN = aux.num_tiles, aux.unique_budget, aux.tile_n
    D = aux.lidx.shape[-1]
    if act:  # d/ds elu(s) = 1 if s>0 else exp(s) = y + 1   (from the output)
        one = jnp.ones((), gout.dtype)
        gout = gout * jnp.where(y > 0, one, y + one)
    mask_t = nbr_mask.reshape(B, T, TN, D)
    go_t = gout.reshape(B, T, TN, H * F)
    alpha_t = alpha.reshape(B, T, TN, D * H)
    pre_t = pre.reshape(B, T, TN, D * H)
    blk = lambda w, dt=None: pl.BlockSpec((1, 1, TN, w),
                                          lambda b, t: (b, t, 0, 0),
                                          memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, F=F, slope=slope,
                          fast=_fast_precision()),
        grid=(B, T),
        in_specs=[
            blk(D), blk(D),
            pl.BlockSpec((1, 1, U, H * F + H), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(D * H), blk(D * H), blk(H * F),
        ],
        out_specs=pl.BlockSpec((1, TN, (D + 1) * H), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, (D + 1) * H), jnp.float32),
        interpret=_interpret(),
    )(aux.lidx, mask_t, g, alpha_t, pre_t, go_t)
    d_pre = packed[:, :, :D * H]
    d_er = packed[:, :, D * H:].astype(er_dt)

    # fused reverse-combine: one packed [gout | alpha | d_pre] gather + one
    # kernel yields both d_z (weighted sum over reverse-edge alphas) and d_el
    # (d_pre routed to src nodes)
    d_z, d_el = _reverse_combine(gout.reshape(B, N, H, F), alpha, d_pre,
                                 aux, nbr_mask)
    d_res = None
    if res_s is not None:
        d_res = gout.reshape(B, N, H * F).astype(res_s.dtype)
    d_bias = None
    if bias_s is not None:
        d_bias = jnp.sum(gout.reshape(B, N, H * F), axis=(0, 1)).astype(
            bias_s.dtype)
    return d_z, d_el.astype(el_dt), d_er, None, None, d_res, d_bias


fused_gat_attention.defvjp(_fga_fwd, _fga_bwd)
