"""Neighborhood aggregation primitives over the ELL graph layout.

These replace DGL's C++/CUDA message-passing runtime (g.update_all with copy_u +
sum/mean/max reducers), which the reference invokes implicitly through every
SAGEConv/GATConv forward (`model/networks.py:25-36,46-58`).

Two interchangeable implementations with identical semantics:

  "dense" — one batched gather producing [B, N, D, F] then a masked reduce. XLA can
            fuse gather into the reduction; best when N*D*F fits comfortably.
  "scan"  — lax.scan over the degree axis carrying a [B, N, F] accumulator; D row
            gathers of [B, N, F], never materializing the [B, N, D, F] tensor.
            Bounded memory for deep stacks / large hidden dims.

A Pallas kernel path ("pallas", ops/pallas/) keeps the node-feature table resident in
VMEM and streams neighbor indices — the speed-of-light path for the ~7k-node BraTS
graphs (whole 7k x 256 f32 table = 7 MB < 16 MB VMEM).

Semantics (shared by all impls, matching DGL reducers):
  sum:  padded slots contribute 0.
  mean: sum / max(real_degree, 1); nodes without in-edges aggregate to 0.
  max:  elementwise max over real neighbors; nodes without in-edges aggregate to 0
        (DGL fills zero-degree rows with zeros).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["aggregate_neighbors", "gather_neighbors", "set_default_impl", "get_default_impl"]

_DEFAULT_IMPL = "dense"
_VALID_OPS = ("sum", "mean", "max")
_NEG_LARGE = -1e30


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("dense", "scan", "pallas"), impl
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def gather_neighbors(h: jax.Array, nbr: jax.Array) -> jax.Array:
    """Gather neighbor features: h [B, N, F], nbr int32 [B, N, D] -> [B, N, D, F]."""
    return jax.vmap(lambda hb, ib: hb[ib])(h, nbr)


def _agg_dense(h, nbr, nbr_mask, op):
    g = gather_neighbors(h, nbr)                      # [B, N, D, F]
    m = nbr_mask[..., None].astype(h.dtype)           # [B, N, D, 1]
    if op == "sum":
        return jnp.sum(g * m, axis=-2)
    if op == "mean":
        deg = jnp.maximum(jnp.sum(nbr_mask, axis=-1, keepdims=True), 1.0)  # [B, N, 1]
        return jnp.sum(g * m, axis=-2) / deg.astype(h.dtype)
    # max: mask padded slots to -inf, then clamp all-padded rows back to 0
    g = jnp.where(m > 0, g, _NEG_LARGE)
    out = jnp.max(g, axis=-2)
    has_nbr = jnp.sum(nbr_mask, axis=-1, keepdims=True) > 0
    return jnp.where(has_nbr, out, 0.0)


def _agg_scan(h, nbr, nbr_mask, op):
    # scan over the degree axis: D gathers of [B, N, F], no [B, N, D, F] intermediate
    nbr_t = jnp.moveaxis(nbr, -1, 0)                  # [D, B, N]
    mask_t = jnp.moveaxis(nbr_mask, -1, 0)            # [D, B, N]
    gather = jax.vmap(lambda hb, ib: hb[ib])          # over B

    if op == "max":
        init = jnp.full(h.shape, _NEG_LARGE, dtype=h.dtype)

        def body(acc, slot):
            idx, m = slot
            g = gather(h, idx)
            g = jnp.where(m[..., None] > 0, g, _NEG_LARGE)
            return jnp.maximum(acc, g), None

        out, _ = jax.lax.scan(body, init, (nbr_t, mask_t))
        has_nbr = jnp.sum(nbr_mask, axis=-1, keepdims=True) > 0
        return jnp.where(has_nbr, out, 0.0)

    init = jnp.zeros(h.shape, dtype=h.dtype)

    def body(acc, slot):
        idx, m = slot
        g = gather(h, idx) * m[..., None].astype(h.dtype)
        return acc + g, None

    out, _ = jax.lax.scan(body, init, (nbr_t, mask_t))
    if op == "mean":
        deg = jnp.maximum(jnp.sum(nbr_mask, axis=-1, keepdims=True), 1.0)
        out = out / deg.astype(h.dtype)
    return out


def _agg_fwd_impl(h, nbr, nbr_mask, op, impl):
    if impl == "dense":
        return _agg_dense(h, nbr, nbr_mask, op)
    if impl == "scan":
        return _agg_scan(h, nbr, nbr_mask, op)
    raise ValueError(f"unknown aggregation impl {impl!r}")


# ---------------------------------------------------------------------------
# Symmetric-graph custom VJP: scatter-free backward.
#
# TPU scatter-add (the autodiff VJP of a gather) serializes badly; but every
# graph this framework builds is undirected (kNN adjacency is symmetrized,
# contiguity adjacency is symmetric + self-loops), so the reverse neighbor
# table equals the forward one, and the gradient w.r.t. h is itself a
# gather-reduce over the SAME table:
#
#   sum : grad_h[u]   = sum_{v in N(u)} g[v]
#   mean: grad_h[u]   = sum_{v in N(u)} g[v] / deg(v)
#   max : grad_h[u,f] = sum_{v in N(u)} g[v,f] * [winner_src(v,f) == u]
#
# max uses first-winner (argmax-slot) routing — the same subgradient choice as
# scatter-max backends (DGL/torch) — instead of autodiff's split-among-ties.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _agg_symmetric(h, nbr, nbr_mask, op, impl):
    return _agg_fwd_impl(h, nbr, nbr_mask, op, impl)


def _agg_symmetric_fwd(h, nbr, nbr_mask, op, impl):
    out = _agg_fwd_impl(h, nbr, nbr_mask, op, impl)
    if op == "max":
        # winner slot per (v, f): which neighbor slot produced the max
        g = gather_neighbors(h, nbr)                      # [B, N, D, F]
        g = jnp.where(nbr_mask[..., None] > 0, g, _NEG_LARGE)
        arg = jnp.argmax(g, axis=2).astype(jnp.int32)     # [B, N, F]
        # winner source node id via a D-way select (no gather: D is small and a
        # per-(v,f) vmap gather lowers catastrophically on TPU)
        D = nbr.shape[-1]
        winner = jnp.zeros(arg.shape, jnp.int32)
        for d in range(D):
            winner = jnp.where(arg == d, nbr[:, :, d, None], winner)
        has = jnp.sum(nbr_mask, axis=-1, keepdims=True) > 0
        winner = jnp.where(has, winner, -1)
        return out, (nbr, nbr_mask, winner)
    return out, (nbr, nbr_mask, None)


def _agg_symmetric_bwd(op, impl, res, gout):
    nbr, nbr_mask, winner = res
    B, N, D = nbr.shape
    gather = jax.vmap(lambda x, idx: x[idx])              # over B

    if op in ("sum", "mean"):
        g = gout
        if op == "mean":
            deg = jnp.maximum(jnp.sum(nbr_mask, axis=-1, keepdims=True), 1.0)
            g = gout / deg.astype(gout.dtype)
        grad_h = _agg_scan(g, nbr, nbr_mask, "sum")
        return grad_h, None, None

    # max: scan over slots; route g[v] to u where u won (winner[v, f] == u)
    u_ids = jax.lax.broadcasted_iota(jnp.int32, (B, N, 1), 1)
    nbr_t = jnp.moveaxis(nbr, -1, 0)
    mask_t = jnp.moveaxis(nbr_mask, -1, 0)

    def body(acc, slot):
        idx, m = slot                                     # [B, N]
        g_v = gather(gout, idx)                           # [B, N, F]
        w_v = gather(winner, idx)                         # [B, N, F]
        hit = (w_v == u_ids) & (m[..., None] > 0)
        return acc + jnp.where(hit, g_v, 0.0), None

    grad_h, _ = jax.lax.scan(body, jnp.zeros_like(gout), (nbr_t, mask_t))
    return grad_h, None, None


_agg_symmetric.defvjp(_agg_symmetric_fwd, _agg_symmetric_bwd)


# ---------------------------------------------------------------------------
# Weighted aggregation (per-slot edge weights, GraphBatch.edge_weight):
#   sum : out_v = sum_d w_vd h_{nbr[v,d]}
#   mean: weighted average  sum_d w h / max(sum_d w, eps)
# Backward on symmetric graphs with symmetric weights (w_uv == w_vu — true for
# the intensity-similarity weights of `mri2graph/graphgen.py:120-153`) is
# itself a weighted gather-reduce over the SAME table (scatter-free), plus a
# per-slot dot for grad(w).
# ---------------------------------------------------------------------------


def _wagg_fwd_impl(h, w, nbr, nbr_mask, op):
    g = gather_neighbors(h, nbr)                      # [B, N, D, F]
    wm = (nbr_mask * w)[..., None]                    # [B, N, D, 1]
    s = jnp.sum(g * wm, axis=-2)
    if op == "sum":
        return s
    denom = jnp.maximum(jnp.sum(nbr_mask * w, axis=-1, keepdims=True), 1e-12)
    return s / denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _wagg_symmetric(h, w, nbr, nbr_mask, op):
    return _wagg_fwd_impl(h, w, nbr, nbr_mask, op)


def _wagg_symmetric_fwd(h, w, nbr, nbr_mask, op):
    out = _wagg_fwd_impl(h, w, nbr, nbr_mask, op)
    return out, (h, w, nbr, nbr_mask, out)


def _wagg_symmetric_bwd(op, res, gout):
    h, w, nbr, nbr_mask, out = res
    if op == "sum":
        g_scaled = gout
    else:
        denom = jnp.maximum(jnp.sum(nbr_mask * w, axis=-1, keepdims=True), 1e-12)
        g_scaled = gout / denom
    # grad_h[u] = sum_d w[u,d] g_scaled[nbr[u,d]]   (symmetric w + table)
    grad_h = _wagg_fwd_impl(g_scaled, w, nbr, nbr_mask, "sum")
    g_h = gather_neighbors(h, nbr)                    # [B, N, D, F]
    if op == "sum":
        grad_w = jnp.einsum("bnf,bndf->bnd", gout, g_h)
    else:
        grad_w = jnp.einsum("bnf,bndf->bnd", g_scaled,
                            g_h - out[:, :, None, :])
    grad_w = grad_w * nbr_mask
    return grad_h.astype(h.dtype), grad_w.astype(w.dtype), None, None


_wagg_symmetric.defvjp(_wagg_symmetric_fwd, _wagg_symmetric_bwd)


def aggregate_neighbors(
    h: jax.Array,
    nbr: jax.Array,
    nbr_mask: jax.Array,
    op: str,
    impl: str | None = None,
    symmetric: bool = True,
    tiled=None,
    edge_weight: jax.Array | None = None,
) -> jax.Array:
    """Aggregate neighbor features per destination node.

    h: [B, N, F] node features; nbr: int32 [B, N, D]; nbr_mask: f32 [B, N, D].
    Returns [B, N, F]. symmetric=True (the default — all graphs this framework
    constructs are undirected) enables the scatter-free custom VJP above; pass
    False for directed neighbor tables to fall back to autodiff scatter.
    impl='pallas' uses the one-hot MXU kernels (requires `tiled` — the
    GraphBatch.with_tiled_aux() tables — and a symmetric graph).
    edge_weight [B, N, D] (sum/mean only) weights each in-edge; mean becomes a
    weighted average (Gaussian intensity weights of `graphgen.py:120-153`,
    which the reference computes but never consumes). On impl='pallas' the
    weighted combine rides the SAME fused weighted-histogram MXU kernel the
    GAT path uses (ops/pallas/weighted_sum.py, alpha := edge weight, H=1) with
    its scatter-free custom VJP; other impls use the dense weighted path.
    (Fast-mode caveat: the kernel's grad wrt the WEIGHTS — input data, not a
    training gradient — carries a bf16 cancellation residual at degree-1
    weighted-mean nodes where the true grad is an exact-zero difference; the
    feature gradient, the one training consumes, is oracle-parity-tested in
    both modes.)
    """
    assert op in _VALID_OPS, op
    impl = impl or _DEFAULT_IMPL
    if edge_weight is not None:
        if op == "max":
            raise ValueError("edge weights apply to sum/mean aggregation only")
        if impl == "pallas":
            assert tiled is not None, (
                "impl='pallas' needs tile-compaction tables: call "
                "GraphBatch.with_tiled_aux() before batching/jit"
            )
            from .pallas.weighted_sum import tiled_weighted_sum

            s = tiled_weighted_sum(
                h[:, :, None, :], edge_weight[..., None].astype(jnp.float32),
                tiled, nbr_mask)[:, :, 0, :]
            if op == "mean":
                denom = jnp.maximum(
                    jnp.sum(nbr_mask * edge_weight, axis=-1, keepdims=True),
                    1e-12)
                s = (s / denom).astype(h.dtype)
            return s
        if symmetric:
            return _wagg_symmetric(h, edge_weight, nbr, nbr_mask, op)
        return _wagg_fwd_impl(h, edge_weight, nbr, nbr_mask, op)
    if impl == "pallas":
        assert tiled is not None, (
            "impl='pallas' needs tile-compaction tables: call "
            "GraphBatch.with_tiled_aux() before batching/jit"
        )
        from .pallas.gather_agg import aggregate_neighbors_tiled

        return aggregate_neighbors_tiled(h, tiled, nbr_mask, op)
    if symmetric:
        return _agg_symmetric(h, nbr, nbr_mask, op, impl)
    return _agg_fwd_impl(h, nbr, nbr_mask, op, impl)
