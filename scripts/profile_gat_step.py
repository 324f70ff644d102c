"""Decompose the GAT train step at flagship shapes (dev tool, real chip).

Times each layer-level constituent inside single jits (per CLAUDE.md: chain
repeats inside one jit or per-dispatch overhead ~1.3 ms poisons numbers):
the full train step, per-layer fused attention fwd/bwd, the backward's
reverse fetch, and the XLA projection chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode

set_precision_mode(os.environ.get("GTS_PALLAS_PRECISION", "fast"))

REPS = 8  # repeats chained inside one jit


def _reverse_slots(x, aux, nbr_mask):
    """Historical pre-fusion reverse fetch, kept ONLY for profiling A/Bs.

    x [B, N, D, W] -> x_rev[u, d] = x[nbr[u,d], rslot[u,d]] (masked).
    slot_gather fetches each neighbor's full [D*W] slot row; the rslot column
    pick runs in XLA. The library path replaced this with _reverse_combine
    (one packed gather + stacked-dot kernel); see ops/pallas/fused_gat.py."""
    from gnn_tumor_seg_tpu.ops.pallas.slot_gather import slot_gather

    B, N, D, W = x.shape
    fetched = slot_gather(x.reshape(B, N, D * W), aux, nbr_mask)
    fetched = fetched.reshape(B, N, D, D, W)
    rs = aux.rslot[..., None, None]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (B, N, D, D, 1), 3)
    picked = jnp.sum(jnp.where(slot_iota == rs, fetched, 0.0), axis=3)
    return picked * (nbr_mask[..., None] > 0)


def timeit_chain(make_fn, args, label, n_outer=5):
    """make_fn(x, *rest) must return same-shaped x; chains REPS reps in-jit."""
    @jax.jit
    def chained(x, *rest):
        for _ in range(REPS):
            x = make_fn(x, *rest)
        return x

    out = chained(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # sync (D2H read)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = chained(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / (n_outer * REPS)
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.models.gat import GAT, gat_conv_apply
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.ops.pallas.fused_gat import (_fused_fwd_raw,
                                                        fused_gat_attention)
    from gnn_tumor_seg_tpu.ops.pallas.weighted_sum import _wsum_raw
    from __graft_entry__ import _synthetic_graph
    from bench import build_step, time_steps

    batch, n_nodes, k = 6, 7000, 10
    graphs = [_synthetic_graph(n_nodes=n_nodes, k=k, seed=i).with_tiled_aux()
              for i in range(batch)]
    graph = batch_graphs(graphs)
    dev = jax.devices()[0]
    graph = jax.device_put(graph, dev)
    aux = graph.tiled
    B, N, D = graph.nbr.shape
    H, F = 4, 256
    print(f"B={B} N={N} D={D} T={aux.num_tiles} U={aux.unique_budget} "
          f"H={H} F={F}", file=sys.stderr)

    # 0) full train step for reference
    hp = HyperParams(layer_sizes=[256] * 4)
    model = GAT(hp.in_feats, hp.layer_sizes, hp.out_classes,
                heads=[4] * 4, residuals=[True] * 4)
    step, state, g_dev = build_step(model, hp, graph, dev)
    t = time_steps(step, state, g_dev, n_steps=10, label="gat full step")
    print(f"{'FULL train step':44s} {t*1e3:8.3f} ms")

    key = jax.random.PRNGKey(0)
    z = jax.device_put(jax.random.normal(key, (B, N, H, F)), dev)
    el = jax.device_put(jax.random.normal(key, (B, N, H)), dev)
    er = jax.device_put(jax.random.normal(key, (B, N, H)), dev)
    gout = jax.device_put(jax.random.normal(key, (B, N, H, F)), dev)
    alpha = jax.device_put(
        jax.random.uniform(key, (B, N, D, H)) * graph.nbr_mask[..., None], dev)

    # 1) fused attention forward only
    timeit_chain(
        lambda zz: fused_gat_attention(zz, el, er, aux, graph.nbr_mask, 0.2),
        (z,), "fused attention fwd")

    # 2) fused attention fwd+bwd (value_and_grad through it)
    def att_loss(zz, ell, err):
        return jnp.sum(fused_gat_attention(zz, ell, err, aux, graph.nbr_mask,
                                           0.2) * gout)

    def att_step(zz, ell, err):
        _, grads = jax.value_and_grad(att_loss)(zz, ell, err)
        return grads

    timeit_chain(lambda zz: att_step(zz, el, er)[0] + zz - zz + z,
                 (z,), "fused attention fwd+bwd (d_z only carry)")

    # 3) the backward's reverse fetch alone (packed alpha|d_pre, W=2H)
    packed = jnp.concatenate([alpha, alpha], axis=-1)
    timeit_chain(
        lambda p: _reverse_slots(p, aux, graph.nbr_mask)[..., :H * 2] + p * 0,
        (packed,), "reverse_slots (packed 2H)")

    # 4) wsum alone (d_z path)
    timeit_chain(lambda g: _wsum_raw(g, alpha, aux, graph.nbr_mask),
                 (gout,), "wsum fwd (d_z)")

    # 5) XLA projection chain of one hidden layer (z/el/er + epilogue scale)
    wmat = jax.device_put(jax.random.normal(key, (H * F, H * F)) * 0.03, dev)
    a_l = jax.device_put(jax.random.normal(key, (H, F)), dev)

    def proj(h):
        zz = (h @ wmat).reshape(B, N, H, F)
        e1 = jnp.einsum("bnhf,hf->bnh", zz, a_l)
        e2 = jnp.einsum("bnhf,hf->bnh", zz, a_l)
        return (zz + e1[..., None] + e2[..., None]).reshape(B, N, H * F)

    h0 = jax.device_put(jax.random.normal(key, (B, N, H * F)), dev)
    timeit_chain(proj, (h0,), "XLA proj+el/er einsums (1 layer fwd)")

    # 6) one full hidden gat_conv layer fwd (pallas impl)
    lp = {
        "w": wmat, "attn_l": a_l, "attn_r": a_l,
        "bias": jnp.zeros((H * F,)),
    }

    def layer(h):
        out = gat_conv_apply(lp, graph, h, H, F, residual=True,
                             activation=jax.nn.elu, impl="pallas")
        return out.reshape(B, N, H * F)

    timeit_chain(layer, (h0,), "full hidden layer fwd")

    def layer_loss(h):
        return jnp.sum(layer(h) * h0)

    timeit_chain(lambda h: jax.grad(layer_loss)(h), (h0,),
                 "full hidden layer fwd+bwd (d_h)")


if __name__ == "__main__" and os.environ.get("GTS_PROFILE_SPLIT") != "1":
    main()


def profile_bwd_split():
    """Split attention bwd: kernel1 (softmax/pairdot) vs reverse-combine."""
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.ops.pallas.fused_gat import (_fused_fwd_raw,
                                                        _reverse_combine)
    from __graft_entry__ import _synthetic_graph

    batch, n_nodes, k = 6, 7000, 10
    graphs = [_synthetic_graph(n_nodes=n_nodes, k=k, seed=i).with_tiled_aux()
              for i in range(batch)]
    graph = batch_graphs(graphs)
    dev = jax.devices()[0]
    graph = jax.device_put(graph, dev)
    aux = graph.tiled
    B, N, D = graph.nbr.shape
    H, F = 4, 256
    key = jax.random.PRNGKey(0)
    z = jax.device_put(jax.random.normal(key, (B, N, H, F)).astype(jnp.bfloat16), dev)
    gout = jax.device_put(jax.random.normal(key, (B, N, H, F)).astype(jnp.bfloat16), dev)
    alpha = jax.device_put(
        (jax.random.uniform(key, (B, N, D, H)) *
         graph.nbr_mask[..., None]).reshape(B, N, D * H), dev)
    dpre = jax.device_put(jax.random.normal(key, (B, N, D * H)) * 0.01, dev)

    def rc(g):
        d_z, d_el = _reverse_combine(g, alpha, dpre, aux, graph.nbr_mask)
        return d_z + d_el[..., None] * 0
    timeit_chain(rc, (gout,), "reverse_combine (gather+kernel2)")


if __name__ == "__main__" and os.environ.get("GTS_PROFILE_SPLIT") == "1":
    profile_bwd_split()
