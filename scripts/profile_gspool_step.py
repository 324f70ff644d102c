"""Decompose the GSpool train step at flagship shapes (dev tool, real chip).

Chains REPS repeats inside ONE jit per measurement (per CLAUDE.md:
per-dispatch overhead ~1.3 ms through the relay poisons unchained numbers).
Produces the per-op accounting table recorded in BASELINE.md / docs.
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

REPS = 8


def timeit_chain(make_fn, args, label, n_outer=5):
    @jax.jit
    def chained(x, *rest):
        for _ in range(REPS):
            x = make_fn(x, *rest)
        return x

    out = chained(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = chained(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (n_outer * REPS)
    print(f"{label:46s} {dt*1e3:8.3f} ms")
    return dt


def main():
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.models.sage import GraphSage, sage_conv_apply
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.ops.pallas.gather_agg import (
        aggregate_neighbors_tiled, tiled_aggregate_max_fwd,
        tiled_max_backward)
    from gnn_tumor_seg_tpu.ops.pallas.tiling import gather_unique_rows
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
    T, U = aux.num_tiles, aux.unique_budget
    F = 256
    cd = (jnp.bfloat16
          if os.environ.get("GTS_PALLAS_PRECISION", "fast") == "fast"
          else jnp.float32)
    print(f"B={B} N={N} D={D} T={T} U={U} F={F} cd={cd.__name__}",
          file=sys.stderr)

    # 0) full train step for reference
    hp = HyperParams(layer_sizes=[256] * 6)
    model = GraphSage(hp.in_feats, hp.layer_sizes, hp.out_classes, "pool")
    step, state, g_dev = build_step(model, hp, graph, dev)
    t = time_steps(step, state, g_dev, n_steps=10, label="gspool full step")
    print(f"{'FULL train step (7 layers)':46s} {t*1e3:8.3f} ms")

    key = jax.random.PRNGKey(0)
    h = jax.device_put(jax.random.normal(key, (B, N, F)).astype(cd), dev)
    gout = jax.device_put(jax.random.normal(key, (B, N, F)).astype(cd), dev)

    # 1) the unique-block row gather alone (feeds every kernel)
    def g_chain(x):
        g = gather_unique_rows(x, aux.uniq)           # [B, T, U, F]
        # tiny-scaled reduction keeps the gather live (no DCE), shape [B,N,F]
        return x + jnp.sum(g, axis=(1, 2))[:, None, :] * 1e-6
    timeit_chain(g_chain, (h,),
                 f"unique gather ({B*T*U} rows x {F} {cd.__name__})")

    # 2) max aggregation fwd (gather + kernel)
    timeit_chain(lambda x: tiled_aggregate_max_fwd(x, aux, graph.nbr_mask)[0],
                 (h,), "max agg fwd (gather+kernel)")

    # 3) max backward (packed gather + routing kernel)
    arg = tiled_aggregate_max_fwd(h, aux, graph.nbr_mask)[1]
    arg = jax.device_put(arg, dev)
    timeit_chain(lambda g: tiled_max_backward(g, arg, aux, graph.nbr_mask),
                 (gout,), "max agg bwd (gather+kernel)")

    # 4) max fwd+bwd via vjp
    def agg_step(x):
        _, vjp = jax.vjp(
            lambda y: aggregate_neighbors_tiled(y, aux, graph.nbr_mask, "max"),
            x)
        return vjp(gout)[0]
    timeit_chain(agg_step, (h,), "max agg fwd+bwd")

    # 5) XLA side of one layer fwd: w_pool proj + relu + w_self/w_neigh + bias
    w = jax.device_put(jax.random.normal(key, (F, F)).astype(cd) * 0.05, dev)
    b = jax.device_put(jnp.zeros((F,), cd), dev)

    def xla_layer(x):
        p = jax.nn.relu(x @ w + b)
        out = x @ w + p @ w + b            # stand-in for w_self/w_neigh
        return jax.nn.relu(out)
    timeit_chain(xla_layer, (h,), "XLA matmuls+relu of one layer fwd")

    # 6) one full hidden sage_conv layer fwd, and fwd+bwd
    lp = {"w_self": w, "w_neigh": w, "w_pool": w, "b_pool": b, "bias": b}

    def layer(x):
        return sage_conv_apply(lp, graph, x, "pool",
                               activation=jax.nn.relu, impl="pallas")
    timeit_chain(layer, (h,), "full hidden layer fwd")

    def layer_bwd(x):
        return jax.grad(lambda y: jnp.sum(layer(y).astype(jnp.float32) *
                                          gout.astype(jnp.float32)))(x)
    timeit_chain(layer_bwd, (h,), "full hidden layer fwd+bwd (d_h)")

    # 7) AdamW update alone at flagship param count
    from gnn_tumor_seg_tpu.train.optim import apply_updates, make_train_state
    params = jax.device_put(model.init(jax.random.PRNGKey(0)), dev)
    st, tx = make_train_state(params, hp.lr, hp.lr_decay, hp.w_decay)
    st = jax.device_put(st, dev)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    grads = jax.device_put(grads, dev)

    @jax.jit
    def opt_chain(st):
        for _ in range(REPS):
            st = apply_updates(tx, st, grads)
        return st

    out = opt_chain(st)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out.params)[0]))
    t0 = time.perf_counter()
    for _ in range(5):
        out = opt_chain(st)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out.params)[0]))
    print(f"{'AdamW update (all params)':46s} "
          f"{(time.perf_counter()-t0)/(5*REPS)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
