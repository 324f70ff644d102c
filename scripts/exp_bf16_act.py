"""Experiment: does carrying activations in bf16 (fast mode) shrink the GAT
hidden layer? Times f32-activation vs bf16-activation layer fwd+bwd chains."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode

set_precision_mode("fast")

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
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    from gnn_tumor_seg_tpu.models.gat import gat_conv_apply
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from __graft_entry__ import _synthetic_graph

    batch, n_nodes, k = 6, 7000, 10
    graphs = [_synthetic_graph(n_nodes=n_nodes, k=k, seed=i).with_tiled_aux()
              for i in range(batch)]
    graph = batch_graphs(graphs)
    dev = jax.devices()[0]
    graph = jax.device_put(graph, dev)
    B, N, D = graph.nbr.shape
    H, F = 4, 256
    key = jax.random.PRNGKey(0)

    wmat = jax.device_put(jax.random.normal(key, (H * F, H * F)) * 0.03, dev)
    a_l = jax.device_put(jax.random.normal(key, (H, F)) * 0.1, dev)
    lp = {"w": wmat, "attn_l": a_l, "attn_r": a_l, "bias": jnp.zeros((H * F,))}
    h0 = jax.device_put(jax.random.normal(key, (B, N, H * F)), dev)

    def layer_f32(h):
        out = gat_conv_apply(lp, graph, h, H, F, residual=True,
                             activation=jax.nn.elu, impl="pallas")
        return out.reshape(B, N, H * F)

    lp16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), lp)

    def layer_bf16(h):
        out = gat_conv_apply(lp16, graph, h.astype(jnp.bfloat16), H, F,
                             residual=True, activation=jax.nn.elu,
                             impl="pallas")
        return out.reshape(B, N, H * F)

    timeit_chain(layer_f32, (h0,), "hidden layer fwd (f32 act)")
    timeit_chain(layer_bf16, (h0,), "hidden layer fwd (bf16 act)")

    def mk_bwd(layer):
        def f(h):
            return jax.grad(lambda x: jnp.sum(layer(x).astype(jnp.float32) *
                                              h0))(h)
        return f

    timeit_chain(mk_bwd(layer_f32), (h0,), "hidden layer fwd+bwd (f32 act)")
    timeit_chain(mk_bwd(layer_bf16), (h0,), "hidden layer fwd+bwd (bf16 act)")


if __name__ == "__main__":
    main()
