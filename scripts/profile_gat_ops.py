"""Micro-profile GAT kernel primitives at flagship shapes (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt*1e3:8.2f} ms")
    return dt


def main():
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.ops.pallas.slot_gather import slot_gather
    from gnn_tumor_seg_tpu.ops.pallas.weighted_sum import tiled_weighted_sum
    from __graft_entry__ import _synthetic_graph

    batch, n_nodes, k = 6, 7000, 10
    graphs = [_synthetic_graph(n_nodes=n_nodes, k=k, seed=i).with_tiled_aux()
              for i in range(batch)]
    graph = batch_graphs(graphs)
    dev = jax.devices()[0]
    graph = jax.device_put(graph, dev)
    aux = graph.tiled
    B, N, D = graph.nbr.shape
    T, U = aux.num_tiles, aux.unique_budget
    H, F = 4, 256
    print(f"B={B} N={N} D={D} T={T} U={U} H={H} F={F}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    el = jax.device_put(jax.random.normal(key, (B, N, H)), dev)
    z = jax.device_put(jax.random.normal(key, (B, N, H, F)), dev)
    alpha = jax.device_put(
        jax.random.uniform(key, (B, N, D, H)) * graph.nbr_mask[..., None], dev)
    gout = jax.device_put(jax.random.normal(key, (B, N, H, F)), dev)

    sg = jax.jit(lambda x: slot_gather(x, aux, graph.nbr_mask))
    timeit(sg, el, label="slot_gather fwd (W=4, el)")

    sg_wide = jax.jit(lambda x: slot_gather(x, aux, graph.nbr_mask))
    elw = jax.device_put(jax.random.normal(key, (B, N, D * H)), dev)
    timeit(sg_wide, elw, label=f"slot_gather fwd (W={D*H}, rev-w)")

    sg_vjp = jax.jit(lambda x: jax.vjp(lambda y: slot_gather(y, aux, graph.nbr_mask), x)[1](
        jnp.ones((B, N, D, H))))
    timeit(sg_vjp, el, label="slot_gather fwd+bwd (W=4)")

    ws = jax.jit(lambda v, w: tiled_weighted_sum(v, w, aux, graph.nbr_mask))
    timeit(ws, z, alpha, label="wsum fwd")

    def ws_bwd(v, w, g):
        _, vjp = jax.vjp(lambda a, b: tiled_weighted_sum(a, b, aux, graph.nbr_mask), v, w)
        return vjp(g)
    timeit(jax.jit(ws_bwd), z, alpha, gout, label="wsum fwd+bwd")

    # XLA-side softmax block for scale
    def softmax_block(el_src, er):
        e = jax.nn.leaky_relu(el_src + er[:, :, None, :], 0.2)
        e = jnp.where(graph.nbr_mask[..., None] > 0, e, -1e30)
        e = e - jax.lax.stop_gradient(jnp.max(e, axis=2, keepdims=True))
        w = jnp.exp(e) * graph.nbr_mask[..., None]
        return w / jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-20)
    el_src = jax.device_put(jax.random.normal(key, (B, N, D, H)), dev)
    timeit(jax.jit(softmax_block), el_src, el, label="XLA softmax block fwd")

    # unique-gather alone (the XLA row gather feeding kernels)
    def gu(x):
        g = jax.vmap(lambda a, i: a[i])(x, aux.uniq.reshape(B, T * U))
        return g.reshape(B, T, U, x.shape[-1])
    timeit(jax.jit(gu), z.reshape(B, N, H * F), label="unique gather (H*F)")

    # big dense matmul for scale: z projection of one hidden layer
    h = jax.device_put(jax.random.normal(key, (B, N, H * F)), dev)
    wmat = jax.device_put(jax.random.normal(key, (H * F, H * F)), dev)
    timeit(jax.jit(lambda a, b: a @ b), h, wmat, label="dense proj [B,N,1024]x[1024,1024]")


if __name__ == "__main__":
    main()
