"""Micro-profile GSpool aggregation pieces at flagship shapes (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.ops.pallas.gather_agg import (
        tiled_aggregate, tiled_aggregate_max_fwd, tiled_max_backward,
        aggregate_neighbors_tiled)
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
    F = 256
    print(f"B={B} N={N} D={D} T={T} U={U} F={F} "
          f"precision={os.environ.get('GTS_PALLAS_PRECISION','exact')}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    h = jax.device_put(jax.random.normal(key, (B, N, F)), dev)
    gout = jax.device_put(jax.random.normal(key, (B, N, F)), dev)

    def gu(x):
        g = jax.vmap(lambda a, i: a[i])(x, aux.uniq.reshape(B, T * U))
        return g.reshape(B, T, U, x.shape[-1])
    timeit(jax.jit(gu), h, label=f"unique gather F={F} ({B*T*U} rows)")
    h2 = jnp.concatenate([h, h], -1)
    timeit(jax.jit(gu), h2, label=f"unique gather F={2*F} (packed bwd)")
    timeit(jax.jit(lambda x: gu(x.astype(jnp.bfloat16))), h,
           label=f"unique gather bf16 F={F}")

    timeit(jax.jit(lambda x: tiled_aggregate(x, aux, graph.nbr_mask, "sum")), h,
           label="sum agg (gather+kernel)")
    timeit(jax.jit(lambda x: tiled_aggregate_max_fwd(x, aux, graph.nbr_mask)), h,
           label="max fwd (gather+kernel)")
    arg = tiled_aggregate_max_fwd(h, aux, graph.nbr_mask)[1]
    arg = jax.device_put(arg, dev)
    timeit(jax.jit(lambda g, a: tiled_max_backward(g, a, aux, graph.nbr_mask)),
           gout, arg, label="max bwd (gather+kernel)")

    def full(h):
        _, vjp = jax.vjp(
            lambda x: aggregate_neighbors_tiled(x, aux, graph.nbr_mask, "max"), h)
        return vjp(gout)
    timeit(jax.jit(full), h, label="max fwd+bwd")

    # dense matmuls of one layer, for scale
    w = jax.device_put(jax.random.normal(key, (F, F)), dev)
    timeit(jax.jit(lambda a, b: jax.nn.relu(a @ b)), h, w,
           label="dense [B,N,256]x[256,256]+relu")


if __name__ == "__main__":
    main()
