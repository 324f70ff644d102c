"""Ad-hoc GAT step timing on the real chip (dev tool, not the headline bench)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.models.gat import GAT
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from gnn_tumor_seg_tpu.train.losses import weighted_cross_entropy
    from gnn_tumor_seg_tpu.train.optim import apply_updates, make_train_state
    from __graft_entry__ import _synthetic_graph

    impl = os.environ.get("GTS_AGG_IMPL", "pallas")
    layers = int(os.environ.get("GTS_GAT_LAYERS", "4"))
    width = int(os.environ.get("GTS_GAT_WIDTH", "256"))
    heads = int(os.environ.get("GTS_GAT_HEADS", "4"))
    fwd_only = os.environ.get("GTS_FWD_ONLY") == "1"

    hp = HyperParams(layer_sizes=[width] * layers)
    model = GAT(hp.in_feats, hp.layer_sizes, hp.out_classes,
                heads=[heads] * layers, residuals=[True] * layers)

    batch, n_nodes, k = 6, 7000, 10
    graphs = [_synthetic_graph(n_nodes=n_nodes, k=k, seed=i) for i in range(batch)]
    if impl == "pallas":
        graphs = [g.with_tiled_aux() for g in graphs]
    graph = batch_graphs(graphs)

    dev = jax.devices()[0]
    print(f"device: {dev}  impl={impl} layers={layers} width={width} heads={heads}",
          file=sys.stderr)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)), dev)
    state, tx = make_train_state(params, hp.lr, hp.lr_decay, hp.w_decay)
    state = jax.device_put(state, dev)
    graph = jax.device_put(graph, dev)
    cw = jax.device_put(jnp.asarray(hp.class_weights, jnp.float32), dev)

    if fwd_only:
        @jax.jit
        def step(state, graph):
            logits = model.apply(state.params, graph, impl=impl)
            return state, weighted_cross_entropy(logits, graph.labels, cw,
                                                 graph.node_mask)
    else:
        @jax.jit
        def step(state, graph):
            def loss_fn(p):
                logits = model.apply(p, graph, impl=impl)
                return weighted_cross_entropy(logits, graph.labels, cw,
                                              graph.node_mask)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_updates(tx, state, grads), loss

    t0 = time.perf_counter()
    state, loss = step(state, graph)
    print(f"loss0={float(loss):.4f} compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, graph)
    _ = float(loss)  # D2H forces completion through the relay
    dt = (time.perf_counter() - t0) / n
    print(f"step {dt*1e3:.2f} ms  ({batch*n_nodes*k*(layers+1)/dt:.3e} edges/s)")


if __name__ == "__main__":
    main()
