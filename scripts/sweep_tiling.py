"""Sweep the Pallas tiling knobs of the flagship GSpool train step on hardware.

Axes (VERDICT r2 item 4 — "the gather-row lever"):
  - tile   : dst-tile size TN (kernels derive it from TiledAux, any 8-multiple
             dividing the node bucket works). Bigger tiles amortize shared
             neighborhoods into fewer gathered rows (T*U drops) but every
             one-hot MXU dot grows as N*U; smaller tiles do the reverse and
             multiply the per-tile kernel launches.
  - u_align: unique-budget rounding quantum (16 = bf16 sublane quantum).
  - d_pad  : neighbor-slot padding (degree bucket). Each padded slot is one
             more masked VPU/MXU pass in every kernel.

Per config: full jitted train step (fwd+bwd+AdamW, same harness as bench.py),
10 timed steps after warmup. Prints one JSON line per config to stdout and a
summary table to stderr. Compiles are cached (~/.cache/gnn_tumor_seg_tpu).

Usage: python scripts/sweep_tiling.py [--quick]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_step, log, time_steps  # noqa: E402  (enables cache)

import jax  # noqa: E402


def run_config(tile, u_align, d_pad, model, hp, device):
    from gnn_tumor_seg_tpu.ops.graph import batch_graphs
    from __graft_entry__ import _synthetic_graph

    graphs = [
        _synthetic_graph(n_nodes=7000, k=10, seed=i, d_pad=d_pad)
        .with_tiled_aux(u_align=u_align, tile=tile)
        for i in range(6)
    ]
    graph = batch_graphs(graphs)
    aux = graph.tiled
    step, state, g_dev = build_step(model, hp, graph, device)
    t = time_steps(step, state, g_dev, n_steps=10,
                   label=f"tile={tile} u_align={u_align} d_pad={d_pad}")
    return {
        "tile": tile, "u_align": u_align, "d_pad": graph.max_degree,
        "T": aux.num_tiles, "U": aux.unique_budget,
        "gather_rows_per_layer": graph.batch_size * aux.num_tiles
        * aux.unique_budget,
        "step_ms": round(t * 1e3, 2),
    }


def main():
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.models.sage import GraphSage
    from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode

    set_precision_mode(os.environ.get("GTS_PALLAS_PRECISION", "fast"))
    hp = HyperParams(layer_sizes=[256] * 6)
    model = GraphSage(hp.in_feats, hp.layer_sizes, hp.out_classes, "pool")
    device = jax.devices()[0]
    log(f"[sweep] device: {device}")

    quick = "--quick" in sys.argv
    configs = [(t, u, None) for t in (64, 128, 256, 512)
               for u in ((16,) if quick else (8, 16, 32))]
    # degree-padding sensitivity at the default tile (bucket 12 is the
    # flagship k=10 fit; 16 measures the cost of one bucket of slack)
    configs += [(128, 16, 16)]

    rows = []
    for tile, u_align, d_pad in configs:
        try:
            r = run_config(tile, u_align, d_pad, model, hp, device)
        except Exception as e:  # keep sweeping — record the failure
            r = {"tile": tile, "u_align": u_align, "d_pad": d_pad,
                 "error": str(e)[:200]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    log("\ntile  u_align  d_pad    T    U  rows/layer  step_ms")
    for r in rows:
        if "error" in r:
            log(f"{r['tile']:>4}  {r['u_align']:>7}  {str(r['d_pad']):>5}  "
                f"ERROR {r['error'][:80]}")
        else:
            log(f"{r['tile']:>4}  {r['u_align']:>7}  {r['d_pad']:>5}  "
                f"{r['T']:>3}  {r['U']:>3}  {r['gather_rows_per_layer']:>10}  "
                f"{r['step_ms']:>7}")


if __name__ == "__main__":
    main()
