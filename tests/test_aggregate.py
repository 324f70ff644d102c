"""Aggregation primitives vs a naive numpy edge-list oracle."""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays, batch_graphs
from gnn_tumor_seg_tpu.ops.aggregate import aggregate_neighbors
from gnn_tumor_seg_tpu.data.synthetic import random_graph  # noqa: F401 (re-exported for sibling tests)


def oracle_agg(feats, src, dst, op):
    n = feats.shape[0]
    out = np.zeros_like(feats)
    if op == "max":
        seen = np.zeros(n, bool)
        for s, d in zip(src, dst):
            if not seen[d]:
                out[d] = feats[s]
                seen[d] = True
            else:
                out[d] = np.maximum(out[d], feats[s])
        return out
    deg = np.zeros(n)
    for s, d in zip(src, dst):
        out[d] += feats[s]
        deg[d] += 1
    if op == "mean":
        out = out / np.maximum(deg, 1)[:, None]
    return out


@pytest.mark.parametrize("impl", ["dense", "scan"])
@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_aggregate_matches_oracle(impl, op):
    rng = np.random.default_rng(0)
    feats, src, dst, labels = random_graph(rng, 53)
    g = graph_from_arrays(feats, src, dst, labels)
    got = np.asarray(aggregate_neighbors(g.feats, g.nbr, g.nbr_mask, op, impl=impl))[0]
    want = oracle_agg(feats, src, dst, op)
    n = feats.shape[0]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)
    # padded rows aggregate to 0
    assert np.allclose(got[n:], 0.0)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_batched_matches_individual(op):
    rng = np.random.default_rng(1)
    graphs, oracles = [], []
    for n in (17, 40, 64):
        feats, src, dst, labels = random_graph(rng, n)
        graphs.append(graph_from_arrays(feats, src, dst, labels))
        oracles.append((oracle_agg(feats, src, dst, op), n))
    batch = batch_graphs(graphs)
    got = np.asarray(aggregate_neighbors(batch.feats, batch.nbr, batch.nbr_mask, op))
    for i, (want, n) in enumerate(oracles):
        np.testing.assert_allclose(got[i, :n], want, rtol=1e-5, atol=1e-5)


def test_graph_batch_shapes():
    rng = np.random.default_rng(2)
    feats, src, dst, labels = random_graph(rng, 100)
    g = graph_from_arrays(feats, src, dst, labels)
    from gnn_tumor_seg_tpu.ops.graph import DEGREE_BUCKETS

    assert g.num_nodes_padded == 128  # bucketed
    assert g.max_degree in DEGREE_BUCKETS
    assert int(g.n_nodes[0]) == 100
    assert float(np.asarray(g.node_mask).sum()) == 100
