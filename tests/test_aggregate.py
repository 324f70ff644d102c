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


# ------------------------------------------------------------ edge weights
def _symmetric_edge_weights(rng, src, dst):
    """w_uv == w_vu via a symmetric hash of the endpoints."""
    lo = np.minimum(src, dst).astype(np.float64)
    hi = np.maximum(src, dst).astype(np.float64)
    return (0.1 + np.abs(np.sin(lo * 12.9898 + hi * 78.233))).astype(np.float32)


def _weighted_oracle(feats, src, dst, w, op):
    n = feats.shape[0]
    s = np.zeros_like(feats)
    tot = np.zeros(n)
    for a, b, ww in zip(src, dst, w):
        s[b] += ww * feats[a]
        tot[b] += ww
    if op == "sum":
        return s
    return s / np.maximum(tot, 1e-12)[:, None]


@pytest.mark.parametrize("op", ["sum", "mean"])
def test_weighted_aggregation_matches_oracle(op):
    import jax
    import jax.numpy as jnp
    from gnn_tumor_seg_tpu.data.synthetic import random_graph as rg

    rng = np.random.default_rng(21)
    feats, src, dst, labels = rg(rng, 45, avg_deg=5, f_dim=9)
    w = _symmetric_edge_weights(rng, src, dst)
    g = graph_from_arrays(feats, src, dst, labels, edge_weights=w)
    got = aggregate_neighbors(g.feats, g.nbr, g.nbr_mask, op,
                              edge_weight=g.edge_weight)
    want = _weighted_oracle(feats, src, dst, w, op)
    np.testing.assert_allclose(np.asarray(got)[0, :45], want,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op", ["sum", "mean"])
def test_weighted_aggregation_gradients_match_autodiff(op):
    """The scatter-free symmetric weighted VJP vs plain autodiff through the
    dense formula — both grad(h) and grad(w)."""
    import jax
    import jax.numpy as jnp
    from gnn_tumor_seg_tpu.data.synthetic import random_graph as rg
    from gnn_tumor_seg_tpu.ops.aggregate import _wagg_fwd_impl

    rng = np.random.default_rng(22)
    feats, src, dst, labels = rg(rng, 30, avg_deg=4, f_dim=5)
    w = _symmetric_edge_weights(rng, src, dst)
    g = graph_from_arrays(feats, src, dst, labels, edge_weights=w)
    R = jnp.asarray(rng.normal(size=g.feats.shape).astype(np.float32))

    def loss_custom(h, ew):
        out = aggregate_neighbors(h, g.nbr, g.nbr_mask, op, edge_weight=ew)
        return jnp.sum(out * R)

    def loss_autodiff(h, ew):
        return jnp.sum(_wagg_fwd_impl(h, ew, g.nbr, g.nbr_mask, op) * R)

    gh_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(g.feats, g.edge_weight)
    gh_a, gw_a = jax.grad(loss_autodiff, argnums=(0, 1))(g.feats, g.edge_weight)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a),
                               rtol=1e-4, atol=1e-5)


def test_weighted_max_rejected():
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        aggregate_neighbors(jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 3), jnp.int32),
                            jnp.zeros((1, 4, 3)), "max",
                            edge_weight=jnp.zeros((1, 4, 3)))


def test_weighted_batch_and_unit_weights_match_unweighted():
    import jax.numpy as jnp
    from gnn_tumor_seg_tpu.data.synthetic import random_graph as rg

    rng = np.random.default_rng(23)
    graphs = []
    for i in range(2):
        feats, src, dst, labels = rg(rng, 25 + i * 5, avg_deg=4, f_dim=6)
        w = np.ones(len(src), np.float32)
        graphs.append(graph_from_arrays(feats, src, dst, labels,
                                        edge_weights=w, n_pad=64, d_pad=8))
    batch = batch_graphs(graphs)
    assert batch.edge_weight is not None and batch.edge_weight.shape == batch.nbr_mask.shape
    for op in ("sum", "mean"):
        weighted = aggregate_neighbors(batch.feats, batch.nbr, batch.nbr_mask,
                                       op, edge_weight=batch.edge_weight)
        plain = aggregate_neighbors(batch.feats, batch.nbr, batch.nbr_mask, op)
        np.testing.assert_allclose(np.asarray(weighted), np.asarray(plain),
                                   rtol=1e-5, atol=1e-6)
