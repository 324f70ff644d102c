"""GraphSAGE / GAT / CNN forward parity vs independent dense numpy oracles.

The oracles implement the documented DGL layer formulas (SURVEY §2.4) directly on
the raw edge list — a different code path from the ELL gather-reduce ops — so
agreement pins the aggregation semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_tumor_seg_tpu.ops.pallas.precision import precision_scope
from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays


@pytest.fixture(autouse=True)
def _exact_mode():
    # The oracles here are f32 numpy: exact-mode contracts (fast mode runs
    # bf16 activations through the models). fast-mode coverage lives in
    # test_pallas_agg (dense-vs-pallas, both bf16) and
    # test_training::test_fast_vs_exact_convergence_pallas.
    with precision_scope("exact"):
        yield
from gnn_tumor_seg_tpu.models.sage import GraphSage
from gnn_tumor_seg_tpu.models.gat import GAT
from gnn_tumor_seg_tpu.models.refine_cnn import CnnRefinementNet
from gnn_tumor_seg_tpu.data.synthetic import random_graph


def relu(x):
    return np.maximum(x, 0)


def leaky_relu(x, s=0.2):
    return np.where(x >= 0, x, s * x)


def adj_from_edges(n, src, dst):
    a = np.zeros((n, n), np.float32)
    a[dst, src] = 1.0  # a[v, u]: edge u -> v
    return a


def oracle_sage_layer(p, adj, h, agg):
    deg = adj.sum(1, keepdims=True)
    if agg == "mean":
        hn = (adj @ h) / np.maximum(deg, 1)
        out = h @ np.asarray(p["w_self"]) + hn @ np.asarray(p["w_neigh"])
    elif agg == "gcn":
        hn = (adj @ h + h) / (deg + 1)
        out = hn @ np.asarray(p["w_neigh"])
    elif agg == "pool":
        z = relu(h @ np.asarray(p["w_pool"]) + np.asarray(p["b_pool"]))
        mx = np.zeros_like(z)
        for v in range(adj.shape[0]):
            nbrs = np.nonzero(adj[v])[0]
            if len(nbrs):
                mx[v] = z[nbrs].max(0)
        out = h @ np.asarray(p["w_self"]) + mx @ np.asarray(p["w_neigh"])
    return out + np.asarray(p["bias"])


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool"])
def test_sage_forward_matches_oracle(agg):
    rng = np.random.default_rng(3)
    feats, src, dst, labels = random_graph(rng, 37, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(20, [16, 16], 4, agg)
    params = model.init(jax.random.PRNGKey(0))
    got = np.asarray(model.apply(params, g))[0]

    adj = adj_from_edges(37, src, dst)
    h = feats
    for i, lp in enumerate(params):
        h = oracle_sage_layer(lp, adj, h, agg)
        if i < len(params) - 1:
            h = relu(h)
    np.testing.assert_allclose(got[:37], h, rtol=1e-4, atol=1e-4)


def oracle_gat_layer(p, adj, h, heads, out_f, residual):
    n = adj.shape[0]
    z = (h @ np.asarray(p["w"])).reshape(n, heads, out_f)
    el = (z * np.asarray(p["attn_l"])).sum(-1)  # [n, H]
    er = (z * np.asarray(p["attn_r"])).sum(-1)
    out = np.zeros((n, heads, out_f), np.float32)
    for v in range(n):
        nbrs = np.nonzero(adj[v])[0]
        if not len(nbrs):
            continue
        e = leaky_relu(el[nbrs] + er[v][None, :])  # [deg, H]
        a = np.exp(e - e.max(0, keepdims=True))
        a = a / a.sum(0, keepdims=True)
        out[v] = np.einsum("dh,dhf->hf", a, z[nbrs])
    if residual:
        res = h @ np.asarray(p["w_res"]) if "w_res" in p else h
        out = out + res.reshape(n, heads, out_f)
    return out + np.asarray(p["bias"]).reshape(heads, out_f)


def test_gat_forward_matches_oracle():
    rng = np.random.default_rng(4)
    n = 29
    feats, src, dst, labels = random_graph(rng, n, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    model = GAT(20, [8, 8], 4, heads=[3, 2], residuals=[False, True])
    params = model.init(jax.random.PRNGKey(1))
    got = np.asarray(model.apply(params, g))[0]

    adj = adj_from_edges(n, src, dst)
    h = feats
    specs = model.specs
    for i, (lp, (fi, fo, heads, res)) in enumerate(zip(params, specs)):
        out = oracle_gat_layer(lp, adj, h, heads, fo, res)
        if i < len(specs) - 1:
            out = np.where(out >= 0, out, np.expm1(out))  # elu
            h = out.reshape(n, heads * fo)
        else:
            h = out.mean(1)
    np.testing.assert_allclose(got[:n], h, rtol=1e-4, atol=1e-4)


def test_cnn_matches_torch_reference():
    """Replicate-padded k=5 Conv3d stack vs torch.nn.functional (CPU)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 9, 10, 11, 8)).astype(np.float32)
    net = CnnRefinementNet(8, 4, [16])
    params = net.init(jax.random.PRNGKey(2))
    got = np.asarray(net.apply(params, jnp.asarray(x)))

    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # NCDHW
    w0 = torch.tensor(np.asarray(params["conv0"]["w"])).permute(4, 3, 0, 1, 2)
    w1 = torch.tensor(np.asarray(params["conv1"]["w"])).permute(4, 3, 0, 1, 2)
    b0 = torch.tensor(np.asarray(params["conv0"]["b"]))
    b1 = torch.tensor(np.asarray(params["conv1"]["b"]))
    import torch.nn.functional as F

    def rep_conv(t, w, b):
        t = F.pad(t, (2, 2, 2, 2, 2, 2), mode="replicate")
        return F.conv3d(t, w, b)

    want = rep_conv(F.relu(rep_conv(xt, w0, b0)), w1, b1)
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sage_zero_degree_node():
    """A node with no in-edges must aggregate to zeros, not NaN."""
    feats = np.ones((3, 4), np.float32)
    src = np.array([0, 1])
    dst = np.array([1, 0])  # node 2 isolated
    g = graph_from_arrays(feats, src, dst, np.zeros(3, np.int32))
    for agg in ("mean", "gcn", "pool"):
        model = GraphSage(4, [8], 4, agg)
        params = model.init(jax.random.PRNGKey(0))
        out = np.asarray(model.apply(params, g))
        assert np.isfinite(out).all()


def test_cnn_fast_mode_tracks_exact():
    """fast (bf16 conv) logits track the f32 forward at bf16 tolerance."""
    from gnn_tumor_seg_tpu.ops.pallas.precision import precision_scope

    rng = np.random.default_rng(31)
    net = CnnRefinementNet(8, 4, [16])
    params = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.normal(size=(1, 10, 11, 9, 8)).astype(np.float32))
    with precision_scope("exact"):
        want = np.asarray(net.apply(params, x))
    with precision_scope("fast"):
        got = np.asarray(net.apply(params, x))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_cnn_crop_floor_preserves_valid_outputs():
    """Flooring the padded crop shape (CNNTrainer crop_floor — the r4
    compile-storm fix) must not change conv outputs inside the true crop:
    edge-replicate padding is a constant extension and k=5 sees only 2
    planes of it."""
    import numpy as np

    from gnn_tumor_seg_tpu.models.refine_cnn import CnnRefinementNet
    from gnn_tumor_seg_tpu.train.cnn_trainer import pad_to_bucket

    rng = np.random.default_rng(0)
    x = rng.normal(size=(19, 14, 11, 8)).astype(np.float32)
    net = CnnRefinementNet(8, 4, [8])
    params = net.init(jax.random.PRNGKey(0))

    small, _ = pad_to_bucket(x)                       # (32, 16, 16)
    big, mask = pad_to_bucket(x, floor=(48, 32, 32))  # floored shape
    assert big.shape[:3] == (48, 32, 32)
    out_small = np.asarray(net.apply(params, jnp.asarray(small)[None]))[0]
    out_big = np.asarray(net.apply(params, jnp.asarray(big)[None]))[0]
    np.testing.assert_allclose(out_big[:19, :14, :11],
                               out_small[:19, :14, :11], atol=2e-5)
