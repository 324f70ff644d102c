"""Independent torch oracles for the GNN layers.

The north star (BASELINE.md) asks for layer parity vs PyTorch+DGL. DGL itself
is absent from this image, so this file codes DGL's *documented* SAGEConv /
GATConv formulas (the semantics the reference uses at
`/root/reference/model/networks.py:20-66`) a second time, independently, in
torch — edge-list message passing with per-node python loops, a completely
different computation structure from both the framework's dense ELL path and
the in-repo numpy oracles in test_models.py. Forward AND parameter gradients
must match.

DGL formula sources (docs for SAGEConv/GATConv, DGL >= 0.8):
  SAGE mean: fc_self(h_v) + fc_neigh(mean_u h_u) + bias
  SAGE gcn:  fc_neigh((sum_u h_u + h_v) / (deg+1)) + bias     [no fc_self]
  SAGE pool: fc_self(h_v) + fc_neigh(max_u relu(fc_pool(h_u))) + bias
  GAT:       z = W h;  e_uv = LeakyReLU(a_l.z_u + a_r.z_v);
             alpha = edge_softmax over in-edges of v;
             out_v = sum_u alpha_uv z_u (+residual) (+bias) (->activation)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from gnn_tumor_seg_tpu.data.synthetic import random_graph
from gnn_tumor_seg_tpu.models.gat import GAT
from gnn_tumor_seg_tpu.models.sage import GraphSage
from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays


def _t(x, grad=False):
    t = torch.tensor(np.asarray(x), dtype=torch.float64)
    if grad:
        t.requires_grad_(True)
    return t


def _nbr_lists(n, src, dst):
    nbrs = [[] for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        nbrs[d].append(s)
    return nbrs


# --------------------------------------------------------------- SAGE oracle
def torch_sage_forward(tparams, h, nbrs, aggregator):
    """One full GraphSage stack in torch (float64), per-node loops."""
    n = h.shape[0]
    for i, p in enumerate(tparams):
        last = i == len(tparams) - 1
        f_in = h.shape[1]
        if aggregator == "pool":
            pre = torch.relu(h @ p["w_pool"] + p["b_pool"])
        rows = []
        for v in range(n):
            idx = nbrs[v]
            if aggregator == "mean":
                m = (h[idx].mean(0) if idx else torch.zeros(f_in, dtype=h.dtype))
            elif aggregator == "gcn":
                s = h[idx].sum(0) if idx else torch.zeros(f_in, dtype=h.dtype)
                m = (s + h[v]) / (len(idx) + 1.0)
            else:  # pool
                m = (pre[idx].max(0).values if idx
                     else torch.zeros(f_in, dtype=h.dtype))
            rows.append(m)
        h_n = torch.stack(rows)
        if aggregator == "gcn":
            out = h_n @ p["w_neigh"] + p["bias"]
        else:
            out = h @ p["w_self"] + h_n @ p["w_neigh"] + p["bias"]
        h = out if last else torch.relu(out)
    return h


@pytest.mark.parametrize("aggregator", ["mean", "gcn", "pool"])
def test_sage_stack_matches_independent_torch_oracle(aggregator):
    rng = np.random.default_rng(11)
    n = 41
    feats, src, dst, labels = random_graph(rng, n, avg_deg=5, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(20, [16, 16], 4, aggregator)
    params = model.init(jax.random.PRNGKey(3))
    R = rng.normal(size=(n, 4))

    def jax_loss(params):
        out = model.apply(params, g)[0, :n]
        return jnp.sum(out * jnp.asarray(R, jnp.float32))

    jax_out = np.asarray(model.apply(params, g)[0, :n])
    jax_grads = jax.grad(jax_loss)(params)

    tparams = [{k: _t(v, grad=True) for k, v in lp.items()} for lp in params]
    nbrs = _nbr_lists(n, src, dst)
    t_out = torch_sage_forward(tparams, _t(feats), nbrs, aggregator)
    np.testing.assert_allclose(jax_out, t_out.detach().numpy(),
                               rtol=1e-4, atol=1e-4)

    (t_out * _t(R)).sum().backward()
    for lp_j, lp_t in zip(jax_grads, tparams):
        for k in lp_j:
            np.testing.assert_allclose(
                np.asarray(lp_j[k]), lp_t[k].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"{aggregator}/{k}")


# ---------------------------------------------------------------- GAT oracle
def torch_gat_forward(tparams, h, nbrs, specs, neg_slope=0.2):
    """Full GAT stack in torch: per-node edge softmax loops."""
    n = h.shape[0]
    n_layers = len(specs)
    for i, (p, (f_in, f_out, heads, residual)) in enumerate(zip(tparams, specs)):
        last = i == n_layers - 1
        z = (h @ p["w"]).reshape(n, heads, f_out)
        el = (z * p["attn_l"]).sum(-1)   # [n, heads]
        er = (z * p["attn_r"]).sum(-1)
        rows = []
        for v in range(n):
            idx = nbrs[v]
            if not idx:
                rows.append(torch.zeros(heads, f_out, dtype=h.dtype))
                continue
            e = torch.nn.functional.leaky_relu(
                el[idx] + er[v][None, :], negative_slope=neg_slope
            )                              # [deg, heads]
            alpha = torch.softmax(e, dim=0)
            rows.append(torch.einsum("dh,dhf->hf", alpha, z[idx]))
        out = torch.stack(rows)            # [n, heads, f_out]
        if residual:
            res = (h @ p["w_res"] if "w_res" in p else h).reshape(n, heads, f_out)
            out = out + res
        out = out + p["bias"].reshape(heads, f_out)
        if last:
            h = out.mean(1)                # mean heads -> [n, classes]
        else:
            h = torch.nn.functional.elu(out).reshape(n, heads * f_out)
    return h


def test_gat_stack_matches_independent_torch_oracle():
    rng = np.random.default_rng(12)
    n = 37
    feats, src, dst, labels = random_graph(rng, n, avg_deg=5, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    model = GAT(20, [12, 12], 4, heads=[3, 2], residuals=[False, True])
    params = model.init(jax.random.PRNGKey(4))
    R = rng.normal(size=(n, 4))

    def jax_loss(params):
        out = model.apply(params, g)[0, :n]
        return jnp.sum(out * jnp.asarray(R, jnp.float32))

    jax_out = np.asarray(model.apply(params, g)[0, :n])
    jax_grads = jax.grad(jax_loss)(params)

    tparams = [{k: _t(v, grad=True) for k, v in lp.items()} for lp in params]
    nbrs = _nbr_lists(n, src, dst)
    t_out = torch_gat_forward(tparams, _t(feats), nbrs, model.specs)
    np.testing.assert_allclose(jax_out, t_out.detach().numpy(),
                               rtol=1e-4, atol=1e-4)

    (t_out * _t(R)).sum().backward()
    for li, (lp_j, lp_t) in enumerate(zip(jax_grads, tparams)):
        for k in lp_j:
            np.testing.assert_allclose(
                np.asarray(lp_j[k]), lp_t[k].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"layer{li}/{k}")


def test_gat_residual_identity_when_dims_match():
    """DGL uses an identity residual when in_feats == heads*out_feats; the
    torch oracle and the jax layer must agree on that case too."""
    rng = np.random.default_rng(13)
    n = 23
    feats, src, dst, labels = random_graph(rng, n, avg_deg=4, f_dim=24)
    g = graph_from_arrays(feats, src, dst, labels)
    # layer 2: in = 12*2 = 24 = heads*out = 2*12 -> identity residual
    model = GAT(24, [12, 12], 4, heads=[2, 2], residuals=[False, True])
    params = model.init(jax.random.PRNGKey(5))
    assert "w_res" not in params[1]
    jax_out = np.asarray(model.apply(params, g)[0, :n])
    tparams = [{k: _t(v) for k, v in lp.items()} for lp in params]
    t_out = torch_gat_forward(tparams, _t(feats), _nbr_lists(n, src, dst),
                              model.specs)
    np.testing.assert_allclose(jax_out, t_out.numpy(), rtol=1e-4, atol=1e-4)
