"""Torch state_dict import: shape inference, numerical parity, and the real
reference asset (`/root/reference/weights/provided_cnn_weights.pt`, 9-in/5-out
per SURVEY §2.2.2 — the shapes the reference's own loader cannot load)."""

import os

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from gnn_tumor_seg_tpu.cli.common import (load_cnn_from_checkpoint,
                                          load_gnn_from_checkpoint,
                                          node_logits_to_voxel_logits,
                                          predict_one_sample)
from gnn_tumor_seg_tpu.cli.import_torch_weights import import_torch_weights
from gnn_tumor_seg_tpu.data.synthetic import random_graph
from gnn_tumor_seg_tpu.models.gat import GAT
from gnn_tumor_seg_tpu.models.sage import GraphSage
from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays

_REF_CNN_PT = "/root/reference/weights/provided_cnn_weights.pt"


def _torch_cnn_state_dict(rng, in_ch=8, hidden=16, out=4):
    g = torch.Generator().manual_seed(int(rng.integers(1 << 30)))
    return {
        "conv_layers.0.weight": torch.randn(hidden, in_ch, 5, 5, 5, generator=g) * 0.1,
        "conv_layers.0.bias": torch.randn(hidden, generator=g) * 0.1,
        "conv_layers.1.weight": torch.randn(out, hidden, 5, 5, 5, generator=g) * 0.1,
        "conv_layers.1.bias": torch.randn(out, generator=g) * 0.1,
    }


def _torch_cnn_forward(sd, x_ncdhw):
    import torch.nn.functional as F

    h = F.pad(x_ncdhw, (2, 2, 2, 2, 2, 2), mode="replicate")
    h = F.conv3d(h, sd["conv_layers.0.weight"], sd["conv_layers.0.bias"])
    h = F.relu(h)
    h = F.pad(h, (2, 2, 2, 2, 2, 2), mode="replicate")
    return F.conv3d(h, sd["conv_layers.1.weight"], sd["conv_layers.1.bias"])


def test_cnn_import_roundtrip_parity(tmp_path):
    rng = np.random.default_rng(0)
    sd = _torch_cnn_state_dict(rng)
    pt = str(tmp_path / "cnn.pt")
    torch.save(sd, pt)
    ckpt = str(tmp_path / "cnn.ckpt")
    hp = import_torch_weights(pt, ckpt, "CNN")
    assert (hp.in_feats, hp.out_classes, hp.layer_sizes) == (8, 4, [16])

    _, _, hp2, forward = load_cnn_from_checkpoint(ckpt)
    assert hp2.in_feats == 8
    x = rng.normal(size=(1, 10, 9, 8, 8)).astype(np.float32)  # NDHWC
    got = np.asarray(forward(jax.numpy.asarray(x)))
    want = _torch_cnn_forward(
        sd, torch.tensor(x.transpose(0, 4, 1, 2, 3))
    ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cnn_import_cli(tmp_path):
    from gnn_tumor_seg_tpu.cli import import_torch_weights as cli

    sd = _torch_cnn_state_dict(np.random.default_rng(1), in_ch=6, hidden=4, out=3)
    pt = str(tmp_path / "c.pt")
    torch.save(sd, pt)
    out = str(tmp_path / "c.ckpt")
    cli.main(["-i", pt, "-o", out, "-t", "CNN"])
    _, _, hp, _ = load_cnn_from_checkpoint(out)
    assert (hp.in_feats, hp.out_classes, hp.layer_sizes) == (6, 3, [4])


@pytest.mark.skipif(not os.path.exists(_REF_CNN_PT),
                    reason="reference asset not mounted")
def test_reference_provided_cnn_weights_import_and_joint_predict(tmp_path):
    """The only pretrained asset the reference ships becomes usable: import it
    (9-in/5-out inferred) and run the full joint GNN->CNN chain with a 5-class
    GNN — which the reference itself cannot do (its loader hardcodes 8/4)."""
    ckpt = str(tmp_path / "ref_cnn.ckpt")
    hp = import_torch_weights(_REF_CNN_PT, ckpt, "CNN")
    assert (hp.in_feats, hp.out_classes, hp.layer_sizes) == (9, 5, [16])
    _, _, _, cnn_forward = load_cnn_from_checkpoint(ckpt)

    # a 5-class GNN so that img(4) + logits(5) = the CNN's 9 input channels
    rng = np.random.default_rng(2)
    n = 60
    feats, src, dst, labels = random_graph(rng, n, avg_deg=5, f_dim=20)
    graph = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(20, [16], 5, "pool")
    params = model.init(jax.random.PRNGKey(0))
    gnn_forward = jax.jit(lambda g: model.apply(params, g, train=False))

    side = 12
    sv = rng.integers(-1, n, size=(side, side, side)).astype(np.int16)
    img = rng.normal(size=(side, side, side, 4)).astype(np.float32)
    pred = predict_one_sample(gnn_forward, cnn_forward, graph, img, sv)
    assert pred.shape == (side, side, side)
    assert pred.min() >= 0 and pred.max() <= 4  # 5-class label space


def test_background_logits_widen_with_class_count():
    node_logits = np.zeros((3, 5), np.float32)
    sv = np.array([[-1, 0], [1, 2]], np.int16)
    out = node_logits_to_voxel_logits(node_logits, sv)
    assert out.shape == (2, 2, 5)
    np.testing.assert_array_equal(out[0, 0], [1, -1, -1, -1, -1])


@pytest.mark.parametrize("aggregator,model_type", [
    ("mean", "GSmean"), ("gcn", "GSgcn"), ("pool", "GSpool")])
def test_sage_import_matches_framework_forward(tmp_path, aggregator, model_type):
    """Build a DGL-named state_dict FROM framework params (the inverse
    mapping), import it, and require identical forwards."""
    rng = np.random.default_rng(3)
    model = GraphSage(20, [8, 8], 4, aggregator)
    params = model.init(jax.random.PRNGKey(1))
    sd = {}
    for i, lp in enumerate(params):
        sd[f"layers.{i}.fc_neigh.weight"] = torch.tensor(np.asarray(lp["w_neigh"]).T)
        sd[f"layers.{i}.bias"] = torch.tensor(np.asarray(lp["bias"]))
        if aggregator != "gcn":
            sd[f"layers.{i}.fc_self.weight"] = torch.tensor(np.asarray(lp["w_self"]).T)
        if aggregator == "pool":
            sd[f"layers.{i}.fc_pool.weight"] = torch.tensor(np.asarray(lp["w_pool"]).T)
            sd[f"layers.{i}.fc_pool.bias"] = torch.tensor(np.asarray(lp["b_pool"]))
    pt = str(tmp_path / "g.pt")
    torch.save(sd, pt)
    ckpt = str(tmp_path / "g.ckpt")
    hp = import_torch_weights(pt, ckpt, model_type)
    assert hp.layer_sizes == [8, 8] and hp.in_feats == 20 and hp.out_classes == 4

    feats, src, dst, labels = random_graph(rng, 30, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    want = np.asarray(model.apply(params, g))
    _, _, _, forward = load_gnn_from_checkpoint(ckpt)
    np.testing.assert_allclose(np.asarray(forward(g)), want, rtol=1e-5, atol=1e-5)


def test_gat_import_matches_framework_forward(tmp_path):
    rng = np.random.default_rng(4)
    model = GAT(20, [8, 8], 4, heads=[2, 2], residuals=[False, True])
    params = model.init(jax.random.PRNGKey(2))
    sd = {}
    for i, (lp, (fi, fo, heads, res)) in enumerate(zip(params, model.specs)):
        sd[f"layers.{i}.fc.weight"] = torch.tensor(np.asarray(lp["w"]).T)
        sd[f"layers.{i}.attn_l"] = torch.tensor(
            np.asarray(lp["attn_l"]).reshape(1, heads, fo))
        sd[f"layers.{i}.attn_r"] = torch.tensor(
            np.asarray(lp["attn_r"]).reshape(1, heads, fo))
        sd[f"layers.{i}.bias"] = torch.tensor(np.asarray(lp["bias"]))
        if "w_res" in lp:
            sd[f"layers.{i}.res_fc.weight"] = torch.tensor(np.asarray(lp["w_res"]).T)
    pt = str(tmp_path / "gat.pt")
    torch.save(sd, pt)
    ckpt = str(tmp_path / "gat.ckpt")
    # layer 1 residual is a projection (16 != 2*8? 16 == 16 -> identity!), so
    # pass residuals explicitly: identity residuals leave no state_dict trace
    hp = import_torch_weights(pt, ckpt, "GAT", gat_residuals=[False, True, False])
    assert hp.gat_heads == [2, 2] and hp.gat_residuals == [False, True]

    feats, src, dst, labels = random_graph(rng, 30, f_dim=20)
    g = graph_from_arrays(feats, src, dst, labels)
    want = np.asarray(model.apply(params, g))
    _, _, _, forward = load_gnn_from_checkpoint(ckpt)
    np.testing.assert_allclose(np.asarray(forward(g)), want, rtol=1e-5, atol=1e-5)
