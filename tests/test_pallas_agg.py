"""Tiled (Pallas) aggregation vs the reference ops — interpret mode on CPU;
the same kernels compile for TPU (verified on hardware, see bench history).

Under GTS_PALLAS_PRECISION=fast the kernels intentionally round values to bf16
(~2^-8 rel, standard bf16-training numerics), so parity tolerances widen."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

_FAST = os.environ.get("GTS_PALLAS_PRECISION", "exact") == "fast"


def _tol(exact: float) -> dict:
    t = max(exact, 3e-2) if _FAST else exact
    return {"rtol": t, "atol": t}


def _ref_input(h):
    """Reference-side input: in fast mode the kernels round values to bf16, so
    the oracle must see the same rounded values — otherwise max winner-flips at
    near-ties make pointwise comparison ill-posed."""
    if _FAST:
        return h.astype(jnp.bfloat16).astype(jnp.float32)
    return h

from gnn_tumor_seg_tpu.models.sage import GraphSage
from gnn_tumor_seg_tpu.ops.aggregate import aggregate_neighbors
from gnn_tumor_seg_tpu.ops.graph import batch_graphs, graph_from_arrays
from gnn_tumor_seg_tpu.ops.pallas.gather_agg import aggregate_neighbors_tiled
from gnn_tumor_seg_tpu.ops.pallas.tiling import build_tiled_aux
from tests.test_aggregate import random_graph


def _batch(n_graphs=2, n=220, avg_deg=6, f_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        feats, src, dst, labels = random_graph(rng, n, avg_deg=avg_deg, f_dim=f_dim)
        graphs.append(graph_from_arrays(feats, src, dst, labels).with_tiled_aux())
    return batch_graphs(graphs)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_tiled_forward_matches_reference(op):
    g = _batch()
    h = jnp.asarray(np.random.default_rng(1).normal(size=g.feats.shape)
                    .astype(np.float32))
    want = aggregate_neighbors(_ref_input(h), g.nbr, g.nbr_mask, op)
    got = aggregate_neighbors_tiled(h, g.tiled, g.nbr_mask, op)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **_tol(0.002))


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_tiled_gradient_matches_reference(op):
    g = _batch(seed=2)
    h = jnp.asarray(np.random.default_rng(3).normal(size=g.feats.shape)
                    .astype(np.float32))
    out_ref, vjp_ref = jax.vjp(
        lambda h: aggregate_neighbors(_ref_input(h), g.nbr, g.nbr_mask, op), h)
    _, vjp_tiled = jax.vjp(
        lambda h: aggregate_neighbors_tiled(h, g.tiled, g.nbr_mask, op), h)
    ct = 2.0 * out_ref
    # fast mode rounds the cotangent inside the kernel; the oracle must see the
    # same rounded cotangent or cancellation in the neighbor sum amplifies the
    # (legitimate) bf16 rounding into pointwise mismatches
    g1 = vjp_ref(_ref_input(ct))[0]
    g2 = vjp_tiled(ct)[0]
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               **_tol(0.005))


@pytest.mark.skipif(_FAST, reason="fast mode: pool-max winner flips at bf16 "
                    "near-ties make model-level pointwise parity ill-posed; "
                    "covered by op-level rounded-oracle tests + e2e dice")
def test_model_level_pallas_parity():
    g = _batch(seed=4, f_dim=20)
    m = GraphSage(20, [32, 32], 4, "pool")
    p = m.init(jax.random.PRNGKey(0))
    out_d = m.apply(p, g, impl="dense")
    out_p = m.apply(p, g, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               **_tol(0.005))
    gr_d = jax.grad(lambda p: (m.apply(p, g, impl="dense") ** 2).sum())(p)
    gr_p = jax.grad(lambda p: (m.apply(p, g, impl="pallas") ** 2).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(gr_d), jax.tree_util.tree_leaves(gr_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), **_tol(0.02))


def test_batch_rebuilds_aux_on_bucket_mismatch():
    rng = np.random.default_rng(5)
    graphs = []
    for n, deg in ((150, 4), (150, 12)):  # different degree buckets
        feats, src, dst, labels = random_graph(rng, n, avg_deg=deg, f_dim=8)
        graphs.append(graph_from_arrays(feats, src, dst, labels).with_tiled_aux())
    batch = batch_graphs(graphs)
    assert batch.tiled is not None  # rebuilt on the batched table
    h = jnp.asarray(rng.normal(size=batch.feats.shape).astype(np.float32))
    want = aggregate_neighbors(_ref_input(h), batch.nbr, batch.nbr_mask, "sum")
    got = aggregate_neighbors_tiled(h, batch.tiled, batch.nbr_mask, "sum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tol(0.002))


def test_rslot_is_consistent():
    g = _batch(n_graphs=1, seed=6)
    nbr = np.asarray(g.nbr[0])
    mask = np.asarray(g.nbr_mask[0]) > 0
    rslot = np.asarray(g.tiled.rslot[0])
    n = nbr.shape[0]
    for u in range(0, n, 17):
        for d in range(nbr.shape[1]):
            if not mask[u, d]:
                continue
            v = nbr[u, d]
            assert nbr[v, rslot[u, d]] == u  # u sits at rslot in v's list


def test_slot_gather_matches_reference():
    g = _batch(seed=7)
    rng = np.random.default_rng(8)
    from gnn_tumor_seg_tpu.ops.pallas.slot_gather import slot_gather

    x = jnp.asarray(rng.normal(size=(*g.feats.shape[:2], 8)).astype(np.float32))
    got = slot_gather(x, g.tiled, g.nbr_mask)
    want = jax.vmap(lambda a, i: a[i])(x, g.nbr) * g.nbr_mask[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tol(0.002))
    g1 = jax.grad(lambda x: (slot_gather(x, g.tiled, g.nbr_mask) ** 2).sum())(x)
    g2 = jax.grad(lambda x: ((jax.vmap(lambda a, i: a[i])(x, g.nbr)
                              * g.nbr_mask[..., None]) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), **_tol(0.003))


def test_weighted_sum_matches_reference():
    g = _batch(seed=9)
    from gnn_tumor_seg_tpu.ops.pallas.weighted_sum import tiled_weighted_sum

    rng = np.random.default_rng(10)
    B, N, D = g.nbr.shape
    H, F = 3, 16
    vals = jnp.asarray(rng.normal(size=(B, N, H, F)).astype(np.float32))
    wts = jnp.asarray(rng.normal(size=(B, N, D, H)).astype(np.float32))

    def ref(v, w):
        zsrc = jax.vmap(lambda a, i: a[i])(v.reshape(B, N, H * F), g.nbr)
        zsrc = zsrc.reshape(B, N, D, H, F)
        return jnp.einsum("bndh,bndhf->bnhf", w * g.nbr_mask[..., None], zsrc)

    got = tiled_weighted_sum(vals, wts, g.tiled, g.nbr_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(vals, wts)),
                               **_tol(0.003))
    gv1, gw1 = jax.grad(lambda v, w: (tiled_weighted_sum(v, w, g.tiled, g.nbr_mask) ** 2).sum(),
                        argnums=(0, 1))(vals, wts)
    gv2, gw2 = jax.grad(lambda v, w: (ref(v, w) ** 2).sum(), argnums=(0, 1))(vals, wts)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), **_tol(0.005))
    m = np.asarray(g.nbr_mask)[..., None]
    np.testing.assert_allclose(np.asarray(gw1) * m, np.asarray(gw2) * m,
                               **_tol(0.005))


def test_gat_model_pallas_parity():
    from gnn_tumor_seg_tpu.models.gat import GAT

    g = _batch(seed=11, f_dim=20)
    m = GAT(20, [8, 8], 4, heads=[3, 2], residuals=[False, True])
    p = m.init(jax.random.PRNGKey(0))
    o1 = m.apply(p, g)
    o2 = m.apply(p, g, impl="pallas")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), **_tol(0.005))
    gr1 = jax.grad(lambda p: (m.apply(p, g) ** 2).sum())(p)
    gr2 = jax.grad(lambda p: (m.apply(p, g, impl="pallas") ** 2).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(gr1), jax.tree_util.tree_leaves(gr2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), **_tol(0.02))


def test_sddmm_matches_dense():
    from gnn_tumor_seg_tpu.ops.sddmm import sddmm

    g = _batch(seed=14)
    rng = np.random.default_rng(15)
    B, N, D = g.nbr.shape
    H, F = 2, 16
    a = jnp.asarray(rng.normal(size=(B, N, H, F)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(B, N, H, F)).astype(np.float32))
    want = sddmm(a, c, g.nbr, g.nbr_mask)
    got = sddmm(a, c, g.nbr, g.nbr_mask, impl="pallas", tiled=g.tiled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **_tol(0.003))
