"""Tiled (Pallas) aggregation vs the reference ops — interpret mode on CPU;
the same kernels compile for TPU (verified on hardware, see bench history).

Under GTS_PALLAS_PRECISION=fast the kernels intentionally round values to bf16
(~2^-8 rel, standard bf16-training numerics), so parity tolerances widen."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_tumor_seg_tpu.ops.pallas.precision import fast_precision

# resolved via the same path the kernels use (set_precision_mode / env), so the
# oracle+tolerance selection can never desync from actual kernel behavior
_FAST = fast_precision()


def _tol(exact: float) -> dict:
    t = max(exact, 5e-2) if _FAST else exact
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
from gnn_tumor_seg_tpu.data.synthetic import random_graph


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
    want = ref(_ref_input(vals), _ref_input(wts))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               **_tol(0.003))
    # vjp with a shared (rounded, in fast mode) cotangent — see _ref_input
    _, vjp_t = jax.vjp(lambda v, w: tiled_weighted_sum(v, w, g.tiled, g.nbr_mask),
                       vals, wts)
    _, vjp_r = jax.vjp(lambda v, w: ref(_ref_input(v), _ref_input(w)), vals, wts)
    ct = _ref_input(2.0 * want)
    gv1, gw1 = vjp_t(ct)
    gv2, gw2 = vjp_r(ct)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), **_tol(0.005))
    m = np.asarray(g.nbr_mask)[..., None]
    np.testing.assert_allclose(np.asarray(gw1) * m, np.asarray(gw2) * m,
                               **_tol(0.005))


@pytest.mark.skipif(_FAST, reason="fast mode: bf16 rounding compounds across "
                    "layers; covered by op-level rounded-oracle tests + e2e")
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


def test_fused_gat_attention_matches_dense():
    from gnn_tumor_seg_tpu.ops.pallas.fused_gat import fused_gat_attention

    g = _batch(seed=21)
    rng = np.random.default_rng(22)
    B, N, D = g.nbr.shape
    H, F = 3, 16
    z = jnp.asarray(rng.normal(size=(B, N, H, F)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    slope = 0.2

    def ref(z, el, er):
        z, el, er = _ref_input(z), _ref_input(el), _ref_input(er)
        gather = jax.vmap(lambda a, i: a[i])
        el_src = gather(el, g.nbr)                       # [B, N, D, H]
        e = jax.nn.leaky_relu(el_src + er[:, :, None, :], slope)
        e = jnp.where(g.nbr_mask[..., None] > 0, e, -1e30)
        e = e - jax.lax.stop_gradient(jnp.max(e, axis=2, keepdims=True))
        w = jnp.exp(e) * g.nbr_mask[..., None]
        alpha = w / jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-20)
        zsrc = gather(z.reshape(B, N, H * F), g.nbr).reshape(B, N, D, H, F)
        return jnp.einsum("bndh,bndhf->bnhf", alpha, zsrc)

    want = ref(z, el, er)
    got = fused_gat_attention(z, el, er, g.tiled, g.nbr_mask, slope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tol(0.003))

    _, vjp_f = jax.vjp(lambda z, el, er: fused_gat_attention(
        z, el, er, g.tiled, g.nbr_mask, slope), z, el, er)
    _, vjp_r = jax.vjp(ref, z, el, er)
    ct = _ref_input(2.0 * want)
    for a, b, name in zip(vjp_f(ct), vjp_r(ct), ("dz", "del", "der")):
        a, b = np.asarray(a), np.asarray(b)
        if _FAST:
            # LeakyReLU' flips at bf16-rounded near-zero pre-activations are
            # legitimate subgradient ties in fast mode: bound the outliers
            t = _tol(0.005)
            bad = np.abs(a - b) > t["atol"] + t["rtol"] * np.abs(b)
            assert bad.mean() < 5e-3, (name, bad.sum(), a.size)
        else:
            np.testing.assert_allclose(a, b, err_msg=name, **_tol(0.005))


@pytest.mark.parametrize("op", ["sum", "mean"])
def test_edge_weighted_aggregation_pallas_matches_dense(op):
    """GraphBatch.edge_weight on the Pallas path (the GAT weighted-histogram
    kernel with alpha := edge weight) vs the dense weighted oracle — forward
    and both grads, under the active precision mode (VERDICT r2 item 6)."""
    rng = np.random.default_rng(17)
    graphs = []
    for s in range(2):
        feats, src, dst, labels = random_graph(rng, 220, avg_deg=6, f_dim=16)
        lo = np.minimum(src, dst).astype(np.float64)
        hi = np.maximum(src, dst).astype(np.float64)
        w = (0.1 + np.abs(np.sin(lo * 12.9898 + hi * 78.233))).astype(np.float32)
        graphs.append(graph_from_arrays(feats, src, dst, labels,
                                        edge_weights=w).with_tiled_aux())
    g = batch_graphs(graphs)
    h = jnp.asarray(np.random.default_rng(18).normal(size=g.feats.shape)
                    .astype(np.float32))

    def pallas_fn(h_, ew_):
        return aggregate_neighbors(h_, g.nbr, g.nbr_mask, op, impl="pallas",
                                   tiled=g.tiled, edge_weight=ew_)

    def dense_fn(h_, ew_):
        return aggregate_neighbors(_ref_input(h_), g.nbr, g.nbr_mask, op,
                                   impl="dense", edge_weight=_ref_input(ew_))

    got = pallas_fn(h, g.edge_weight)
    want = dense_fn(h, g.edge_weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **_tol(0.003))

    # grads wrt features AND weights through the kernel's custom VJP
    ct = _ref_input(2.0 * want)
    _, vjp_p = jax.vjp(pallas_fn, h, g.edge_weight)
    _, vjp_d = jax.vjp(dense_fn, h, g.edge_weight)
    gh_p, gw_p = vjp_p(ct)
    gh_d, gw_d = vjp_d(ct)
    np.testing.assert_allclose(np.asarray(gh_p), np.asarray(gh_d), **_tol(0.005))
    m = np.asarray(g.nbr_mask)
    # grad wrt the WEIGHTS (input data, never a training gradient — edge
    # weights are not parameters): for degree-1 nodes the weighted-mean
    # grad_w is an exact-zero cancellation <g, h_nbr - out>; the dense VJP
    # computes the cancelling form exactly, the fast-mode kernel computes the
    # two terms at bf16, leaving an O(bf16_eps * |g||h| / denom) residual
    gw_tol = ({"rtol": 5e-2, "atol": 0.5} if _FAST and op == "mean"
              else _tol(0.005))
    np.testing.assert_allclose(np.asarray(gw_p) * m, np.asarray(gw_d) * m,
                               **gw_tol)


def test_weighted_sage_model_pallas_matches_dense():
    """Model-level: a weighted-graph GSmean forward agrees pallas vs dense."""
    rng = np.random.default_rng(23)
    feats, src, dst, labels = random_graph(rng, 220, avg_deg=6, f_dim=16)
    lo = np.minimum(src, dst).astype(np.float64)
    hi = np.maximum(src, dst).astype(np.float64)
    w = (0.1 + np.abs(np.sin(lo * 3.33 + hi * 7.77))).astype(np.float32)
    g = graph_from_arrays(feats, src, dst, labels,
                          edge_weights=w).with_tiled_aux()
    model = GraphSage(16, [32, 32], 4, "mean")
    params = model.init(jax.random.PRNGKey(0))
    out_p = model.apply(params, g, train=False, impl="pallas")
    out_d = model.apply(params, g, train=False, impl="dense")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               **_tol(0.003))
