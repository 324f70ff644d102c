"""Data layer: NIfTI codec, SLIC, segment statistics, adjacency, stores, datasets."""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.data import nifti, store
from gnn_tumor_seg_tpu.data.graph_build import (
    GraphSample, build_graph_sample, contiguity_edges, knn_adjacency_edges,
    segment_centroids, segment_mode, segment_quantiles,
)
from gnn_tumor_seg_tpu.data.image import (
    determine_brain_crop, determine_tumor_crop, normalize_img,
    project_nodes_to_img, swap_labels_from_brats, swap_labels_to_brats,
    uncrop_to_brats_size,
)
from gnn_tumor_seg_tpu.data.slic import slic_supervoxels


# --------------------------------------------------------------------- nifti
@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
def test_nifti_roundtrip(tmp_path, ext, dtype):
    rng = np.random.default_rng(0)
    vol = (rng.normal(0, 50, (7, 9, 5)) if dtype == np.float32
           else rng.integers(0, 100, (7, 9, 5))).astype(dtype)
    fp = str(tmp_path / f"x{ext}")
    nifti.write_nifti(vol, fp)
    back, aff = nifti.read_nifti(fp, return_affine=True)
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(aff, nifti.BRATS_AFFINE)


def test_nifti_4d_roundtrip(tmp_path):
    vol = np.random.default_rng(1).normal(size=(6, 5, 4, 4)).astype(np.float32)
    fp = str(tmp_path / "x4d.nii.gz")
    nifti.write_nifti(vol, fp)
    np.testing.assert_array_equal(nifti.read_nifti(fp), vol)


def test_nifti_patient_sample_stack(tmp_path):
    d = tmp_path / "scan"
    d.mkdir()
    mods = ["_flair.nii.gz", "_t1.nii.gz"]
    vols = []
    for i, ext in enumerate(mods):
        v = np.full((4, 4, 3), i + 1, np.int16)
        vols.append(v)
        nifti.write_nifti(v, str(d / f"case{ext}"))
    nifti.write_nifti(np.ones((4, 4, 3), np.int16), str(d / "case_seg.nii.gz"))
    stack = nifti.read_in_patient_sample(str(d), mods)
    assert stack.shape == (4, 4, 3, 2)
    assert (stack[..., 0] == 1).all() and (stack[..., 1] == 2).all()
    labels = nifti.read_in_labels(str(d), "_seg.nii.gz")
    assert (labels == 1).all()


def test_nifti_rejects_garbage(tmp_path):
    fp = str(tmp_path / "bad.nii")
    with open(fp, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.read_nifti(fp)


# --------------------------------------------------------------------- image ops
def test_label_swap_roundtrip():
    rng = np.random.default_rng(2)
    brats = rng.choice([0, 1, 2, 4], size=(5, 5, 5)).astype(np.int16)
    back = swap_labels_to_brats(swap_labels_from_brats(brats))
    np.testing.assert_array_equal(back, brats)
    with pytest.raises(RuntimeError):
        swap_labels_from_brats(np.array([3]))
    with pytest.raises(RuntimeError):
        swap_labels_to_brats(np.array([4]))


def test_brain_crop_and_uncrop():
    vol = np.zeros((20, 20, 20, 2), np.float32)
    vol[5:15, 6:14, 7:13] = 1.0
    crop = determine_brain_crop(vol)
    assert vol[crop].shape == (10, 8, 6, 2)
    preds = np.ones((10, 8, 6), np.int16)
    full = uncrop_to_brats_size(crop, preds, shape=(20, 20, 20))
    assert full.sum() == 10 * 8 * 6
    assert full[5, 6, 7] == 1 and full[0, 0, 0] == 0


def test_tumor_crop_dilation_and_fallback():
    preds = np.zeros((10, 10, 10), np.int16)
    preds[4:6, 4:6, 4:6] = 2
    crop = determine_tumor_crop(preds)
    assert preds[crop].shape == (4, 4, 4)  # dilated by 1 each side
    empty = determine_tumor_crop(np.zeros((5, 5, 5), np.int16))
    assert np.zeros((5, 5, 5))[empty].shape == (5, 5, 5)


def test_projection_with_background():
    sv = np.array([[-1, 0], [1, 1]], np.int16)
    out = project_nodes_to_img(sv, np.array([7, 9]))
    np.testing.assert_array_equal(out, [[0, 7], [9, 9]])
    logits = project_nodes_to_img(sv, np.array([[1., 2.], [3., 4.]], np.float32))
    assert logits.shape == (2, 2, 2)
    np.testing.assert_array_equal(logits[0, 0], [0, 0])


# --------------------------------------------------------------------- segments
def test_segment_quantiles_matches_numpy():
    rng = np.random.default_rng(3)
    segs = rng.integers(0, 10, 500)
    vals = rng.normal(size=500).astype(np.float32)
    got = segment_quantiles(vals, segs, 12)
    for s in range(10):
        want = np.quantile(vals[segs == s], [0.1, 0.25, 0.5, 0.75, 0.9])
        np.testing.assert_allclose(got[s], want, rtol=1e-5, atol=1e-5)
    assert (got[10:] == 0).all()  # empty segments


def test_segment_mode_and_centroids():
    segs = np.array([0, 0, 0, 1, 1])
    vals = np.array([2, 2, 1, 0, 3])
    np.testing.assert_array_equal(segment_mode(vals, segs, 3, 4), [2, 0, 0])
    sv = np.zeros((2, 2, 1), np.int32)
    sv[1, :, 0] = 1
    cents = segment_centroids(sv.shape, sv.reshape(-1), 2)
    np.testing.assert_allclose(cents[0], [0, 0.5, 0])
    np.testing.assert_allclose(cents[1], [1, 0.5, 0])


def test_knn_adjacency_regularity():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(40, 3))
    src, dst = knn_adjacency_edges(pts, k=6)
    deg = np.bincount(dst, minlength=40)
    assert (deg >= 5).all() and np.median(deg) == 6  # nearly all exactly k
    assert (src != dst).all()  # no self loops in kNN mode
    # symmetric
    s = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in s for a, b in s)


def test_contiguity_edges_small_volume():
    part = np.array([[[0, 0], [1, 1]], [[2, 2], [1, 1]]], np.int16)
    src, dst = contiguity_edges(part, 3, self_loops=True)
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (0, 2) in pairs and (1, 2) in pairs
    assert (0, 0) in pairs and (1, 1) in pairs and (2, 2) in pairs


# --------------------------------------------------------------------- slic
def test_slic_partitions_reasonably():
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(24, 24, 24, 2)).astype(np.float32)
    vol[6:18, 6:18, 6:18] += 3.0
    labels = slic_supervoxels(vol, n_segments=64, compactness=1.0)
    assert labels.shape == (24, 24, 24)
    n = labels.max() + 1
    assert 20 <= n <= 100
    assert set(np.unique(labels)) == set(range(n))  # contiguous ids
    # higher compactness -> more regular: all segments non-trivial
    sizes = np.bincount(labels.reshape(-1))
    assert sizes.min() >= 8


def test_slic_connectivity_enforced():
    rng = np.random.default_rng(6)
    vol = rng.normal(size=(20, 20, 20)).astype(np.float32)
    labels = slic_supervoxels(vol, n_segments=27, compactness=0.5)
    from scipy import ndimage
    for lab in np.unique(labels):
        _, ncomp = ndimage.label(labels == lab)
        assert ncomp == 1, f"segment {lab} has {ncomp} components"


# --------------------------------------------------------------------- stores
def _sample():
    rng = np.random.default_rng(7)
    n = 30
    feats = rng.normal(size=(n, 20)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    src, dst = knn_adjacency_edges(rng.normal(size=(n, 3)), 4)
    return GraphSample(feats=feats, labels=labels,
                       centroids=rng.normal(size=(n, 3)).astype(np.float32),
                       src=src, dst=dst, sv_partition=None)


def test_graph_npz_roundtrip(tmp_path):
    s = _sample()
    fp = str(tmp_path / "g.npz")
    store.save_graph_npz(fp, s)
    back = store.load_graph_npz(fp)
    np.testing.assert_array_equal(back.feats, s.feats)
    np.testing.assert_array_equal(back.labels, s.labels)
    np.testing.assert_array_equal(back.src, s.src)
    n, d = store.peek_graph_npz(fp)
    assert n == 30 and d == np.bincount(s.dst, minlength=30).max()


def test_networkx_json_roundtrip(tmp_path):
    s = _sample()
    fp = str(tmp_path / "g_nxgraph.json")
    store.save_networkx_json(fp, s)
    back = store.load_networkx_json(fp)
    np.testing.assert_allclose(back.feats, s.feats, rtol=1e-6)
    np.testing.assert_array_equal(back.labels, s.labels)
    want = set(zip(s.src.tolist(), s.dst.tolist()))
    got = set(zip(back.src.tolist(), back.dst.tolist()))
    assert want == got


def test_networkx_json_reference_compatible(tmp_path):
    """Our JSON loads through networkx's own node_link_graph (the exact API the
    reference uses at graph_io.py:34-37)."""
    import json
    import networkx as nx

    s = _sample()
    fp = str(tmp_path / "g_nxgraph.json")
    store.save_networkx_json(fp, s)
    with open(fp) as f:
        # edges="links" = the key the reference era's networkx wrote/read
        G = nx.readwrite.json_graph.node_link_graph(json.load(f), edges="links")
    assert G.number_of_nodes() == s.n_nodes
    assert G.nodes[0]["label"] == int(s.labels[0])
    assert len(G.nodes[0]["features"]) == 20
    # undirected edge count: each pair once
    non_loop = (s.src != s.dst).sum() // 2 + (s.src == s.dst).sum()
    assert G.number_of_edges() == non_loop


# --------------------------------------------------------------------- metrics
def test_hd95_bbox_crop_is_exact():
    """The union-bbox crop must not change HD95 (both surfaces lie inside)."""
    from scipy import ndimage as ndi

    from gnn_tumor_seg_tpu import evaluation as ev

    rng = np.random.default_rng(20)
    for trial in range(5):
        a = np.zeros((60, 60, 40), bool)
        b = np.zeros((60, 60, 40), bool)
        ca, cb = rng.integers(15, 40, 3), rng.integers(15, 40, 3)
        grid = np.stack(np.meshgrid(*[np.arange(s) for s in a.shape],
                                    indexing="ij"), -1)
        a[np.linalg.norm(grid - ca, axis=-1) < rng.integers(5, 12)] = True
        b[np.linalg.norm(grid - cb, axis=-1) < rng.integers(5, 12)] = True

        def no_crop_hd95(p, g):
            d_pg = ev._surface_to_surface_distances(p, g)
            d_gp = ev._surface_to_surface_distances(g, p)
            return float(np.percentile(np.hstack((d_pg, d_gp)), 95))

        assert abs(ev.hd95(a, b) - no_crop_hd95(a, b)) < 1e-9


def test_hd95_fallback_constants():
    from gnn_tumor_seg_tpu import evaluation as ev

    empty = np.zeros((5, 5, 5), bool)
    blob = np.zeros((5, 5, 5), bool)
    blob[2, 2, 2] = True
    assert ev.hd95_safe(empty, empty) == 0.0
    assert ev.hd95_safe(blob, empty) == 300.0
    assert ev.hd95_safe(empty, blob) == 300.0
    assert ev.hd95_safe(blob, blob) == 0.0


def test_dice_empty_case_and_accuracy():
    from gnn_tumor_seg_tpu import evaluation as ev

    assert ev.dice_binary(np.zeros(5), np.zeros(5)) == 1.0
    pred = np.array([0, 1, 2, 3])
    gt = np.array([0, 1, 2, 2])
    assert ev.compute_accuracy(pred, gt) == 0.75
    assert ev.compute_accuracy(pred, gt, include_healthy=False) == pytest.approx(2 / 3)


def test_lru_bytes_cache_bounds_memory():
    from gnn_tumor_seg_tpu.data.cache import LRUBytesCache, pytree_nbytes

    item = {"a": np.zeros(1000, np.float32)}  # 4000 bytes
    assert pytree_nbytes(item) == 4000
    cache = LRUBytesCache(max_bytes=10_000)  # fits 2 items
    for i in range(5):
        cache.put(i, {"a": np.full(1000, i, np.float32)})
    assert cache.nbytes <= 10_000
    assert len(cache) == 2
    assert cache.get(0) is None and cache.get(4) is not None
    # LRU order: touching 3 keeps it alive over 4
    assert cache.get(3) is not None
    cache.put(5, item)
    assert cache.get(3) is not None and cache.get(4) is None
    # an oversize single value still caches (degrades, never errors)
    big = LRUBytesCache(max_bytes=100)
    big.put("x", item)
    assert big.get("x") is not None and len(big) == 1


def test_dataset_cache_eviction_returns_identical_graphs(tmp_path):
    from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset
    from gnn_tumor_seg_tpu.data.synthetic import random_graph

    from gnn_tumor_seg_tpu.data.graph_build import GraphSample

    rng = np.random.default_rng(0)
    for i in range(3):
        mri_id = f"s{i:02d}"
        d = tmp_path / mri_id
        d.mkdir()
        feats, src, dst, labels = random_graph(rng, 40, f_dim=6)
        sample = GraphSample(feats=feats, labels=labels,
                             centroids=rng.normal(size=(40, 3)).astype(np.float32),
                             src=src.astype(np.int32), dst=dst.astype(np.int32),
                             sv_partition=None)
        store.save_graph_npz(str(d / f"{mri_id}_graph.npz"), sample)
    # budget far below 3 graphs -> constant eviction; contents must not change
    ds = ImageGraphDataset(str(tmp_path), read_image=False, cache_bytes=1)
    first = [np.asarray(ds.get_graph(i).feats) for i in range(3)]
    assert len(ds._cache) <= 1
    again = [np.asarray(ds.get_graph(i).feats) for i in range(3)]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)


def test_trainer_graph_cache_is_bounded(monkeypatch):
    monkeypatch.setenv("GTS_GRAPH_CACHE_MB", "0.02")  # ~20 KB
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data.synthetic import SyntheticGraphDataset
    from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

    data = SyntheticGraphDataset(n_samples=4, grid=5, seed=0)
    hp = HyperParams(n_epochs=1, layer_sizes=[16], batch_size=2)
    trainer = GNNTrainer("GSpool", hp, data, seed=0, impl="pallas",
                         precision="exact")
    loss = trainer.run_epoch()
    assert np.isfinite(loss)
    assert trainer._graph_cache.nbytes <= trainer._graph_cache.max_bytes or \
        len(trainer._graph_cache) == 1


def test_weighted_graph_store_roundtrips_and_trains(tmp_path):
    """Weighted-adjacency capability (`mri2graph/graphgen.py:120-153`
    weighted=True): weights survive npz AND node-link JSON roundtrips, load
    into GraphBatch.edge_weight, and change GSmean's forward."""
    import jax
    from gnn_tumor_seg_tpu.data.graph_build import intensity_edge_weights
    from gnn_tumor_seg_tpu.data.synthetic import random_graph
    from gnn_tumor_seg_tpu.models.sage import GraphSage
    from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays

    rng = np.random.default_rng(30)
    feats, src, dst, labels = random_graph(rng, 35, f_dim=20)
    w = intensity_edge_weights(feats, src, dst)
    assert w.shape == src.shape and (w > 0).all() and (w <= 1).all()
    # symmetric: weight of (u,v) equals (v,u)
    lut = {(int(a), int(b)): float(x) for a, b, x in zip(src, dst, w)}
    assert all(abs(lut[(b, a)] - x) < 1e-6 for (a, b), x in lut.items())

    s = GraphSample(feats=feats, labels=labels,
                    centroids=rng.normal(size=(35, 3)).astype(np.float32),
                    src=src.astype(np.int32), dst=dst.astype(np.int32),
                    sv_partition=None, edge_weights=w)
    fp_npz = str(tmp_path / "g.npz")
    store.save_graph_npz(fp_npz, s)
    back = store.load_graph_npz(fp_npz)
    np.testing.assert_allclose(back.edge_weights, w, rtol=1e-6)

    fp_json = str(tmp_path / "g.json")
    store.save_networkx_json(fp_json, s)
    back_j = store.load_networkx_json(fp_json)
    lut_j = {(int(a), int(b)): float(x) for a, b, x in
             zip(back_j.src, back_j.dst, back_j.edge_weights)}
    assert all(abs(lut_j[k] - v) < 1e-5 for k, v in lut.items())

    g_w = graph_from_arrays(back.feats, back.src, back.dst, back.labels,
                            edge_weights=back.edge_weights)
    g_u = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(20, [8], 4, "mean")
    params = model.init(jax.random.PRNGKey(0))
    out_w = np.asarray(model.apply(params, g_w))
    out_u = np.asarray(model.apply(params, g_u))
    assert not np.allclose(out_w, out_u)  # weights actually consumed
    # and gradients flow
    grads = jax.grad(lambda p: float(0) + (model.apply(p, g_w) ** 2).sum())(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))


def test_device_preprocess_matches_host(tmp_path):
    """DataPreprocessor(prep_impl='device') produces artifacts matching the
    host path: bit-identical standardized volume, identical supervoxel
    partition (the device chain is bitwise-equal to host preprocessing in
    exact mode — test_slic_tpu.py), features within the affine-commutation
    tolerance, identical edges/labels."""
    from tests.test_pipeline_e2e import make_fake_brats_dir

    from gnn_tumor_seg_tpu.data import store
    from gnn_tumor_seg_tpu.data.preprocess import DataPreprocessor

    raw = tmp_path / "raw"
    make_fake_brats_dir(raw, n_samples=1, seed=44)

    outs = {}
    for impl in ("host", "device"):
        out = tmp_path / f"out_{impl}"
        kw = {}
        if impl == "device":
            kw = dict(prep_impl="device", pad_shape=None)
        else:
            # pin the host path to the TPU-SLIC backend so the partitions are
            # comparable (the device path's SLIC is the ops/slic_tpu chain)
            from gnn_tumor_seg_tpu.cli.common import resolve_slic_fn

            kw = dict(slic_fn=resolve_slic_fn("tpu", pad_shape=None))
        pre = DataPreprocessor(str(raw), str(out), num_nodes=250,
                               num_neighbors=6, boxiness=0.5,
                               label_extension="_seg.nii.gz", n_threads=1,
                               **kw)
        done = pre.run()
        assert len(done) == 1
        sid = done[0]
        d = out / sid
        outs[impl] = {
            "input": nifti.read_nifti(str(d / f"{sid}_input.nii.gz"),
                                      np.float32),
            "sv": nifti.read_nifti(str(d / f"{sid}_supervoxels.nii.gz"),
                                   np.int16),
            "label": nifti.read_nifti(str(d / f"{sid}_label.nii.gz"),
                                      np.int16),
            "sample": store.load_graph_npz(str(d / f"{sid}_graph.npz")),
        }

    h, dv = outs["host"], outs["device"]
    assert np.array_equal(h["input"], dv["input"])      # bitwise standardized
    assert np.array_equal(h["sv"], dv["sv"])
    assert np.array_equal(h["label"], dv["label"])
    np.testing.assert_allclose(dv["sample"].feats, h["sample"].feats,
                               atol=3e-5)
    assert np.array_equal(h["sample"].src, dv["sample"].src)
    assert np.array_equal(h["sample"].dst, dv["sample"].dst)
    assert np.array_equal(h["sample"].labels, dv["sample"].labels)


def test_hd95_bbox_crop_exact_on_random_and_edge_masks():
    """Property test (VERDICT r4 item 9): the union-bbox crop is exact for
    arbitrary mask shapes — thresholded-noise soup, masks touching the volume
    faces (clamp branches), and single-voxel masks — not only interior
    spheres."""
    from scipy import ndimage as ndi

    from gnn_tumor_seg_tpu import evaluation as ev

    def no_crop_hd95(p, g):
        d_pg = ev._surface_to_surface_distances(p, g)
        d_gp = ev._surface_to_surface_distances(g, p)
        return float(np.percentile(np.hstack((d_pg, d_gp)), 95))

    rng = np.random.default_rng(21)
    shape = (40, 33, 27)
    for trial in range(12):
        kind = trial % 3
        if kind == 0:       # smoothed-noise soup (irregular, multi-component)
            a = ndi.gaussian_filter(rng.normal(size=shape), 2) > 0.12
            b = ndi.gaussian_filter(rng.normal(size=shape), 2) > 0.12
        elif kind == 1:     # boxes clamped against the volume faces
            a = np.zeros(shape, bool)
            b = np.zeros(shape, bool)
            a[:rng.integers(2, 10), :rng.integers(2, 12), -rng.integers(2, 8):] = True
            b[-rng.integers(2, 10):, :rng.integers(2, 12), :rng.integers(2, 8)] = True
        else:               # single voxels, incl. corners
            a = np.zeros(shape, bool)
            b = np.zeros(shape, bool)
            a[0, 0, 0] = True
            b[tuple(rng.integers(0, s) for s in shape)] = True
        if not (a.any() and b.any()):
            continue
        assert abs(ev.hd95(a, b) - no_crop_hd95(a, b)) < 1e-9, (trial, kind)
