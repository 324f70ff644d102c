"""Native C++ kernels vs the numpy canonical implementations."""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.data import native
from gnn_tumor_seg_tpu.data.graph_build import (QUANTILES, segment_centroids,
                                                segment_mode, segment_quantiles)
from gnn_tumor_seg_tpu.data.slic import _init_grid, _relabel_contiguous, slic_supervoxels

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgts_native not built")


def test_segment_quantiles_parity():
    rng = np.random.default_rng(0)
    segs = rng.integers(0, 40, 20000).astype(np.int32)
    segs[segs == 39] = 0  # leave segment 39 empty
    vals = rng.normal(size=20000).astype(np.float32)
    a = segment_quantiles(vals, segs, 40)
    b = native.segment_quantiles_native(vals, segs, 40, QUANTILES)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_segment_mode_and_centroid_parity():
    rng = np.random.default_rng(1)
    segs = rng.integers(0, 30, 8000).astype(np.int32)
    labs = rng.integers(0, 4, 8000).astype(np.int16)
    np.testing.assert_array_equal(segment_mode(labs, segs, 30, 4),
                                  native.segment_mode_native(labs, segs, 30, 4))
    sv = rng.integers(0, 30, (20, 20, 20)).astype(np.int32)
    np.testing.assert_allclose(
        segment_centroids(sv.shape, sv.reshape(-1), 30),
        native.segment_centroids_native(sv, 30), atol=1e-3)


def test_native_slic_partition_identical_to_numpy():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(30, 30, 24, 2)).astype(np.float32)
    img[8:22, 8:22, 6:18] += 2.5
    lab_np = slic_supervoxels(img, n_segments=80, compactness=0.5,
                              enforce_connectivity=False, use_native=False)
    lab_nat = slic_supervoxels(img, n_segments=80, compactness=0.5,
                               enforce_connectivity=False, use_native=True)
    # identical partition structure (label ids may permute)
    pairs = set(zip(lab_np.reshape(-1).tolist(), lab_nat.reshape(-1).tolist()))
    assert len(pairs) == len(np.unique(lab_np))


def test_native_connectivity_enforced():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(20, 20, 20)).astype(np.float32)
    labels = slic_supervoxels(img, n_segments=27, compactness=0.5,
                              use_native=True)
    from scipy import ndimage
    for lab in np.unique(labels):
        _, ncomp = ndimage.label(labels == lab)
        assert ncomp == 1
    assert set(np.unique(labels)) == set(range(labels.max() + 1))


def test_native_connectivity_absorbs_constructed_fragments():
    """Direct absorb-phase check on constructed fragments (no SLIC): singleton
    and multi-voxel fragments, a fragment pocket that needs several erosion
    sweeps, and a fragment wider than one sweep's erosion depth."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    v = rng.integers(0, 4, (24, 24, 24)).astype(np.int32)
    # give each label a dominant block so "largest component" is unambiguous
    v[:12, :12, :] = 0
    v[:12, 12:, :] = 1
    v[12:, :12, :] = 2
    v[12:, 12:, :] = 3
    # fragments: a singleton, a 3-voxel bar, and a 4^3 cube of a foreign label
    v[2, 2, 2] = 3
    v[5, 5, 5:8] = 2
    v[14, 2:6, 2:6] = 1
    out = native.enforce_connectivity_native(v)
    for lab in np.unique(out):
        _, nc = ndimage.label(out == lab)
        assert nc == 1, f"label {lab} has {nc} components"
    # fragments were absorbed into *adjacent* labels, not teleported
    assert out[2, 2, 2] == 0
    assert np.all(out[5, 5, 5:8] == 0)
    assert np.all(out[14, 2:6, 2:6] == 2)


def test_native_knn_matches_numpy():
    from gnn_tumor_seg_tpu.data.graph_build import knn_adjacency_edges

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(120, 3)).astype(np.float32)
    s1, d1 = knn_adjacency_edges(pts, 7, use_native=False)
    s2, d2 = knn_adjacency_edges(pts, 7, use_native=True)
    assert set(zip(s1.tolist(), d1.tolist())) == set(zip(s2.tolist(), d2.tolist()))
