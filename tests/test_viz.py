"""Visualization: overlays, colormaps, slice plot CLI (headless)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from gnn_tumor_seg_tpu.viz.helpers import (cluster_cmap, label_cmap, label_lut,
                                           overlay_labels)
from gnn_tumor_seg_tpu.viz.volume_viewer import multi_slice_viewer


def test_overlay_paints_classes():
    base = np.zeros((8, 8, 4), np.float32)
    labels = np.zeros((8, 8, 4), np.int16)
    labels[2, 2, 1] = 4  # ET in BraTS space
    lut = label_lut(False)
    rgb = overlay_labels(base, labels, lut)
    assert rgb.shape == (8, 8, 4, 3)
    np.testing.assert_allclose(rgb[2, 2, 1], lut[4])
    np.testing.assert_allclose(rgb[0, 0, 0], 0.0)


def test_cmaps_construct():
    cm, lut = label_cmap(True)
    assert lut.shape == (4, 3)
    sv = np.arange(12).reshape(3, 4) - 1
    assert cluster_cmap(sv, seed=0) is not None


def test_volume_viewer_headless_scroll():
    vols = [{"arr": np.random.default_rng(0).random((6, 6, 5)), "cmap": "gray",
             "stride": 1, "title": f"v{i}"} for i in range(3)]
    fig = multi_slice_viewer(vols, show=False)
    ax = [a for a in fig.axes if hasattr(a, "volume")][0]
    start = ax.index

    class FakeEvent:
        def __init__(self, key, canvas):
            self.key = key
            self.canvas = canvas

    from gnn_tumor_seg_tpu.viz import volume_viewer

    volume_viewer._process_key(FakeEvent("k", fig.canvas))
    assert ax.index == (start + 1) % 5
    volume_viewer._process_key(FakeEvent("j", fig.canvas))
    assert ax.index == start


def test_plot_slices_cli_saves(tmp_path):
    from gnn_tumor_seg_tpu.cli import plot_pred_slices
    from gnn_tumor_seg_tpu.data import nifti

    rng = np.random.default_rng(1)
    case = tmp_path / "raw" / "case1"
    case.mkdir(parents=True)
    for ext in ("_flair.nii.gz", "_t1ce.nii.gz"):
        nifti.write_nifti(rng.random((240, 240, 155)).astype(np.float32),
                          str(case / f"case1{ext}"))
    nifti.write_nifti(rng.choice([0, 1, 2, 4], (240, 240, 155)).astype(np.int16),
                      str(case / "case1_seg.nii.gz"))
    seg = tmp_path / "preds"
    seg.mkdir()
    nifti.write_nifti(rng.choice([0, 1, 2, 4], (240, 240, 155)).astype(np.int16),
                      str(seg / "case1.nii.gz"))
    out = tmp_path / "fig.png"
    plot_pred_slices.main([
        "-d", str(tmp_path / "raw"), "-s", str(seg), "-i", "case1",
        "-l", "--save", str(out),
    ])
    assert out.exists() and out.stat().st_size > 1000
