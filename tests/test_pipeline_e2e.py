"""End-to-end smoke: synthetic BraTS-style MRI dir -> preprocess -> dataset ->
GNN training -> prediction export contracts (SURVEY §4 planned smoke)."""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.config import HyperParams
from gnn_tumor_seg_tpu.data import nifti
from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset, PredLogitDataset
from gnn_tumor_seg_tpu.data.preprocess import DataPreprocessor
from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

SHAPE = (32, 32, 24)


def make_fake_brats_dir(root, n_samples=2, with_labels=True, seed=0):
    """Tiny BraTS-like dataset: 4 modalities + seg with labels {0,1,2,4}."""
    rng = np.random.default_rng(seed)
    for i in range(n_samples):
        d = root / f"BraTS_fake_{i:03d}"
        d.mkdir(parents=True)
        # brain = bright ellipsoid in a dark volume; tumor = inner sphere
        grid = np.stack(np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij"), -1)
        center = np.array(SHAPE) / 2 + rng.integers(-2, 3, 3)
        r = np.linalg.norm((grid - center) / (np.array(SHAPE) / 2.5), axis=-1)
        brain = r < 1.0
        tumor_r = np.linalg.norm(grid - center, axis=-1)
        labels = np.zeros(SHAPE, np.int16)
        labels[(tumor_r < 8) & brain] = 2
        labels[(tumor_r < 5) & brain] = 1
        labels[(tumor_r < 3) & brain] = 4
        for m, ext in enumerate(["_flair.nii.gz", "_t1.nii.gz",
                                 "_t1ce.nii.gz", "_t2.nii.gz"]):
            vol = np.zeros(SHAPE, np.int16)
            base = 200 + 50 * m
            vol[brain] = base + rng.integers(0, 30, brain.sum())
            vol[labels > 0] += 150 + 40 * m  # tumor contrast
            nifti.write_nifti(vol, str(d / f"case{ext}"))
        if with_labels:
            nifti.write_nifti(labels, str(d / "case_seg.nii.gz"))


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    raw = tmp_path_factory.mktemp("raw")
    out = tmp_path_factory.mktemp("processed")
    make_fake_brats_dir(raw, n_samples=2)
    pre = DataPreprocessor(
        str(raw), str(out), num_nodes=250, num_neighbors=6, boxiness=0.5,
        label_extension="_seg.nii.gz", save_json=True, n_threads=2,
    )
    done = pre.run()
    assert len(done) == 2
    return out


def test_preprocess_artifacts(preprocessed):
    import os
    sample_dirs = sorted(os.listdir(preprocessed))
    assert len(sample_dirs) == 2
    d = preprocessed / sample_dirs[0]
    sid = sample_dirs[0]
    for suffix in ("_input.nii.gz", "_label.nii.gz", "_supervoxels.nii.gz",
                   "_crop.npy", "_graph.npz", "_nxgraph.json"):
        assert (d / f"{sid}{suffix}").exists(), suffix
    sv = nifti.read_nifti(str(d / f"{sid}_supervoxels.nii.gz"), np.int16)
    assert sv.min() == -1  # background supervoxels dropped
    labels = nifti.read_nifti(str(d / f"{sid}_label.nii.gz"), np.int16)
    assert set(np.unique(labels)) <= {0, 1, 2, 3}  # BraTS 4 remapped to 3


def test_preprocess_contiguity_mode(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "proc"
    make_fake_brats_dir(raw, n_samples=1, seed=3)
    pre = DataPreprocessor(
        str(raw), str(out), num_nodes=150, num_neighbors=0,  # 0 -> contiguity
        label_extension="_seg.nii.gz", n_threads=1,
    )
    assert len(pre.run()) == 1
    ds = ImageGraphDataset(str(out))
    g = ds.get_graph(0)
    # contiguity mode adds self-loops (graphgen.py:189)
    nbr = np.asarray(g.nbr[0])
    mask = np.asarray(g.nbr_mask[0]) > 0
    n = int(g.n_nodes[0])
    has_self = [(nbr[v][mask[v]] == v).any() for v in range(n)]
    assert all(has_self)


def test_dataset_and_training_on_preprocessed(preprocessed):
    ds = ImageGraphDataset(str(preprocessed))
    assert len(ds) == 2
    g = ds.get_graph(0)
    assert g.feats.shape[-1] == 20  # 5 quantiles x 4 modalities
    assert g.labels is not None
    hp = HyperParams(n_epochs=2, layer_sizes=[16], lr=3e-3, batch_size=2)
    tr = GNNTrainer("GSmean", hp, ds, seed=0)
    l0 = tr.run_epoch()
    for _ in range(5):
        l1 = tr.run_epoch()
    assert l1 < l0
    metrics, counts = tr.evaluate(ds)
    assert np.isfinite(metrics).all()


def test_unlabelled_preprocess(tmp_path):
    """Deployment path: no label extension -> graphs without labels (predict-only),
    like the reference's test-time preprocessing (preprocess_dataset.py docstring)."""
    raw = tmp_path / "raw"
    out = tmp_path / "proc"
    make_fake_brats_dir(raw, n_samples=1, with_labels=False, seed=4)
    pre = DataPreprocessor(
        str(raw), str(out), num_nodes=150, num_neighbors=6,
        label_extension=None, n_threads=1,
    )
    assert len(pre.run()) == 1
    ds = ImageGraphDataset(str(out), read_label=False)
    g = ds.get_graph(0)
    assert g.labels is None


def test_pred_logit_dataset_missing_file(tmp_path):
    pl = PredLogitDataset(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        pl.get_one("nope")
