"""Full 4-step CLI pipeline on a tiny synthetic dataset: preprocess -> train GNN
-> export logits -> train CNN -> joint predictions; plus the single-MRI
deployment contract. This is the integration test the reference never had."""

import os

import numpy as np
import pytest

from gnn_tumor_seg_tpu.cli import (generate_gnn_predictions,
                                   generate_joint_predictions, predict_single,
                                   preprocess, train_gnn, train_refinement_cnn)
from gnn_tumor_seg_tpu.data import nifti
from tests.test_pipeline_e2e import SHAPE, make_fake_brats_dir


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    raw = root / "raw"
    make_fake_brats_dir(raw, n_samples=3, seed=11)
    for d in ("proc", "logs", "logits", "preds"):
        (root / d).mkdir()
    return root


def test_step0_preprocess(workdir):
    preprocess.main([
        "-d", str(workdir / "raw"), "-o", str(workdir / "proc"),
        "-n", "250", "-k", "6", "-l", "_seg.nii.gz", "--threads", "2",
    ])
    assert len(os.listdir(workdir / "proc")) == 3


def test_step1_train_gnn(workdir, monkeypatch):
    # shrink the default configuration for CI speed
    from gnn_tumor_seg_tpu import config as cfg
    small = cfg.HyperParams(n_epochs=4, layer_sizes=[16, 16], lr=3e-3, batch_size=2)
    monkeypatch.setattr(train_gnn, "hardcoded_hyperparameters", lambda mt: small)
    train_gnn.main([
        "-d", str(workdir / "proc"), "-o", str(workdir / "logs"),
        "-r", "pipe_gnn", "-m", "GSpool", "-k", "1",
    ])
    assert (workdir / "logs" / "pipe_gnn_f1.ckpt").exists()
    progress = (workdir / "logs" / "pipe_gnn.txt").read_text()
    assert "pipe_gnn_full" in progress


def test_step2_generate_logits(workdir):
    generate_gnn_predictions.main([
        "-d", str(workdir / "proc"), "-o", str(workdir / "logits"),
        "-w", str(workdir / "logs" / "pipe_gnn_f1.ckpt"), "-f", "logits",
    ])
    files = os.listdir(workdir / "logits")
    assert len(files) == 3 and all(f.endswith("_logits.nii.gz") for f in files)
    logits = nifti.read_nifti(str(workdir / "logits" / files[0]), np.float32)
    assert logits.ndim == 4 and logits.shape[-1] == 4


def test_step3_train_cnn(workdir, monkeypatch):
    from gnn_tumor_seg_tpu import config as cfg
    small = cfg.HyperParams(n_epochs=2, in_feats=8, class_weights=[0.1, 5, 15, 15],
                            layer_sizes=[8], lr=1e-3, batch_size=1)
    monkeypatch.setattr(train_refinement_cnn, "hardcoded_hyperparameters",
                        lambda mt: small)
    train_refinement_cnn.main([
        "-d", str(workdir / "proc"), "-l", str(workdir / "logits"),
        "-o", str(workdir / "logs"), "-r", "pipe_cnn", "-k", "1",
    ])
    assert (workdir / "logs" / "pipe_cnn_f1.ckpt").exists()


def test_step4_joint_predictions(workdir):
    generate_joint_predictions.main([
        "-d", str(workdir / "proc"), "-o", str(workdir / "preds"),
        "-g", str(workdir / "logs" / "pipe_gnn_f1.ckpt"),
        "-c", str(workdir / "logs" / "pipe_cnn_f1.ckpt"),
    ])
    files = sorted(os.listdir(workdir / "preds"))
    assert len(files) == 3
    pred = nifti.read_nifti(str(workdir / "preds" / files[0]), np.int16)
    assert pred.shape == SHAPE  # uncropped to original size
    assert set(np.unique(pred)) <= {0, 1, 2, 4}  # BraTS label space


def test_gnn_pred_export_brats_space(workdir, tmp_path):
    generate_gnn_predictions.main([
        "-d", str(workdir / "proc"), "-o", str(tmp_path),
        "-w", str(workdir / "logs" / "pipe_gnn_f1.ckpt"), "-f", "preds",
    ])
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 3
    pred = nifti.read_nifti(str(tmp_path / files[0]), np.int16)
    assert pred.shape == SHAPE
    assert set(np.unique(pred)) <= {0, 1, 2, 4}


def test_single_mri_deployment_contract(workdir, tmp_path):
    """README.md:143-172 contract: modality files in, <id>.nii.gz out."""
    raw_case = next((workdir / "raw").iterdir())
    predict_single.main([
        "-i", str(raw_case), "-o", str(tmp_path),
        "-g", str(workdir / "logs" / "pipe_gnn_f1.ckpt"),
        "-c", str(workdir / "logs" / "pipe_cnn_f1.ckpt"),
        "-n", "250", "-k", "6",
    ])
    out = os.listdir(tmp_path)
    assert out == ["case.nii.gz"]
    pred = nifti.read_nifti(str(tmp_path / out[0]), np.int16)
    assert pred.shape == SHAPE
    assert set(np.unique(pred)) <= {0, 1, 2, 4}


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_device_cnn_prep_matches_host(workdir, mode):
    """predict_one_sample_device == predict_one_sample, bit-for-bit.

    The device path replaces the host voxel-gather/crop/edge-pad/upload with
    on-device gathers (cli/common.py:predict_one_sample_device); every step
    is an exact permutation/copy of the same values, so even fast (bf16)
    mode must agree exactly."""
    from gnn_tumor_seg_tpu.cli.common import (load_cnn_from_checkpoint,
                                              load_gnn_from_checkpoint)
    from gnn_tumor_seg_tpu.cli.predict_single import predict_single_mri
    from gnn_tumor_seg_tpu.ops.pallas.precision import precision_scope

    raw_case = next((workdir / "raw").iterdir())
    _, _, _, gfwd = load_gnn_from_checkpoint(
        str(workdir / "logs" / "pipe_gnn_f1.ckpt"))
    _, _, _, cfwd = load_cnn_from_checkpoint(
        str(workdir / "logs" / "pipe_cnn_f1.ckpt"))
    with precision_scope(mode):
        host = predict_single_mri(str(raw_case), gfwd, cfwd, num_nodes=250,
                                  num_neighbors=6, cnn_prep="host")
        dev_times = {}
        dev = predict_single_mri(str(raw_case), gfwd, cfwd, num_nodes=250,
                                 num_neighbors=6, cnn_prep="device",
                                 stage_times=dev_times)
    assert dev.shape == host.shape
    assert np.array_equal(dev, host)
    assert {"gnn_forward", "crop_and_prep", "cnn_forward",
            "cnn_crop_shape"} <= set(dev_times)


def test_warmup_cli_populates_cache(workdir, tmp_path, monkeypatch, capsys):
    """cli.warmup drives the real predict chain and fills the persistent
    compilation cache (the Dockerfile bakes this into the image)."""
    from gnn_tumor_seg_tpu.cli import warmup

    from gnn_tumor_seg_tpu.ops.pallas.precision import set_precision_mode

    orig_make = warmup.make_synthetic_brain
    monkeypatch.setenv("GTS_XLA_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(warmup, "make_synthetic_brain",
                        lambda **kw: orig_make(shape=(64, 64, 40)))
    try:
        warmup.main([
            "-g", str(workdir / "logs" / "pipe_gnn_f1.ckpt"),
            "-c", str(workdir / "logs" / "pipe_cnn_f1.ckpt"),
            "-n", "200",
        ])
    finally:
        set_precision_mode(None)  # warmup sets the process-global mode
    out = capsys.readouterr().out
    assert "persistent cache" in out
    # cache-entry presence is compile-time-gated (>=1 s), so on the fast CPU
    # backend the dir may legitimately stay empty — existence is enough here;
    # the real-TPU cache behavior is covered by BASELINE/CLAUDE notes
    assert os.path.isdir(tmp_path / "cache")


def test_bad_save_format_rejected(workdir):
    with pytest.raises(ValueError):
        generate_gnn_predictions.save_predictions(None, None, None, "bogus")
