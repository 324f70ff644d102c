"""Robustness coverage: CNN trainer edge cases, config serialization, sweep
parsing, checkpoint manifest."""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.config import (HyperParams, hardcoded_hyperparameters,
                                      random_hyperparameters)
from gnn_tumor_seg_tpu.data import nifti
from gnn_tumor_seg_tpu.data.dataset import PredLogitDataset
from gnn_tumor_seg_tpu.train.cnn_trainer import CNNTrainer, pad_to_bucket


class _TinyImages:
    """Minimal image-dataset stub: 2 samples, one missing its logit file."""

    def __init__(self, tmp):
        self.ids = ["a", "b"]
        rng = np.random.default_rng(0)
        self._img = {i: rng.normal(size=(12, 10, 8, 4)).astype(np.float32)
                     for i in self.ids}
        self._lab = {i: rng.integers(0, 4, (12, 10, 8)).astype(np.int16)
                     for i in self.ids}
        # logits exist only for 'a'
        logits = np.zeros((12, 10, 8, 4), np.float32)
        logits[4:8, 3:7, 2:6, 2] = 5.0  # predicted tumor blob
        nifti.save_as_nifti(logits, str(tmp / "a_logits.nii.gz"))

    def get_image(self, i):
        return self._img[i]

    def get_voxel_labels(self, i):
        return self._lab[i]


def test_cnn_trainer_skips_missing_logits(tmp_path):
    hp = HyperParams(n_epochs=1, in_feats=8, layer_sizes=[4], lr=1e-3,
                     class_weights=[0.1, 5, 15, 15], batch_size=1)
    imgs = _TinyImages(tmp_path)
    trainer = CNNTrainer(hp, imgs, PredLogitDataset(str(tmp_path)), seed=0)
    loss = trainer.run_epoch()   # sample 'b' skipped (cnn_model.py:40-43 semantics)
    assert np.isfinite(loss)
    metrics = trainer.evaluate()
    assert metrics.shape == (7,)
    assert np.isfinite(metrics).all()


def test_cnn_prep_cache_matches_decode_path(tmp_path, monkeypatch):
    """Epochs served from the device-resident prepared-sample cache must be
    bit-identical to re-decoding from disk every epoch (and the cache must
    actually be hit from epoch 2 on)."""
    hp = HyperParams(n_epochs=1, in_feats=8, layer_sizes=[4], lr=1e-3,
                     class_weights=[0.1, 5, 15, 15], batch_size=1)

    def losses_with(cache_mb):
        monkeypatch.setenv("GTS_CNN_PREP_CACHE_MB", cache_mb)
        imgs = _TinyImages(tmp_path)
        trainer = CNNTrainer(hp, imgs, PredLogitDataset(str(tmp_path)), seed=0)
        out = [trainer.run_epoch() for _ in range(3)]
        return trainer, out

    t_off, off = losses_with("0")
    t_on, on = losses_with("64")
    assert t_off._prep_cache is None
    assert t_on._prep_cache is not None and len(t_on._prep_cache) == 1
    np.testing.assert_array_equal(np.asarray(off), np.asarray(on))


def test_pad_to_bucket_replicates_edges():
    vol = np.arange(5 * 6 * 7 * 2, dtype=np.float32).reshape(5, 6, 7, 2)
    padded, mask = pad_to_bucket(vol, bucket=8)
    assert padded.shape == (8, 8, 8, 2)
    assert mask.sum() == 5 * 6 * 7
    np.testing.assert_array_equal(padded[5], padded[4])  # edge replication
    np.testing.assert_array_equal(padded[:, 6], padded[:, 5])


def test_hyperparams_json_roundtrip():
    hp = hardcoded_hyperparameters("GAT")
    hp2 = HyperParams.from_json(hp.to_json())
    assert hp2.layer_sizes == hp.layer_sizes
    assert hp2.gat_heads == hp.gat_heads
    # unknown keys are ignored (forward compatibility)
    hp3 = HyperParams.from_json('{"lr": 0.5, "not_a_field": 1}')
    assert hp3.lr == 0.5


def test_random_hyperparams_reproducible_with_seed():
    a = random_hyperparameters("GNN", seed=7)
    b = random_hyperparameters("GNN", seed=7)
    assert a.to_json() == b.to_json()
    assert a.n_epochs in (300, 400, 500)  # real values, not the debug 3
    cnn = random_hyperparameters("CNN", seed=7)
    assert cnn.n_epochs in (50, 100, 150)


def test_random_hyperparams_time_seed_never_crashes(monkeypatch):
    """Property test for the fixed time-seeding (the reference's
    `int(str(time.time())[-3:])` crashes whenever the last 3 repr chars
    include the decimal point, `hyperparam_helpers.py:50`; here the seed is
    `time_ns() % 1000`). Sweep adversarial clock values, including ones whose
    float repr would have broken the old expression (e.g. ...0.1, ...5.25)."""
    import gnn_tumor_seg_tpu.config as config_mod

    adversarial_ns = [
        0, 1, 999, 1000,
        int(1700000000.1e9),      # float repr ends "0.1" -> old code crashed
        int(1700000005.25e9),     # ends ".25"
        int(1699999999.5e9),
        1755500000_000_000_000,
    ] + [1700000000_000_000_000 + i * 123456789 for i in range(50)]
    for ns in adversarial_ns:
        monkeypatch.setattr(config_mod.time, "time_ns", lambda ns=ns: ns)
        hp = random_hyperparameters("GNN")  # must not raise
        assert hp.n_epochs in (300, 400, 500)


def test_sweep_progress_parsing(tmp_path):
    from gnn_tumor_seg_tpu.cli.sweep import parse_progress_file, score_trial

    fp = tmp_path / "run.txt"
    fp.write_text(
        "----Model Parameters----\nModel\tGS\n"
        "Fold\tLoss\tWT_Dice\tCT_Dice\tET_Dice\n\n"
        "r_f1_train\t0.5\t0.9\t0.8\t0.7\n"
        "r_f1_val\t0.6\t0.85\t0.7\t0.6\n"
        "r_f2_val\t0.7\t0.75\t0.6\t0.5\n"
    )
    rows = parse_progress_file(str(fp))
    assert len(rows) == 3
    assert score_trial(str(fp)) == pytest.approx(0.8)  # mean of val WT dices


def test_checkpoint_manifest_fields(tmp_path):
    import jax

    from gnn_tumor_seg_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": np.ones((3, 2), np.float32)}
    hp = HyperParams()
    save_checkpoint(str(tmp_path / "x.ckpt"), params, "GSpool", hp,
                    extra={"epoch": 5})
    leaves, mt, hp2, manifest = load_checkpoint(str(tmp_path / "x.ckpt"))
    assert mt == "GSpool"
    assert manifest["extra"]["epoch"] == 5
    assert manifest["format_version"] == 1
