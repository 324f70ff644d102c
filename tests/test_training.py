"""End-to-end training slice: loss decreases, metrics computed, checkpoints round-trip.

Also pins loss/optimizer parity against torch (CrossEntropyLoss weighted-mean
normalization; AdamW + ExponentialLR trajectory).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_tumor_seg_tpu.config import HyperParams, hardcoded_hyperparameters
from gnn_tumor_seg_tpu.data.synthetic import SyntheticGraphDataset
from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer
from gnn_tumor_seg_tpu.train.losses import weighted_cross_entropy
from gnn_tumor_seg_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from gnn_tumor_seg_tpu.train.optim import make_train_state, apply_updates
from gnn_tumor_seg_tpu.train import folds


def small_hp(**kw):
    base = dict(n_epochs=3, layer_sizes=[32, 32], lr=3e-3, batch_size=4)
    base.update(kw)
    return HyperParams(**base)


def test_weighted_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 50)
    w = np.array([0.1, 1, 2, 2], np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(w)))
    want = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    assert abs(got - want) < 1e-5


def test_weighted_ce_mask_ignores_padding():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 10))
    w = jnp.asarray([0.1, 1, 2, 2], jnp.float32)
    full = weighted_cross_entropy(logits, labels, w)
    pad_logits = jnp.concatenate([logits, jnp.ones((5, 4)) * 100])
    pad_labels = jnp.concatenate([labels, jnp.full((5,), -1)])
    padded = weighted_cross_entropy(pad_logits, pad_labels, w)
    assert abs(float(full) - float(padded)) < 1e-6
    mask = jnp.concatenate([jnp.ones(10), jnp.zeros(5)])
    masked = weighted_cross_entropy(
        pad_logits, jnp.concatenate([labels, jnp.zeros(5, jnp.int32)]), w, mask
    )
    assert abs(float(full) - float(masked)) < 1e-6


def test_adamw_exp_decay_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    x = rng.normal(size=(7, 5)).astype(np.float32)
    y = rng.normal(size=(7, 3)).astype(np.float32)

    params = {"w": jnp.asarray(w0)}
    state, tx = make_train_state(params, lr=1e-2, lr_decay=0.9, w_decay=1e-2)

    def loss_fn(p):
        return jnp.mean((jnp.asarray(x) @ p["w"] - jnp.asarray(y)) ** 2)

    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.AdamW([wt], lr=1e-2, weight_decay=1e-2)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, 0.9)
    xt, yt = torch.tensor(x), torch.tensor(y)

    for epoch in range(3):
        for _ in range(2):  # 2 steps per epoch
            grads = jax.grad(loss_fn)(state.params)
            state = apply_updates(tx, state, grads)
            opt.zero_grad()
            ((xt @ wt - yt) ** 2).mean().backward()
            opt.step()
        state = state.next_epoch()
        sched.step()
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               wt.detach().numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type", ["GSpool", "GSmean", "GSgcn", "GAT"])
def test_training_loss_decreases(model_type):
    data = SyntheticGraphDataset(n_samples=6, grid=5, seed=3)
    hp = small_hp()
    if model_type == "GAT":
        hp.gat_heads = [2, 2]
        hp.gat_residuals = [False, True]
    trainer = GNNTrainer(model_type, hp, data, seed=0)
    first = trainer.run_epoch()
    for _ in range(4):
        last = trainer.run_epoch()
    assert last < first, (first, last)


def test_trainer_graph_cache_host_resident(tmp_path):
    """The per-sample loading path must never hold device arrays (nor read
    any back): graphs are cached as numpy and ship once per assembled batch.
    Guards the D2H-per-sample regression measured at 8-270 s/first-call
    through remote-attached chips (scripts/bench_host_pipeline.py)."""
    import jax

    from gnn_tumor_seg_tpu.data.dataset import ImageGraphDataset
    from gnn_tumor_seg_tpu.data.graph_build import GraphSample
    from gnn_tumor_seg_tpu.data.store import save_graph_npz

    rng = np.random.default_rng(0)
    for i in range(4):
        n = 60 + i
        base = np.arange(n)
        src = np.concatenate([(base + 1) % n, base]).astype(np.int32)
        dst = np.concatenate([base, (base + 1) % n]).astype(np.int32)
        s = GraphSample(feats=rng.normal(size=(n, 20)).astype(np.float32),
                        labels=rng.integers(0, 4, n).astype(np.int32),
                        centroids=np.zeros((n, 3), np.float32),
                        src=src, dst=dst, sv_partition=None, edge_weights=None)
        save_graph_npz(str(tmp_path / f"S{i}" / f"S{i}_graph.npz"), s)
    data = ImageGraphDataset(str(tmp_path), read_image=False)
    trainer = GNNTrainer("GSpool", small_hp(batch_size=2), data, seed=0,
                         impl="pallas")
    first = trainer.run_epoch()
    last = trainer.run_epoch()
    assert np.isfinite([first, last]).all()
    assert len(trainer._graph_cache) == 4
    for g in trainer._graph_cache._data.values():
        for leaf in jax.tree_util.tree_leaves(g):
            assert isinstance(leaf, np.ndarray), type(leaf)


def test_trainer_cache_eviction_bound(tmp_path):
    """A cache budget far below the dataset size degrades to rebuild-per-fetch
    (bounded memory), not to an error or wrong training."""
    from gnn_tumor_seg_tpu.data.cache import LRUBytesCache

    data = SyntheticGraphDataset(n_samples=6, grid=5, seed=3)
    trainer = GNNTrainer("GSpool", small_hp(batch_size=2), data, seed=0,
                         impl="pallas")
    trainer._graph_cache = LRUBytesCache(max_bytes=1)   # each tier holds
    trainer._device_cache = LRUBytesCache(max_bytes=1)  # 1 entry max
    first = trainer.run_epoch()
    for _ in range(3):
        last = trainer.run_epoch()
    assert last < first, (first, last)
    assert len(trainer._graph_cache) == 1
    assert len(trainer._device_cache) == 1


def test_fast_vs_exact_convergence_pallas():
    """Pins the trainer's default precision='fast' (single-pass bf16 Pallas
    kernels) against 'exact' on the SAME pallas impl: both loss trajectories
    must decrease and track each other closely. This is the test the trainer
    default points at (train/gnn_trainer.py); it runs the actual Pallas
    kernels (interpret mode on CPU, compiled on TPU)."""
    losses = {}
    for precision in ("exact", "fast"):
        data = SyntheticGraphDataset(n_samples=4, grid=5, seed=7)
        hp = small_hp(batch_size=2)
        trainer = GNNTrainer("GSpool", hp, data, seed=0, impl="pallas",
                             precision=precision)
        losses[precision] = [trainer.run_epoch() for _ in range(4)]
    for precision, traj in losses.items():
        assert traj[-1] < traj[0], (precision, traj)
    # trajectories track each other: bf16 rounding shifts losses by O(2^-8)
    # relative per step, not by a different convergence path
    diffs = [abs(a - b) / max(abs(a), 1e-6)
             for a, b in zip(losses["exact"], losses["fast"])]
    assert max(diffs) < 0.08, (losses, diffs)


def test_evaluate_metric_vector():
    data = SyntheticGraphDataset(n_samples=4, grid=5, seed=4)
    trainer = GNNTrainer("GSmean", small_hp(), data, seed=0)
    for _ in range(25):
        trainer.run_epoch()
    metrics, counts = trainer.evaluate(data)
    assert metrics.shape == (10,)
    assert counts.shape == (8,)
    assert counts[4:].sum() == sum(int(data.get_graph(i).n_nodes[0])
                                   for i in range(len(data)))
    assert np.isfinite(metrics).all()
    assert metrics[1] > 0.6  # learnable synthetic task: decent WT node dice


def test_checkpoint_roundtrip(tmp_path):
    data = SyntheticGraphDataset(n_samples=2, grid=4, seed=5)
    hp = small_hp()
    trainer = GNNTrainer("GSpool", hp, data, seed=0)
    trainer.run_epoch()
    trainer.save_weights(str(tmp_path) + "/", "run1_f1")
    params, model_type, hp2, manifest = load_checkpoint(
        str(tmp_path / "run1_f1.ckpt"), trainer.state.params
    )
    assert model_type == "GSpool"
    assert hp2.layer_sizes == hp.layer_sizes
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_chunking_reference_semantics():
    # contiguous folds dropping the remainder (utils/training_helpers.py:26-31)
    assert folds.chunk_dataset_into_folds(10, 3) == [(0, 3), (3, 6), (6, 9)]


def test_train_on_fold_checkpoints_and_early_stops(tmp_path):
    class FakeModel:
        def __init__(self, losses):
            self.losses = iter(losses)
            self.saved = []

        def run_epoch(self):
            return next(self.losses)

        def save_weights(self, folder, name):
            self.saved.append(name)

    m = FakeModel([3.0, 2.0, 1.0, 5.0, 5.0, 5.0])
    folds.train_on_fold(m, str(tmp_path), 6, "r", 1)
    assert m.saved == ["r_f1"] * 3  # checkpoints each improvement, then early-stop


def test_resume_exact_continuation(tmp_path):
    """Train 4 epochs straight vs 2 + checkpoint + restore + 2: identical
    params (full-batch so data order is irrelevant; dropout 0)."""
    data = SyntheticGraphDataset(n_samples=4, grid=4, seed=6)
    hp = small_hp(batch_size=4)

    straight = GNNTrainer("GSpool", hp, data, seed=0)
    for _ in range(4):
        straight.run_epoch()

    first = GNNTrainer("GSpool", hp, data, seed=0)
    first.run_epoch()
    first.run_epoch()
    first.save_weights(str(tmp_path) + "/", "mid")

    resumed = GNNTrainer.from_checkpoint(str(tmp_path / "mid.ckpt"), data, seed=0)
    assert int(resumed.state.epoch) == 2  # LR schedule continues
    resumed.run_epoch()
    resumed.run_epoch()

    for a, b in zip(jax.tree_util.tree_leaves(straight.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_restore_params_only_checkpoint(tmp_path):
    data = SyntheticGraphDataset(n_samples=2, grid=4, seed=7)
    hp = small_hp()
    t = GNNTrainer("GSmean", hp, data, seed=0)
    t.run_epoch()
    t.save_weights(str(tmp_path) + "/", "po", include_opt_state=False)
    t2 = GNNTrainer("GSmean", hp, data, seed=1)
    t2.restore(str(tmp_path / "po.ckpt"))  # resets optimizer, keeps params
    for a, b in zip(jax.tree_util.tree_leaves(t.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_batched_path_matches_serial():
    """The batched+threaded evaluate (VERDICT r3 item 3) uses ceil(N/bs)
    compiled forwards and reproduces the per-brain serial computation."""
    data = SyntheticGraphDataset(n_samples=5, grid=5, seed=9)
    trainer = GNNTrainer("GSmean", small_hp(), data, seed=0)
    for _ in range(3):
        trainer.run_epoch()

    m_b, c_b = trainer.evaluate(data, batch_size=2, workers=4)
    assert trainer.last_eval_stats["batches"] == 3      # ceil(5/2)
    assert trainer.last_eval_stats["brains"] == 5
    # serial reference: batch of one, one worker (the old per-brain shape)
    m_s, c_s = trainer.evaluate(data, batch_size=1, workers=1)
    assert trainer.last_eval_stats["batches"] == 5
    np.testing.assert_allclose(m_b, m_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(c_b, c_s)


def test_evaluate_batched_path_gat():
    """The batched+threaded evaluate also serves GAT models (it was only
    exercised with GraphSage before — VERDICT r4 item 9)."""
    data = SyntheticGraphDataset(n_samples=4, grid=5, seed=11)
    hp = small_hp()
    hp.gat_heads, hp.gat_residuals = [2, 2], [False, True]
    trainer = GNNTrainer("GAT", hp, data, seed=0)
    for _ in range(2):
        trainer.run_epoch()
    m_b, c_b = trainer.evaluate(data, batch_size=2, workers=4)
    assert trainer.last_eval_stats["batches"] == 2
    assert np.isfinite(m_b).all() and c_b.sum() > 0
    m_s, c_s = trainer.evaluate(data, batch_size=1, workers=1)
    np.testing.assert_allclose(m_b, m_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(c_b, c_s)
