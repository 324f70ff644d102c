"""Multi-device tests on the 8-virtual-CPU-device mesh: DP/TP training and the
node-partitioned (halo) giant-graph path, with exact parity vs single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_tumor_seg_tpu.config import HyperParams
from gnn_tumor_seg_tpu.data.synthetic import SyntheticGraphDataset
from gnn_tumor_seg_tpu.models.sage import GraphSage
from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays
from gnn_tumor_seg_tpu.parallel.dp import ParallelGNNTrainer
from gnn_tumor_seg_tpu.parallel.halo import HaloGraphSage, partition_graph
from gnn_tumor_seg_tpu.parallel.mesh import make_mesh
from gnn_tumor_seg_tpu.train.losses import weighted_cross_entropy
from gnn_tumor_seg_tpu.data.synthetic import random_graph


def test_eight_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_parallel_trainer_loss_decreases(n_data, n_model):
    data = SyntheticGraphDataset(n_samples=8, grid=5, seed=8)
    hp = HyperParams(n_epochs=2, layer_sizes=[32, 32], lr=3e-3, batch_size=8)
    mesh = make_mesh(n_data, n_model)
    tr = ParallelGNNTrainer("GSpool", hp, data, seed=0, mesh=mesh)
    first = tr.run_epoch()
    for _ in range(4):
        last = tr.run_epoch()
    assert last < first


def test_parallel_matches_single_device():
    """Same seed, same data order -> the DP step must match single-device."""
    data = SyntheticGraphDataset(n_samples=4, grid=4, seed=9)
    hp = HyperParams(n_epochs=1, layer_sizes=[16], lr=1e-3, batch_size=4)
    from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

    # exact mode: this pins the DP *mechanism* (shard + psum == one-device
    # reduce), which is only tightly comparable at f32 — under 'fast' (bf16
    # activations) the differing reduction order is legitimate rounding that
    # AdamW's normalized update amplifies past any tight tolerance
    single = GNNTrainer("GSmean", hp, data, seed=0, precision="exact")
    mesh = make_mesh(4, 2)
    par = ParallelGNNTrainer("GSmean", hp, data, seed=0, mesh=mesh,
                             precision="exact")
    l1 = single.run_epoch()
    l2 = par.run_epoch()
    assert abs(l1 - l2) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(par.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_parallel_fast_mode_tracks_single_device():
    """Trainer-default 'fast' (bf16 activations) DP coverage: shard+psum under
    bf16 legitimately reorders reductions, so assert loose agreement with the
    single-device fast run plus a decreasing-loss smoke — not bit equality
    (that mechanism check lives in the exact-mode test above)."""
    data = SyntheticGraphDataset(n_samples=8, grid=5, seed=21)
    hp = HyperParams(n_epochs=3, layer_sizes=[16, 16], lr=3e-3, batch_size=8)
    from gnn_tumor_seg_tpu.train.gnn_trainer import GNNTrainer

    single = GNNTrainer("GSpool", hp, data, seed=0, precision="fast")
    par = ParallelGNNTrainer("GSpool", hp, data, seed=0,
                             mesh=make_mesh(8, 1), precision="fast")
    s_first, p_first = single.run_epoch(), par.run_epoch()
    assert abs(s_first - p_first) < 0.05 * max(abs(s_first), 1e-3)
    for _ in range(3):
        s_last, p_last = single.run_epoch(), par.run_epoch()
    assert np.isfinite(p_last) and p_last < p_first
    assert abs(s_last - p_last) < 0.1 * max(abs(s_last), 1e-3)


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool"])
def test_halo_forward_matches_single_device(agg):
    rng = np.random.default_rng(10)
    n = 100
    feats, src, dst, labels = random_graph(rng, n, avg_deg=6, f_dim=12)
    g = graph_from_arrays(feats, src, dst, labels)

    model = GraphSage(12, [16, 16], 4, agg)
    params = model.init(jax.random.PRNGKey(3))
    want = np.asarray(model.apply(params, g))[0][:n]

    mesh = make_mesh(8, 1)
    halo = HaloGraphSage(12, [16, 16], 4, agg, mesh)
    pg = partition_graph(feats, src, dst, labels, n_parts=8)
    got = np.asarray(jax.jit(halo.apply)(params, pg))
    per = -(-n // 8)
    shard = pg.shard_size
    got_real = np.concatenate(
        [got[s][: min(per, n - s * per)] for s in range(8) if s * per < n]
    )
    np.testing.assert_allclose(got_real, want, rtol=2e-4, atol=2e-4)


def test_halo_loss_and_grads_match_single_device():
    rng = np.random.default_rng(11)
    n = 64
    feats, src, dst, labels = random_graph(rng, n, avg_deg=5, f_dim=8)
    g = graph_from_arrays(feats, src, dst, labels)
    cw = jnp.asarray([0.1, 1, 2, 2])

    model = GraphSage(8, [16], 4, "pool")
    params = model.init(jax.random.PRNGKey(4))

    def single_loss(p):
        logits = model.apply(p, g)
        return weighted_cross_entropy(logits, g.labels, cw, g.node_mask)

    mesh = make_mesh(8, 1)
    halo = HaloGraphSage(8, [16], 4, "pool", mesh)
    pg = partition_graph(feats, src, dst, labels, n_parts=8)

    l1, g1 = jax.value_and_grad(single_loss)(params)
    l2, g2 = jax.value_and_grad(lambda p: halo.loss(p, pg, cw))(params)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("agg", ["mean", "pool"])
def test_halo_p2p_matches_single_device(agg):
    """Boundary-only ppermute halo == single-device numerics. Graph built with
    1-shard locality (ring-ish structure)."""
    from gnn_tumor_seg_tpu.parallel.halo import HaloGraphSageP2P, partition_graph_p2p

    n = 128
    rng = np.random.default_rng(12)
    # local edges only: i <-> i+1..i+3 (non-wrapping, keeps 1-shard locality)
    src_l, dst_l = [], []
    for off in (1, 2, 3):
        a = np.arange(0, n - off)
        src_l += [a, a + off]
        dst_l += [a + off, a]
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    feats = rng.normal(size=(n, 12)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)

    g = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(12, [16, 16], 4, agg)
    params = model.init(jax.random.PRNGKey(5))
    want = np.asarray(model.apply(params, g))[0][:n]

    mesh = make_mesh(8, 1)
    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8)
    halo = HaloGraphSageP2P(12, [16, 16], 4, agg, mesh, halo_width=W)
    got = np.asarray(jax.jit(halo.apply)(params, pg))
    per = -(-n // 8)
    got_real = np.concatenate(
        [got[s][: min(per, n - s * per)] for s in range(8) if s * per < n]
    )
    np.testing.assert_allclose(got_real, want, rtol=2e-4, atol=2e-4)


def test_halo_p2p_grads_match_all_gather():
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGraphSage, HaloGraphSageP2P,
                                                 partition_graph,
                                                 partition_graph_p2p)

    n = 96
    rng = np.random.default_rng(13)
    src_l, dst_l = [], []
    for off in (1, 2):
        a = np.arange(0, n - off)
        src_l += [a, a + off]
        dst_l += [a + off, a]
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    cw = jnp.asarray([0.1, 1, 2, 2])

    mesh = make_mesh(8, 1)
    model_ag = HaloGraphSage(8, [16], 4, "pool", mesh)
    params = model_ag.init(jax.random.PRNGKey(6))
    pg_ag = partition_graph(feats, src, dst, labels, n_parts=8)
    pg_p2p, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8)
    model_p2p = HaloGraphSageP2P(8, [16], 4, "pool", mesh, halo_width=W)

    l1, g1 = jax.value_and_grad(lambda p: model_ag.loss(p, pg_ag, cw))(params)
    l2, g2 = jax.value_and_grad(lambda p: model_p2p.loss(p, pg_p2p, cw))(params)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_halo_p2p_rejects_nonlocal_edges():
    from gnn_tumor_seg_tpu.parallel.halo import partition_graph_p2p

    feats = np.zeros((64, 4), np.float32)
    src = np.array([0, 63], np.int32)
    dst = np.array([63, 0], np.int32)  # spans shard 0 -> shard 7
    with pytest.raises(ValueError):
        partition_graph_p2p(feats, src, dst, None, n_parts=8)


# ---------------------------------------------------------------------------
# GAT over the partitioned graph
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant", ["all_gather", "p2p"])
def test_halo_gat_matches_single_device(variant):
    """HaloGAT / HaloGATP2P == models.gat.GAT numerics on the same graph."""
    from gnn_tumor_seg_tpu.models.gat import GAT
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGAT, HaloGATP2P,
                                                 partition_graph,
                                                 partition_graph_p2p)

    n = 128
    rng = np.random.default_rng(14)
    # 1-shard-local edges so both variants run on the same graph
    src_l, dst_l = [], []
    for off in (1, 2, 3):
        a = np.arange(0, n - off)
        src_l += [a, a + off]
        dst_l += [a + off, a]
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    feats = rng.normal(size=(n, 12)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)

    g = graph_from_arrays(feats, src, dst, labels)
    heads, residuals = [2, 2], [False, True]
    model = GAT(12, [8, 8], 4, heads, residuals)
    params = model.init(jax.random.PRNGKey(7))
    want = np.asarray(model.apply(params, g))[0][:n]

    mesh = make_mesh(8, 1)
    if variant == "p2p":
        pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8)
        halo = HaloGATP2P(12, [8, 8], 4, heads, residuals, mesh, halo_width=W)
    else:
        pg = partition_graph(feats, src, dst, labels, n_parts=8)
        halo = HaloGAT(12, [8, 8], 4, heads, residuals, mesh)
    got = np.asarray(jax.jit(halo.apply)(params, pg))
    per = -(-n // 8)
    got_real = np.concatenate(
        [got[s][: min(per, n - s * per)] for s in range(8) if s * per < n]
    )
    np.testing.assert_allclose(got_real, want, rtol=2e-4, atol=2e-4)


def test_halo_gat_grads_match_single_device():
    from gnn_tumor_seg_tpu.models.gat import GAT
    from gnn_tumor_seg_tpu.parallel.halo import HaloGAT, partition_graph

    rng = np.random.default_rng(15)
    n = 64
    feats, src, dst, labels = random_graph(rng, n, avg_deg=5, f_dim=8)
    g = graph_from_arrays(feats, src, dst, labels)
    cw = jnp.asarray([0.1, 1, 2, 2])

    model = GAT(8, [8], 4, [2], [False])
    params = model.init(jax.random.PRNGKey(8))

    def single_loss(p):
        logits = model.apply(p, g)
        return weighted_cross_entropy(logits, g.labels, cw, g.node_mask)

    mesh = make_mesh(8, 1)
    halo = HaloGAT(8, [8], 4, [2], [False], mesh)
    pg = partition_graph(feats, src, dst, labels, n_parts=8)

    l1, g1 = jax.value_and_grad(single_loss)(params)
    l2, g2 = jax.value_and_grad(lambda p: halo.loss(p, pg, cw))(params)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# HaloTrainer: optimizer/epochs/checkpoints in the partitioned regime
# ---------------------------------------------------------------------------


def _local_graph_arrays(rng, n, f_dim=20):
    src_l, dst_l = [], []
    for off in (1, 2):
        a = np.arange(0, n - off)
        src_l += [a, a + off]
        dst_l += [a + off, a]
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    feats = rng.normal(size=(n, f_dim)).astype(np.float32)
    labels = (np.arange(n) * 4 // n).astype(np.int32)  # learnable structure
    return feats, src, dst, labels


@pytest.mark.parametrize("model_type,variant",
                         [("GSpool", "all_gather"), ("GSpool", "p2p"),
                          ("GAT", "all_gather"), ("GAT", "p2p")])
def test_halo_trainer_loss_decreases(model_type, variant):
    from gnn_tumor_seg_tpu.parallel.halo import (partition_graph,
                                                 partition_graph_p2p)
    from gnn_tumor_seg_tpu.parallel.halo_trainer import HaloTrainer

    rng = np.random.default_rng(16)
    feats, src, dst, labels = _local_graph_arrays(rng, 128)
    W = None
    if variant == "p2p":
        pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8)
    else:
        pg = partition_graph(feats, src, dst, labels, n_parts=8)

    hp = HyperParams(layer_sizes=[16, 16], lr=5e-3, n_epochs=6)
    if model_type == "GAT":
        hp.gat_heads, hp.gat_residuals = [2, 2], [False, True]
    mesh = make_mesh(8, 1)
    tr = HaloTrainer(model_type, hp, [pg], mesh, variant=variant,
                     halo_width=W, seed=0)
    first = tr.run_epoch()
    for _ in range(5):
        last = tr.run_epoch()
    assert np.isfinite(last) and last < first


def test_halo_trainer_checkpoint_interop(tmp_path):
    """Halo-trained params load into the single-device model (and back via
    resume_from), with identical logits."""
    from gnn_tumor_seg_tpu.models.factory import init_graph_net
    from gnn_tumor_seg_tpu.parallel.halo import partition_graph
    from gnn_tumor_seg_tpu.parallel.halo_trainer import HaloTrainer
    from gnn_tumor_seg_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(17)
    feats, src, dst, labels = _local_graph_arrays(rng, 96)
    pg = partition_graph(feats, src, dst, labels, n_parts=8)
    g = graph_from_arrays(feats, src, dst, labels)

    hp = HyperParams(layer_sizes=[16], lr=1e-3)
    mesh = make_mesh(8, 1)
    tr = HaloTrainer("GSpool", hp, [pg], mesh, seed=1)
    tr.run_epoch()
    tr.save_weights(str(tmp_path) + "/", "halo")

    # single-device load: factory from the embedded config, logits match the
    # halo forward on the same graph
    path = str(tmp_path / "halo.ckpt")
    template = init_graph_net("GSpool", hp).init(jax.random.PRNGKey(0))
    params, model_type, hp2, _ = load_checkpoint(path, params_template=template)
    assert model_type == "GSpool" and hp2.layer_sizes == [16]
    single = init_graph_net("GSpool", hp2)
    want = np.asarray(single.apply(jax.tree_util.tree_map(jnp.asarray, params), g))[0][:96]
    got = np.asarray(jax.jit(tr.model.apply)(tr.state.params, pg))
    per = 96 // 8
    got_real = np.concatenate([got[s][:per] for s in range(8)])
    np.testing.assert_allclose(got_real, want, rtol=2e-4, atol=2e-4)

    # resume: a new trainer restored from the checkpoint continues bit-exact
    tr2 = HaloTrainer("GSpool", hp, [pg], mesh, seed=99, resume_from=path)
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    l1 = tr.run_epoch()
    l2 = tr2.run_epoch()
    assert abs(l1 - l2) < 1e-6


def test_exchange_bytes_accounting():
    """Analytic ICI accounting: exact hand-computed numbers, and p2p must move
    far less than all_gather at realistic shard sizes."""
    from gnn_tumor_seg_tpu.models.gat import GAT
    from gnn_tumor_seg_tpu.models.sage import GraphSage
    from gnn_tumor_seg_tpu.parallel.halo import (exchange_bytes_per_step,
                                                 partition_graph)

    rng = np.random.default_rng(18)
    feats, src, dst, labels = _local_graph_arrays(rng, 512, f_dim=20)
    pg = partition_graph(feats, src, dst, labels, n_parts=8)
    assert pg.shard_size == 64

    sage = GraphSage(20, [32, 32], 4, "pool")
    # all_gather = replicated-compute fallback since round 5: ONE exchange of
    # the raw input features, each device receiving the other S-1 shards
    acc_ag = exchange_bytes_per_step(sage, pg, "all_gather")
    assert acc_ag["layer_widths"] == [20]
    assert acc_ag["fwd_bytes_per_device"] == 20 * 7 * 64 * 4
    assert acc_ag["step_bytes_per_device"] == 2 * acc_ag["fwd_bytes_per_device"]

    # p2p exchanges each layer's INPUT rows (2*W boundary rows per layer)
    acc_p2p = exchange_bytes_per_step(sage, pg, "p2p", halo_width=8)
    assert acc_p2p["layer_widths"] == [20, 32, 32]
    assert acc_p2p["fwd_bytes_per_device"] == (20 + 32 + 32) * 16 * 4
    # boundary-only exchange beats even the one-shot input all_gather here,
    # and scales with W instead of the table size
    assert acc_p2p["step_bytes_per_device"] < acc_ag["step_bytes_per_device"]
    assert acc_p2p["rows_exchanged_per_layer"] == 16

    gat = GAT(20, [32, 32], 4, [4, 4], [False, True])
    acc_gat = exchange_bytes_per_step(gat, pg, "p2p", halo_width=8)
    # layer input widths: 20, then heads*out flattened between layers
    assert acc_gat["layer_widths"] == [20, 4 * 32, 4 * 32]
    # fast mode halves the wire bytes (bf16 exchange)
    fast = exchange_bytes_per_step(gat, pg, "p2p", halo_width=8, dtype_bytes=2)
    assert fast["step_bytes_per_device"] * 2 == acc_gat["step_bytes_per_device"]


def test_process_shard_covers_and_balances():
    """Per-host file shards: equal lengths (SPMD liveness), full coverage,
    wrap-around padding, single-process passthrough."""
    from gnn_tumor_seg_tpu.parallel.multihost import process_shard

    ids = [f"s{i}" for i in range(10)]
    shards = [process_shard(ids, p, 4) for p in range(4)]
    assert all(len(s) == 3 for s in shards)         # ceil(10/4), all equal
    covered = set()
    for s in shards:
        covered.update(s)
    assert covered == set(ids)                      # nothing dropped
    assert shards[3] == ["s9", "s0", "s1"]          # wrap-padded last host
    assert process_shard(ids, 0, 1) == ids          # single process: as-is
    # even split: exact partition, no duplicates anywhere
    shards8 = [process_shard(ids[:8], p, 4) for p in range(4)]
    flat = [x for s in shards8 for x in s]
    assert sorted(flat) == sorted(ids[:8])
    # empty list: every host gets [] (no ZeroDivisionError)
    assert process_shard([], 1, 4) == []


def test_coordinator_checkpoint_and_global_batch(tmp_path):
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.models.sage import GraphSage
    from gnn_tumor_seg_tpu.parallel.mesh import data_sharding, make_mesh
    from gnn_tumor_seg_tpu.parallel.multihost import (
        is_coordinator, make_global_batch, save_checkpoint_coordinator)
    from gnn_tumor_seg_tpu.train.checkpoint import load_checkpoint

    assert is_coordinator()                         # single-process == proc 0
    hp = HyperParams(layer_sizes=[8])
    model = GraphSage(hp.in_feats, hp.layer_sizes, hp.out_classes, "pool")
    params = model.init(jax.random.PRNGKey(0))
    wrote = save_checkpoint_coordinator(str(tmp_path / "mh.ckpt"), params,
                                        "GSpool", hp)
    assert wrote
    restored, mt, hp2, _ = load_checkpoint(str(tmp_path / "mh.ckpt"), params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mesh = make_mesh(8, 1)
    local = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    g = make_global_batch(local, data_sharding(mesh))
    assert g["x"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])


# ---------------------------------------------------------------------------
# Round-5 unified halo: single-chip conv implementations (incl. Pallas
# kernels, dropout, weighted edges) running inside shard_map
# ---------------------------------------------------------------------------


def _own_rows(got, n, n_parts):
    """[S, shard, ...] own-row outputs -> [n, ...] in union order."""
    per = -(-n // n_parts)
    return np.concatenate(
        [got[s][: min(per, n - s * per)] for s in range(n_parts)
         if s * per < n])


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool"])
def test_halo_p2p_pallas_matches_single_device(agg):
    """The p2p halo running the Pallas tiled kernels (interpret mode on CPU)
    over per-shard extended-buffer aux == single-device dense numerics,
    forward AND gradients (VERDICT r4 item 1)."""
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGraphSageP2P,
                                                 partition_graph_p2p)

    rng = np.random.default_rng(23)
    feats, src, dst, labels = _local_graph_arrays(rng, 160, f_dim=12)
    n = 160
    g = graph_from_arrays(feats, src, dst, labels)
    model = GraphSage(12, [16, 16], 4, agg)
    params = model.init(jax.random.PRNGKey(5))
    cw = jnp.asarray([0.1, 1.0, 2.0, 2.0])

    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8,
                                tiled=True)
    assert pg.tiled is not None and pg.nbr.shape[1] % 128 == 0
    mesh = make_mesh(8, 1)
    halo = HaloGraphSageP2P(12, [16, 16], 4, agg, mesh, halo_width=W)

    want = np.asarray(model.apply(params, g))[0][:n]
    got = np.asarray(jax.jit(
        lambda p, pg: halo.apply(p, pg, impl="pallas"))(params, pg))
    np.testing.assert_allclose(_own_rows(got, n, 8), want,
                               rtol=2e-4, atol=2e-4)

    l1, g1 = jax.value_and_grad(lambda p: weighted_cross_entropy(
        model.apply(p, g), g.labels, cw, g.node_mask))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: halo.loss(p, pg, cw, impl="pallas"))(params)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_halo_gat_p2p_pallas_matches_single_device():
    """HaloGATP2P through the fused Pallas attention kernels == single-device
    GAT, forward and gradients."""
    from gnn_tumor_seg_tpu.models.gat import GAT
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGATP2P,
                                                 partition_graph_p2p)

    rng = np.random.default_rng(24)
    n = 160
    feats, src, dst, labels = _local_graph_arrays(rng, n, f_dim=12)
    g = graph_from_arrays(feats, src, dst, labels)
    heads, residuals = [2, 2], [False, True]
    model = GAT(12, [8, 8], 4, heads, residuals)
    params = model.init(jax.random.PRNGKey(6))
    cw = jnp.asarray([0.1, 1.0, 2.0, 2.0])

    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8,
                                tiled=True, tile=128)
    mesh = make_mesh(8, 1)
    halo = HaloGATP2P(12, [8, 8], 4, heads, residuals, mesh, halo_width=W)

    want = np.asarray(model.apply(params, g))[0][:n]
    got = np.asarray(jax.jit(
        lambda p, pg: halo.apply(p, pg, impl="pallas"))(params, pg))
    np.testing.assert_allclose(_own_rows(got, n, 8), want,
                               rtol=3e-4, atol=3e-4)

    _, g1 = jax.value_and_grad(lambda p: weighted_cross_entropy(
        model.apply(p, g), g.labels, cw, g.node_mask))(params)
    # jit like the trainer does (eager shard_map linearization trips a JAX
    # residual-sharding check on this body; the training path is always jit)
    _, g2 = jax.jit(jax.value_and_grad(
        lambda p: halo.loss(p, pg, cw, impl="pallas")))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_halo_p2p_dropout_matches_manual_masks():
    """feature_dropout in the p2p halo regime (VERDICT r4 item 2): the halo
    draws per-shard masks at each node's HOME shard before the exchange, so a
    reference forward applying the SAME masks (recomputed host-side from the
    halo's fold_in/split schedule) must match bit-for-bit — proving every
    halo copy of a node carries the same mask as its home copy."""
    from gnn_tumor_seg_tpu.models.sage import sage_conv_apply
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGraphSageP2P,
                                                 partition_graph_p2p)

    rng = np.random.default_rng(25)
    n, n_parts, drop = 160, 8, 0.4
    feats, src, dst, labels = _local_graph_arrays(rng, n, f_dim=12)
    g = graph_from_arrays(feats, src, dst, labels, n_pad=8 * 32)
    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=n_parts)
    shard = pg.shard_size
    mesh = make_mesh(n_parts, 1)
    halo = HaloGraphSageP2P(12, [16, 16], 4, "pool", mesh, halo_width=W,
                            dropout=drop)
    params = halo.init(jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(42)

    got = np.asarray(jax.jit(
        lambda p, pg: halo.apply(p, pg, train=True, rng=key))(params, pg))

    # reference: replicate the halo's mask schedule on the padded-global
    # layout, then run the single-chip conv layer-by-layer with feat_drop=0
    dims = [12, 16, 16, 4]
    n_layers = 3
    per = -(-n // n_parts)
    masks = []  # per layer: [S * shard, F_in] keep masks
    shard_keys = [jax.random.fold_in(key, s) for s in range(n_parts)]
    for i in range(n_layers):
        m = np.zeros((n_parts * shard, dims[i]), bool)
        for s in range(n_parts):
            shard_keys[s], sub = jax.random.split(shard_keys[s])
            m[s * shard:(s + 1) * shard] = np.asarray(
                jax.random.bernoulli(sub, 1.0 - drop, (shard, dims[i])))
        masks.append(m)

    # padded-global node layout (node i -> (i // per) * shard + i % per)
    idx = np.arange(n)
    pos = (idx // per) * shard + idx % per
    h = np.zeros((n_parts * shard, 12), np.float32)
    h[pos] = feats
    # global square table in the same layout
    from gnn_tumor_seg_tpu.ops.graph import ell_from_edges

    nbr, mask = ell_from_edges(n_parts * shard, pos[src], pos[dst],
                               n_pad=n_parts * shard,
                               d_pad=pg.nbr.shape[-1])
    from gnn_tumor_seg_tpu.ops.graph import GraphBatch

    gb = GraphBatch(nbr=jnp.asarray(nbr)[None],
                    nbr_mask=jnp.asarray(mask)[None],
                    node_mask=jnp.zeros((1, n_parts * shard)),
                    feats=jnp.zeros((1, n_parts * shard, 1)), labels=None,
                    n_nodes=jnp.zeros((1,), jnp.int32))
    h = jnp.asarray(h)
    for i, lp in enumerate(params):
        last = i == n_layers - 1
        if not last:  # dropout on all but the last layer
            h = jnp.where(jnp.asarray(masks[i]), h / (1.0 - drop), 0.0)
        h = sage_conv_apply(lp, gb, h[None], "pool",
                            activation=None if last else jax.nn.relu)[0]
    want = np.asarray(h)[pos][:n]
    np.testing.assert_allclose(_own_rows(got, n, n_parts), want,
                               rtol=2e-4, atol=2e-4)


def test_halo_all_gather_dropout_matches_single_device():
    """The all_gather fallback runs the unmodified single-chip model on the
    full table with a REPLICATED rng — with the same key and layout, dropout
    masks are identical to a single-device run (logits agree to float
    reassociation tolerance of the differently-compiled programs)."""
    from gnn_tumor_seg_tpu.ops.graph import GraphBatch

    rng = np.random.default_rng(26)
    n, n_parts = 100, 8
    feats, src, dst, labels = random_graph(rng, n, avg_deg=6, f_dim=12)
    pg = partition_graph(feats, src, dst, labels, n_parts=n_parts)
    mesh = make_mesh(n_parts, 1)
    halo = HaloGraphSage(12, [16, 16], 4, "pool", mesh, dropout=0.3)
    params = halo.init(jax.random.PRNGKey(8))
    key = jax.random.PRNGKey(77)

    got = np.asarray(jax.jit(
        lambda p, pg: halo.apply(p, pg, train=True, rng=key))(params, pg))

    shard = pg.shard_size
    n_tot = n_parts * shard
    gb = GraphBatch(nbr=pg.nbr[None], nbr_mask=pg.nbr_mask[None],
                    node_mask=pg.node_mask.reshape(1, n_tot),
                    feats=pg.feats.reshape(1, n_tot, 12),
                    labels=None, n_nodes=jnp.asarray([n], jnp.int32))
    want = np.asarray(halo.base.apply(params, gb, train=True, rng=key))[0]
    np.testing.assert_allclose(got.reshape(n_tot, -1), want,
                               rtol=1e-4, atol=1e-5)


def test_halo_trainer_dropout_trains():
    """hp.feature_dropout > 0 is honored (not silently ignored) in the halo
    regime: training still converges, and two different seeds draw different
    masks (losses diverge) while dropout=0 runs are mask-independent."""
    from gnn_tumor_seg_tpu.parallel.halo import partition_graph_p2p
    from gnn_tumor_seg_tpu.parallel.halo_trainer import HaloTrainer

    rng = np.random.default_rng(27)
    feats, src, dst, labels = _local_graph_arrays(rng, 128)
    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8)
    hp = HyperParams(layer_sizes=[16, 16], lr=5e-3, n_epochs=6,
                     feature_dropout=0.3)
    mesh = make_mesh(8, 1)
    tr = HaloTrainer("GSpool", hp, [pg], mesh, variant="p2p", halo_width=W,
                     seed=0)
    assert tr.model.base.dropout == pytest.approx(0.3)
    first = tr.run_epoch()
    for _ in range(5):
        last = tr.run_epoch()
    assert np.isfinite(last) and last < first
    # a second seed (different params AND dropout stream) diverges
    tr2 = HaloTrainer("GSpool", hp, [pg], mesh, variant="p2p", halo_width=W,
                      seed=1)
    assert abs(tr2.run_epoch() - first) > 1e-6


def test_halo_p2p_weighted_edges_match_single_device():
    """Weighted-edge aggregation now has a halo counterpart (VERDICT r4 weak
    item 1): per-slot edge weights flow through the p2p extended tables and
    match the single-device weighted mean."""
    from gnn_tumor_seg_tpu.parallel.halo import (HaloGraphSageP2P,
                                                 partition_graph_p2p)

    rng = np.random.default_rng(28)
    n = 128
    feats, src, dst, labels = _local_graph_arrays(rng, n, f_dim=12)
    # symmetric weights: w(u,v) == w(v,u)
    w = np.exp(-0.1 * np.abs(src - dst)).astype(np.float32)
    g = graph_from_arrays(feats, src, dst, labels, edge_weights=w)
    model = GraphSage(12, [16], 4, "mean")
    params = model.init(jax.random.PRNGKey(9))

    pg, W = partition_graph_p2p(feats, src, dst, labels, n_parts=8,
                                edge_weights=w)
    assert pg.edge_weight is not None
    mesh = make_mesh(8, 1)
    halo = HaloGraphSageP2P(12, [16], 4, "mean", mesh, halo_width=W)
    want = np.asarray(model.apply(params, g))[0][:n]
    got = np.asarray(jax.jit(halo.apply)(params, pg))
    np.testing.assert_allclose(_own_rows(got, n, 8), want,
                               rtol=2e-4, atol=2e-4)
