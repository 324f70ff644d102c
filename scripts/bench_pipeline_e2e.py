"""End-to-end hardware pipeline artifact (VERDICT r3 item 5).

Runs the REAL `scripts/run_pipeline.sh` (train GNN -> export logits -> train
CNN -> joint predictions — the reference's `run_pipeline.sh:20-36` driver) on
a ~20-brain full-scale synthetic dataset on the attached chip, preceded by a
timed preprocess stage and followed by a final-prediction evaluation
(WT/CT/ET Dice + HD95 vs ground truth in BraTS label space). This proves the
CLIs compose outside pytest tmpdirs and gives per-stage wall-clock for the
whole product.

Reuses the raw brains of scripts/bench_eval.py when present (same generator).

Run: python scripts/bench_pipeline_e2e.py [--samples 20]
Prints ONE JSON line. NOTE: never run concurrently with other heavy jobs.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_raw(workdir: str, samples: int, radii=(36, 24, 12)) -> str:
    from bench_eval import build_dataset  # generates raw/ as a side effect

    raw = os.path.join(workdir, "raw")
    if not (os.path.isdir(raw) and len(os.listdir(raw)) >= samples):
        # build_dataset also preprocesses; we only need raw/ here, but the
        # shared cache means bench_eval reuses the same artifacts
        build_dataset(workdir, samples, 15000, radii=radii)
    return raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--workdir", type=str, default="/tmp/gts_eval_bench")
    ap.add_argument("--out", type=str, default="/tmp/gts_pipeline_e2e")
    ap.add_argument("--gnn_args", type=str,
                    default="--hp layer_sizes=[256,256,256,256,256,256]",
                    help="extra train_gnn args (default: flagship 7x256)")
    ap.add_argument("--cnn_args", type=str, default="",
                    help="extra train_refinement_cnn args "
                         "(e.g. '--hp n_epochs=10')")
    ap.add_argument("--radii", type=str, default="36,24,12",
                    help="edema,NCR/NET,ET synthetic tumor radii — use e.g. "
                         "44,32,20 for an ET-resolvable validation run "
                         "(the default ET core sits at graph granularity)")
    args = ap.parse_args()

    radii = tuple(int(v) for v in args.radii.split(","))
    raw = ensure_raw(args.workdir, args.samples, radii=radii)
    stages = {}

    # ---- stage 0: preprocess (fresh output dir, timed) -------------------
    proc = os.path.join(args.out, "proc")
    # PREPEND the repo: the axon TPU plugin itself rides on PYTHONPATH
    # (/root/.axon_site) — overwriting the var kills the backend in children
    env = {**os.environ,
           "PYTHONPATH": REPO + ((os.pathsep + os.environ["PYTHONPATH"])
                                 if os.environ.get("PYTHONPATH") else "")}
    if not (os.path.isdir(proc) and len(os.listdir(proc)) >= args.samples):
        os.makedirs(proc, exist_ok=True)
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "-m", "gnn_tumor_seg_tpu.cli.preprocess",
             "-d", raw, "-o", proc, "-n", "15000", "-k", "10",
             "-l", "_seg.nii.gz"],
            capture_output=True, text=True, timeout=7200, env=env)
        assert r.returncode == 0, r.stderr[-3000:]
        stages["preprocess_s"] = round(time.perf_counter() - t0, 1)

    # ---- stages 1-4: the real bash driver --------------------------------
    for d in ("logits", "preds", "logs"):
        os.makedirs(os.path.join(args.out, d), exist_ok=True)
    penv = {**env,
            "PROCESSED_TRAINING_DATA_DIR": proc,
            "PROCESSED_TEST_DATA_DIR": proc,
            "GNN_LOGIT_DIR": os.path.join(args.out, "logits"),
            "PRED_OUTPUT_DIR": os.path.join(args.out, "preds"),
            "LOG_OUTPUT_DIR": os.path.join(args.out, "logs"),
            "MODEL_NAME": "e2e", "MODEL_TYPE": "GSpool",
            "GNN_EXTRA_ARGS": args.gnn_args,
            "CNN_EXTRA_ARGS": args.cnn_args}
    t0 = time.perf_counter()
    proc_run = subprocess.Popen(
        ["bash", os.path.join(REPO, "scripts", "run_pipeline.sh")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=penv, bufsize=1)
    marks = [time.perf_counter()]
    for line in proc_run.stdout:
        sys.stderr.write(line)
        if re.match(r"Finished [sS]tep", line):
            marks.append(time.perf_counter())
    proc_run.wait()
    assert proc_run.returncode == 0, "pipeline driver failed"
    names = ["train_gnn_s", "gnn_logits_s", "train_cnn_s", "joint_preds_s"]
    for name, a, b in zip(names, marks, marks[1:]):
        stages[name] = round(b - a, 1)
    stages["pipeline_total_s"] = round(time.perf_counter() - t0, 1)

    # ---- stage 5: evaluate the final predictions -------------------------
    from gnn_tumor_seg_tpu import evaluation
    from gnn_tumor_seg_tpu.data import nifti
    from gnn_tumor_seg_tpu.data.image import swap_labels_from_brats

    t0 = time.perf_counter()
    rows = []
    preds_dir = os.path.join(args.out, "preds")
    for fname in sorted(os.listdir(preds_dir)):
        sid = fname.replace(".nii.gz", "")
        pred = nifti.read_nifti(os.path.join(preds_dir, fname), np.int16)
        gt = nifti.read_nifti(os.path.join(raw, sid, "case_seg.nii.gz"),
                              np.int16)
        rows.append(evaluation.calculate_brats_metrics(
            swap_labels_from_brats(pred), swap_labels_from_brats(gt)))
    rows = np.asarray(rows)   # [N, 6]: WT/CT/ET dice, WT/CT/ET hd95
    stages["final_eval_s"] = round(time.perf_counter() - t0, 1)

    dice = np.mean(rows[:, :3], axis=0)
    hd = np.mean(rows[:, 3:], axis=0)
    detail = {
        "samples": len(rows),
        "stages": stages,
        "dice_wt_ct_et": [round(float(d), 4) for d in dice],
        "hd95_wt_ct_et": [round(float(h), 2) for h in hd],
        "gnn_args": args.gnn_args,
        "cnn_args": args.cnn_args,
        "radii": list(radii),
    }
    print(json.dumps({
        "metric": "pipeline_e2e_total_s",
        "value": stages["pipeline_total_s"],
        "unit": "s",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
