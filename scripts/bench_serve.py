"""Serve-latency bench: single-MRI end-to-end prediction (Docker contract).

Times the `cli.predict_single` chain on one BraTS-sized synthetic brain with
reference-shaped models (GSpool 7x256 GNN + 2-layer CNN): total warm latency
plus the stage split (host preprocess+graph-build vs device forwards). The
reference's deployment mode is this exact per-MRI chain
(`/root/reference/README.md:127-173`, `generate_joint_predictions.py:59-73`).

Run: python scripts/bench_serve.py [--runs 3]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_tumor_seg_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num_nodes", type=int, default=15000)
    args = ap.parse_args()

    import jax
    from full_scale_smoke import make_brain
    from gnn_tumor_seg_tpu.config import HyperParams
    from gnn_tumor_seg_tpu.data import nifti
    from gnn_tumor_seg_tpu.models.factory import init_graph_net
    from gnn_tumor_seg_tpu.models.refine_cnn import CnnRefinementNet
    from gnn_tumor_seg_tpu.train.checkpoint import save_checkpoint
    from gnn_tumor_seg_tpu.cli.common import (load_cnn_from_checkpoint,
                                              load_gnn_from_checkpoint)
    from gnn_tumor_seg_tpu.cli.predict_single import predict_single_mri

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    rng = np.random.default_rng(0)
    mods, _ = make_brain(rng)
    in_dir = os.path.join(tmp, "input")
    os.makedirs(in_dir)
    for name, vol in zip(("flair", "t1", "t1ce", "t2"), mods):
        nifti.save_as_nifti(vol, os.path.join(in_dir, f"brain_{name}.nii.gz"))

    # reference-shaped checkpoints (random init: latency does not depend on
    # the weights' values)
    hp = HyperParams(layer_sizes=[256] * 6)
    gnn = init_graph_net("GSpool", hp)
    save_checkpoint(os.path.join(tmp, "gnn.ckpt"),
                    gnn.init(jax.random.PRNGKey(0)), "GSpool", hp)
    cnn_hp = HyperParams(in_feats=8, layer_sizes=[16])
    cnn = CnnRefinementNet(8, 4, [16])
    save_checkpoint(os.path.join(tmp, "cnn.ckpt"),
                    cnn.init(jax.random.PRNGKey(1)), "CNN", cnn_hp)

    _, _, _, gnn_fwd = load_gnn_from_checkpoint(os.path.join(tmp, "gnn.ckpt"))
    _, _, _, cnn_fwd = load_cnn_from_checkpoint(os.path.join(tmp, "cnn.ckpt"))

    print(f"[serve] device: {jax.devices()[0]}", file=sys.stderr)
    t0 = time.perf_counter()
    pred = predict_single_mri(in_dir, gnn_fwd, cnn_fwd,
                              num_nodes=args.num_nodes)
    cold = time.perf_counter() - t0
    assert pred.shape == (240, 240, 155), pred.shape
    print(f"[serve] cold (incl. compile): {cold:.1f}s", file=sys.stderr)

    warm = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        predict_single_mri(in_dir, gnn_fwd, cnn_fwd, num_nodes=args.num_nodes)
        warm.append(time.perf_counter() - t0)

    # stage split on a warm run
    from gnn_tumor_seg_tpu.data.graph_build import build_graph_sample
    from gnn_tumor_seg_tpu.data.image import (determine_brain_crop,
                                              normalize_img, standardize_img)
    from gnn_tumor_seg_tpu.data.preprocess import (DEFAULT_MODALITY_EXTS,
                                                   STANDARDIZATION_STATS)
    from gnn_tumor_seg_tpu.ops.graph import graph_from_arrays

    t0 = time.perf_counter()
    image = nifti.read_in_patient_sample(in_dir, DEFAULT_MODALITY_EXTS)
    t_read = time.perf_counter() - t0
    crop = determine_brain_crop(image)
    cropped = image[crop]
    mean = np.asarray(STANDARDIZATION_STATS[0], np.float32)
    std = np.asarray(STANDARDIZATION_STATS[1], np.float32)
    standardized = standardize_img(normalize_img(cropped), mean, std)
    t0 = time.perf_counter()
    sample = build_graph_sample(standardized, None, args.num_nodes, 0.5, 10)
    t_graph = time.perf_counter() - t0
    graph = graph_from_arrays(sample.feats, sample.src, sample.dst)
    t0 = time.perf_counter()
    logits = np.asarray(gnn_fwd(graph))
    t_gnn = time.perf_counter() - t0

    # post-GNN stages (tumor crop + CNN refine on the crop)
    from gnn_tumor_seg_tpu.cli.common import (combine_logits_and_image,
                                              node_logits_to_voxel_logits,
                                              pad_to_bucket)
    from gnn_tumor_seg_tpu.data.image import determine_tumor_crop
    node_logits = logits[0][: int(graph.n_nodes[0])]
    voxel_logits = node_logits_to_voxel_logits(node_logits,
                                               sample.sv_partition)
    t0 = time.perf_counter()
    tumor_crop = determine_tumor_crop(voxel_logits.argmax(-1))
    t_crop = time.perf_counter() - t0
    x = combine_logits_and_image(voxel_logits, standardized, tumor_crop)
    crop_shape = x.shape[:3]
    x, _ = pad_to_bucket(x)
    t0 = time.perf_counter()
    np.asarray(cnn_fwd(jax.numpy.asarray(x)[None]))
    t_cnn = time.perf_counter() - t0

    result = {
        "metric": "serve_latency_single_mri_s",
        "value": round(float(np.median(warm)), 2),
        "unit": "s",
        "detail": {
            "warm_runs_s": [round(w, 2) for w in warm],
            "cold_s": round(cold, 1),
            "stage_nifti_read_s": round(t_read, 2),
            "stage_graph_build_s": round(t_graph, 2),
            "stage_gnn_forward_s": round(t_gnn, 2),
            "stage_tumor_crop_s": round(t_crop, 2),
            "stage_cnn_forward_s": round(t_cnn, 2),
            "cnn_crop_shape": list(crop_shape),
            "n_nodes": int(graph.n_nodes[0]),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
