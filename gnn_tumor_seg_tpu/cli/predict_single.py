"""CLI: single-MRI end-to-end prediction (the containerized deployment contract).

The reference documents (but does not ship) a Docker predict mode: an input
directory with one MRI's four modalities `*_{flair,t1,t1ce,t2}.nii.gz` produces
`<output>/<id>.nii.gz` with BraTS labels and the standard affine
(`/root/reference/README.md:127-173`). This implements that contract as a
standalone CLI: preprocess in memory (no intermediate artifacts), GNN forward,
CNN refinement, uncrop, label swap, save.

Run: python -m gnn_tumor_seg_tpu.cli.predict_single -i /input -o /output \
        -g gnn.ckpt -c cnn.ckpt
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import nifti
from ..data.graph_build import build_graph_sample, sample_from_partition
from ..data.image import (determine_brain_crop, normalize_img, standardize_img,
                          swap_labels_to_brats, uncrop_to_brats_size)
from ..data.preprocess import DEFAULT_MODALITY_EXTS, STANDARDIZATION_STATS
from ..ops.graph import graph_from_arrays
from .common import (load_cnn_from_checkpoint, load_gnn_from_checkpoint,
                     predict_one_sample, predict_one_sample_device)


def predict_single_mri(input_dir: str, gnn_forward, cnn_forward,
                       num_nodes: int = 15000, num_neighbors: int | None = 10,
                       boxiness: float = 0.5,
                       modality_exts=None, slic_fn=None,
                       stage_times: dict | None = None,
                       cnn_prep: str = "device",
                       prep_impl: str = "host",
                       pad_shape="default") -> np.ndarray:
    """Full chain for one MRI directory -> BraTS-labelled full-size volume.

    stage_times, when given, is filled with per-stage wall-clock of THIS run
    (host stages here, device stages inside predict_one_sample).
    cnn_prep='device' (default) keeps GNN logits on device and gathers the
    CNN input crop there (predict_one_sample_device — ~half the H2D bytes);
    'host' is the reference-shaped host materialization path. Outputs are
    bit-identical in exact mode.

    prep_impl='device' runs the WHOLE preprocess math on device
    (`ops.slic_tpu.serve_preprocess_tpu`): quantile normalization,
    standardization, Gaussian smoothing and SLIC share one volume upload, the
    standardized volume stays device-resident for the CNN stage, and the host
    computes graph features from the RAW image through the equivalent affine
    map (quantiles commute with positive affines). Implies TPU SLIC and
    device CNN prep; `slic_fn` is unused on this path. pad_shape fixes every
    volume-shaped program to one compiled shape (ADVICE r3: per-crop-shape
    jits would pay 10-60 s tunnel compiles per novel MRI shape)."""
    import time
    rec = time.perf_counter
    modality_exts = modality_exts or DEFAULT_MODALITY_EXTS
    if pad_shape == "default":
        from .common import default_pad_shape

        pad_shape = default_pad_shape()
    t0 = rec()
    image = nifti.read_in_patient_sample(input_dir, modality_exts)
    t1 = rec()
    mean = np.asarray(STANDARDIZATION_STATS[0], np.float32)
    std = np.asarray(STANDARDIZATION_STATS[1], np.float32)
    crop = determine_brain_crop(image)
    cropped = image[crop]
    if prep_impl == "device":
        from ..ops.pallas.precision import fast_precision
        from ..ops.slic_tpu import finalize_labels, serve_preprocess_tpu

        input_dtype = np.float32
        if fast_precision():
            import ml_dtypes

            input_dtype = ml_dtypes.bfloat16
        t2 = rec()
        labels_raw, vol_t, q, step = serve_preprocess_tpu(
            cropped, num_nodes, boxiness, mean, std, sigma=1.0,
            pad_shape=pad_shape, input_dtype=input_dtype)
        t2a = rec()
        sv = finalize_labels(labels_raw, step)
        t2b = rec()
        # kick the RAW padded partition H2D now so it streams over the relay
        # while the host computes segment stats and kNN below; the discard
        # renumbering (known only after stats) is applied on device via the
        # tiny sv_remap table
        from .common import pad_and_ship_partition

        X, Y, Z = sv.shape
        if pad_shape is None:
            padded_dims = (X, Y, Z)
        else:
            padded_dims = tuple(max(p, s)
                                for p, s in zip(pad_shape, (X, Y, Z)))
        sv_dev = pad_and_ship_partition(sv, int(sv.max()) + 1, padded_dims)
        # standardized = raw/(q*std) - mean/std: per-modality positive affine
        a = (1.0 / (q * std)).astype(np.float32)
        b = (-mean / std).astype(np.float32)
        sample = sample_from_partition(cropped, None, sv, num_neighbors,
                                       feat_affine=(a, b))
        graph = graph_from_arrays(sample.feats, sample.src, sample.dst)
        t3 = rec()
        if stage_times is not None:
            stage_times["slic_device"] = t2a - t2
            stage_times["connectivity"] = t2b - t2a
            stage_times["stats_knn"] = t3 - t2b
        pred = predict_one_sample_device(
            gnn_forward, cnn_forward, graph, None, sample.sv_partition,
            stage_times=stage_times, pad_shape=pad_shape, vol_t=vol_t,
            sv_raw_dev=sv_dev, sv_remap=sample.sv_remap)
    else:
        standardized = standardize_img(normalize_img(cropped), mean, std)
        t2 = rec()
        sample = build_graph_sample(standardized, None, num_nodes, boxiness,
                                    num_neighbors, slic_fn=slic_fn)
        graph = graph_from_arrays(sample.feats, sample.src, sample.dst)
        t3 = rec()
        if cnn_prep == "device":
            pred = predict_one_sample_device(
                gnn_forward, cnn_forward, graph, standardized,
                sample.sv_partition, stage_times=stage_times,
                pad_shape=pad_shape)
        else:
            pred = predict_one_sample(gnn_forward, cnn_forward, graph,
                                      standardized, sample.sv_partition,
                                      stage_times=stage_times)
    if stage_times is not None:
        stage_times["nifti_read"] = t1 - t0
        stage_times["normalize"] = t2 - t1
        stage_times["graph_build"] = t3 - t2
        stage_times["n_nodes"] = int(graph.n_nodes[0])
    pred = uncrop_to_brats_size(crop, pred, shape=image.shape[:3])
    return swap_labels_to_brats(pred)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_dir", default="/input", type=str,
                   help="directory containing one MRI's modality files")
    p.add_argument("-o", "--output_dir", default="/output", type=str)
    p.add_argument("-g", "--gnn_weights", required=True, type=str)
    p.add_argument("-c", "--cnn_weights", required=True, type=str)
    p.add_argument("-n", "--num_nodes", default=15000, type=int)
    p.add_argument("-k", "--num_neighbors", default=10, type=int)
    p.add_argument("-b", "--boxiness", default=0.5, type=float)
    p.add_argument("-m", "--modality_extensions", nargs="+",
                   default=DEFAULT_MODALITY_EXTS)
    p.add_argument("--precision", default="exact", choices=("exact", "fast"),
                   help="'fast' runs the CNN refinement in bf16 (the training "
                        "default numerics) and halves its device transfer")
    p.add_argument("--slic_impl", default="auto",
                   choices=("auto", "native", "numpy", "tpu"),
                   help="supervoxelization backend (tpu = ops/slic_tpu.py "
                        "device assignment)")
    p.add_argument("--cnn_prep", default="device", choices=("device", "host"),
                   help="where the CNN input crop is assembled; 'device' "
                        "keeps GNN logits on-device and halves H2D bytes "
                        "(bit-identical output in exact mode)")
    p.add_argument("--prep_impl", default="auto",
                   choices=("auto", "host", "device"),
                   help="where normalization/standardization/stats run; "
                        "'device' fuses them into the TPU SLIC upload and "
                        "keeps the standardized volume device-resident "
                        "(lowest latency); 'auto' = device when "
                        "--slic_impl tpu")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..ops.pallas.precision import set_precision_mode
    from ..runtime import enable_compilation_cache, enable_host_alloc_reuse

    # without this the warmup-baked persistent cache is never READ at serve
    # time and the cold path re-pays every compile (incl. the conv autotune)
    enable_compilation_cache()

    # serve chains several ~100 MB host temporaries per MRI; arena reuse
    # avoids re-paying ~10 MB/s first-touch faults on every request
    enable_host_alloc_reuse()
    set_precision_mode(args.precision)
    _, _, _, gnn_forward = load_gnn_from_checkpoint(os.path.expanduser(args.gnn_weights))
    _, _, _, cnn_forward = load_cnn_from_checkpoint(os.path.expanduser(args.cnn_weights))
    from .common import resolve_slic_fn

    prep_impl = args.prep_impl
    if prep_impl == "auto":
        prep_impl = "device" if args.slic_impl == "tpu" else "host"
    pred = predict_single_mri(
        os.path.expanduser(args.input_dir), gnn_forward, cnn_forward,
        num_nodes=args.num_nodes,
        num_neighbors=args.num_neighbors or None,
        boxiness=args.boxiness,
        modality_exts=args.modality_extensions,
        slic_fn=resolve_slic_fn(args.slic_impl),
        cnn_prep=args.cnn_prep,
        prep_impl=prep_impl,
    )
    os.makedirs(os.path.expanduser(args.output_dir), exist_ok=True)
    # name the output after the modality files' shared prefix, else 'prediction'
    mri_id = "prediction"
    for f in sorted(os.listdir(args.input_dir)):
        for ext in args.modality_extensions:
            if f.endswith(ext):
                mri_id = f[: -len(ext)]
                break
        if mri_id != "prediction":
            break
    out_fp = os.path.join(os.path.expanduser(args.output_dir), f"{mri_id}.nii.gz")
    nifti.save_as_nifti(pred, out_fp)
    print(f"Saved prediction to {out_fp}")


if __name__ == "__main__":
    main()
