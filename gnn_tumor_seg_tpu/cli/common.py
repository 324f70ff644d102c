"""Shared CLI helpers: checkpoint-driven model loading and the joint
GNN -> CNN per-sample prediction chain."""

from __future__ import annotations

import time

import numpy as np
import jax

from ..config import DEFAULT_BACKGROUND_NODE_LOGITS, HyperParams
from ..data.image import determine_tumor_crop, project_nodes_to_img
from ..models.factory import init_graph_net
from ..models.refine_cnn import CnnRefinementNet
from ..train.checkpoint import load_checkpoint
from ..train.cnn_trainer import combine_logits_and_image, pad_to_bucket

__all__ = [
    "load_gnn_from_checkpoint", "load_cnn_from_checkpoint",
    "node_logits_to_voxel_logits", "predict_one_sample",
    "predict_one_sample_device", "resolve_slic_fn",
]

#: BraTS raw volume extent — brain crops never exceed it, so it is the safe
#: fixed pad shape that lets the TPU SLIC compile once per dataset.
BRATS_RAW_SHAPE = (240, 240, 155)


def resolve_slic_fn(impl: str, pad_shape=BRATS_RAW_SHAPE):
    """Map a --slic_impl CLI choice to a slic_fn for build_graph_sample.

    auto/native/numpy run the host canonical (data/slic.py); 'tpu' routes the
    assignment iterations through ops/slic_tpu.py on the default JAX device,
    padded to `pad_shape` so every crop shape shares one compiled program.
    """
    if impl == "auto":
        return None
    if impl in ("native", "numpy"):
        from functools import partial

        from ..data.slic import slic_supervoxels

        return partial(slic_supervoxels, use_native=(impl == "native"))
    if impl == "tpu":
        from ..ops.slic_tpu import slic_supervoxels_tpu

        def tpu_slic(image, **kw):
            # clamp so oversize (non-BraTS) volumes recompile instead of raise
            dims = np.asarray(image).shape[:3]
            ps = tuple(max(p, int(s)) for p, s in zip(pad_shape, dims))
            # fast precision mode (the trainer/serve default numerics) ships
            # the volume as bf16 — halves the H2D leg, math stays f32
            from ..ops.pallas.precision import fast_precision

            if fast_precision() and "input_dtype" not in kw:
                import jax.numpy as jnp

                kw["input_dtype"] = jnp.bfloat16
            return slic_supervoxels_tpu(image, pad_shape=ps, **kw)

        return tpu_slic
    raise ValueError(f"unknown slic impl {impl!r}")


def load_gnn_from_checkpoint(weight_file: str):
    """Rebuild the graph net from its embedded config (no manual hyperparameter
    sync — the fix for `scripts/generate_gnn_predictions.py:27-34`)."""
    leaves, model_type, hp, _ = load_checkpoint(weight_file)
    model = init_graph_net(model_type, hp)
    template = model.init(jax.random.PRNGKey(0))
    params, *_ = load_checkpoint(weight_file, template)
    forward = jax.jit(lambda graph: model.apply(params, graph, train=False))
    return model, params, hp, forward


def load_cnn_from_checkpoint(weight_file: str):
    leaves, model_type, hp, _ = load_checkpoint(weight_file)
    assert model_type == "CNN", f"expected CNN checkpoint, got {model_type}"
    net = CnnRefinementNet(hp.in_feats, hp.out_classes, hp.layer_sizes)
    template = net.init(jax.random.PRNGKey(0))
    params, *_ = load_checkpoint(weight_file, template)
    forward = jax.jit(lambda x: net.apply(params, x))
    return net, params, hp, forward


def node_logits_to_voxel_logits(node_logits: np.ndarray,
                                sv_partition: np.ndarray) -> np.ndarray:
    """Append the background placeholder row and gather per voxel
    (`scripts/generate_gnn_predictions.py:55-62`). The placeholder generalizes
    the reference's fixed 4-wide [[1,-1,-1,-1]] (`hyperparam_helpers.py:25`) to
    the logits' class count (e.g. the importable reference CNN asset is
    5-class, SURVEY §2.2.2)."""
    n_classes = node_logits.shape[-1]
    if n_classes == len(DEFAULT_BACKGROUND_NODE_LOGITS[0]):
        bg = np.asarray(DEFAULT_BACKGROUND_NODE_LOGITS, node_logits.dtype)
    else:
        bg = np.asarray([[1.0] + [-1.0] * (n_classes - 1)], node_logits.dtype)
    table = np.concatenate([node_logits, bg])
    return table[sv_partition]


def _jit_voxel_gather_bbox():
    import jax.numpy as jnp

    @jax.jit
    def fn(node_logits, n_nodes, sv, bg_row):
        # node_logits [Nmax, C] f32 (device, straight from the GNN — never
        # pulled to host); sv [X,Y,Z] int (background encoded as n_nodes)
        n_max = node_logits.shape[0]
        table = jnp.concatenate([node_logits, bg_row], 0)       # [Nmax+1, C]
        idx = jnp.where(sv.astype(jnp.int32) == n_nodes, n_max,
                        sv.astype(jnp.int32))
        vox = table[idx]                                        # [X,Y,Z,C]
        m = jnp.argmax(vox, -1) != 0
        # one binary dilation with the 3-D cross (scipy default structure):
        # union of m and its six face neighbors, zero-extended at the edges
        d = m
        for ax in range(3):
            z = jnp.zeros_like(jnp.take(m, jnp.asarray([0]), axis=ax))
            lo = jnp.concatenate(
                [jax.lax.slice_in_dim(m, 1, m.shape[ax], axis=ax), z], ax)
            hi = jnp.concatenate(
                [z, jax.lax.slice_in_dim(m, 0, m.shape[ax] - 1, axis=ax)], ax)
            d = d | lo | hi
        return vox, d.any((1, 2)), d.any((0, 2)), d.any((0, 1))

    return fn


def _jit_gather_combine():
    from functools import partial

    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("out_dtype",))
    def fn(img, vox, ix, iy, iz, out_dtype):
        # img [X,Y,Z,4] (f32 or bf16 upload), vox [X,Y,Z,C] f32 (device);
        # ix/iy/iz are the tumor-crop row indices per axis, bucket-padded by
        # repeating the last index — which reproduces pad_to_bucket's
        # edge-replicate semantics through the gather itself
        x = jnp.concatenate([img.astype(jnp.float32), vox], -1)
        x = jnp.take(x, ix, axis=0)
        x = jnp.take(x, iy, axis=1)
        x = jnp.take(x, iz, axis=2)
        return x.astype(out_dtype)

    return fn


_voxel_gather_bbox = None
_gather_combine = None


def _axis_indices(ax_mask: np.ndarray, bucket: int):
    """Tumor-crop row indices along one axis (np.ix_ semantics — possibly
    non-contiguous), bucket-padded by repeating the last row (edge
    replicate). All-False falls back to the full axis (reference behavior
    when no tumor is predicted)."""
    idxs = np.where(ax_mask)[0]
    if idxs.size == 0:
        idxs = np.arange(ax_mask.shape[0])
    n = int(idxs.size)
    padded_len = -(-n // bucket) * bucket
    padded = np.concatenate(
        [idxs, np.full(padded_len - n, idxs[-1], idxs.dtype)])
    return padded.astype(np.int32), n, idxs


def predict_one_sample_device(gnn_forward, cnn_forward, graph,
                              img: np.ndarray, sv_partition: np.ndarray,
                              stage_times: dict | None = None) -> np.ndarray:
    """Device-resident variant of `predict_one_sample` (same output).

    The host path materializes the [X,Y,Z,C] voxel-logit volume on the host,
    crops/concats/pads it there, and ships the 9-channel crop to the device
    (~78 MB bf16). Here the GNN logits never leave the device: the host
    uploads only the int16 supervoxel partition (~10 MB) and the 4-channel
    image (bf16 ~39 MB under fast precision); voxel gather, argmax,
    cross-dilation and the per-axis tumor projections run on device, the
    host pulls three tiny boolean axis masks to choose the crop-bucket
    shape, and the crop+combine is three index-gathers on device feeding the
    CNN directly. Exact-mode output is bit-identical to the host path
    (gathers are exact; bucket padding via repeated last index ==
    edge-replicate); parity-tested in tests/test_cli_pipeline.py."""
    global _voxel_gather_bbox, _gather_combine
    import jax.numpy as jnp

    from ..train.cnn_trainer import _CROP_BUCKET
    from ..ops.pallas.precision import fast_precision

    if _voxel_gather_bbox is None:
        _voxel_gather_bbox = _jit_voxel_gather_bbox()
        _gather_combine = _jit_gather_combine()
    rec = time.perf_counter
    t0 = rec()
    n = int(graph.n_nodes[0])
    node_logits_dev = gnn_forward(graph)[0]                  # [Nmax, C] dev
    n_classes = int(node_logits_dev.shape[-1])
    if n_classes == len(DEFAULT_BACKGROUND_NODE_LOGITS[0]):
        bg = np.asarray(DEFAULT_BACKGROUND_NODE_LOGITS, np.float32)
    else:
        bg = np.asarray([[1.0] + [-1.0] * (n_classes - 1)], np.float32)
    sv = sv_partition
    if n < np.iinfo(np.int16).max:
        sv = sv.astype(np.int16, copy=False)                 # halve the H2D
    vox, mx, my, mz = _voxel_gather_bbox(
        node_logits_dev.astype(jnp.float32), n, jnp.asarray(sv),
        jnp.asarray(bg))
    mx, my, mz = np.asarray(mx), np.asarray(my), np.asarray(mz)
    t1 = rec()
    ix, nx, rx = _axis_indices(mx, _CROP_BUCKET)
    iy, ny, ry = _axis_indices(my, _CROP_BUCKET)
    iz, nz, rz = _axis_indices(mz, _CROP_BUCKET)
    out_dtype = jnp.bfloat16 if fast_precision() else jnp.float32
    img_up = img
    if fast_precision():
        import ml_dtypes

        img_up = img.astype(ml_dtypes.bfloat16)
    x = _gather_combine(jnp.asarray(img_up), vox, jnp.asarray(ix),
                        jnp.asarray(iy), jnp.asarray(iz), out_dtype)
    t2 = rec()
    refined = cnn_forward(x[None])[0]
    preds = np.asarray(jnp.argmax(refined, -1).astype(jnp.int16))
    t3 = rec()
    preds = preds[:nx, :ny, :nz]
    out = np.zeros_like(sv_partition, dtype=np.int16)
    out[np.ix_(rx, ry, rz)] = preds
    if stage_times is not None:
        stage_times["gnn_forward"] = t1 - t0
        stage_times["crop_and_prep"] = t2 - t1
        stage_times["cnn_forward"] = t3 - t2
        stage_times["cnn_crop_shape"] = [nx, ny, nz]
    return out


def predict_one_sample(gnn_forward, cnn_forward, graph, img: np.ndarray,
                       sv_partition: np.ndarray,
                       stage_times: dict | None = None) -> np.ndarray:
    """Joint GNN -> CNN chain for one brain
    (`scripts/generate_joint_predictions.py:59-73`): GNN node logits -> voxel
    logits -> tumor crop -> CNN refinement -> argmax embedded into the full
    (cropped-brain) volume. Returns int16 labels in training id space.

    stage_times, when given, receives wall-clock per stage measured on the
    REAL serve path (each stage ends on a host-visible result, so the timers
    see true device sync through the relay; scripts/bench_serve.py consumes
    this instead of re-implementing the chain)."""
    rec = time.perf_counter
    t0 = rec()
    node_logits = np.asarray(gnn_forward(graph))[0][: int(graph.n_nodes[0])]
    t1 = rec()
    voxel_logits = node_logits_to_voxel_logits(node_logits, sv_partition)
    tumor_crop = determine_tumor_crop(voxel_logits.argmax(-1))
    x = combine_logits_and_image(voxel_logits, img, tumor_crop)
    true_shape = x.shape[:3]
    x, _ = pad_to_bucket(x)
    from ..ops.pallas.precision import fast_precision

    if fast_precision():
        # fast mode (the trainer default): the CNN computes in bf16 anyway,
        # so cast host-side and halve the ~200 MB padded-crop H2D
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16)
    t2 = rec()
    # argmax ON DEVICE: D2H only the int16 label volume (~25 MB), not the
    # full per-class f32 logits (~200 MB) — identical result, ~8x less
    # transfer (the CNN serve stage is transfer-bound, BASELINE.md)
    refined = cnn_forward(jax.numpy.asarray(x)[None])[0]
    preds = np.asarray(jax.numpy.argmax(refined, -1).astype(jax.numpy.int16))
    t3 = rec()
    preds = preds[: true_shape[0], : true_shape[1], : true_shape[2]]
    out = np.zeros_like(sv_partition, dtype=np.int16)
    out[tumor_crop] = preds
    if stage_times is not None:
        stage_times["gnn_forward"] = t1 - t0
        stage_times["crop_and_prep"] = t2 - t1
        stage_times["cnn_forward"] = t3 - t2
        stage_times["cnn_crop_shape"] = list(true_shape)
    return out
