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


def default_pad_shape() -> tuple[int, int, int] | None:
    """Serve-path fixed pad shape: BRATS_RAW_SHAPE unless overridden via
    GTS_SERVE_PAD_SHAPE ('X,Y,Z', or 'none' to disable padding — used by the
    CPU test suite, whose 32-voxel volumes would otherwise pay 240^3-shaped
    programs)."""
    import os

    env = os.environ.get("GTS_SERVE_PAD_SHAPE")
    if env:
        if env.strip().lower() in ("none", "0"):
            return None
        return tuple(int(v) for v in env.split(","))
    return BRATS_RAW_SHAPE


def resolve_slic_fn(impl: str, pad_shape="default"):
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
            ps = pad_shape if pad_shape != "default" else default_pad_shape()
            if ps is not None:
                ps = tuple(max(p, int(s)) for p, s in zip(ps, dims))
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
        mx, my, mz = _dilated_axis_masks(jnp.argmax(vox, -1) != 0)
        return vox, mx, my, mz

    return fn


def _dilated_axis_masks(m):
    """Traced helper: one binary dilation of boolean volume m with the 3-D
    cross (scipy default structure) — union of m and its six face neighbors,
    zero-extended at the edges — reduced to per-axis any-masks."""
    import jax.numpy as jnp

    d = m
    for ax in range(3):
        z = jnp.zeros_like(jnp.take(m, jnp.asarray([0]), axis=ax))
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(m, 1, m.shape[ax], axis=ax), z], ax)
        hi = jnp.concatenate(
            [z, jax.lax.slice_in_dim(m, 0, m.shape[ax] - 1, axis=ax)], ax)
        d = d | lo | hi
    return d.any((1, 2)), d.any((0, 2)), d.any((0, 1))


def _jit_voxel_gather_bbox_remap():
    import jax.numpy as jnp

    @jax.jit
    def fn(node_logits, remap, sv_raw, bg_row):
        # Variant for the device-preprocess serve path: sv_raw holds RAW
        # (pre-renumbering) supervoxel labels whose H2D started before the
        # background discard was computed; remap [R] (int32, -1 = discarded,
        # pads -1) carries raw id -> node id and is applied on device. sv_raw
        # pads are -1 and wrap to the appended bg row, the same mechanism as
        # the host path's background encoding.
        n_max = node_logits.shape[0]
        table = jnp.concatenate([node_logits, bg_row], 0)       # [Nmax+1, C]
        idx = jnp.where(remap < 0, n_max, remap)                # [R]
        table2 = jnp.concatenate([table[idx], bg_row], 0)       # [R+1, C]
        vox = table2[sv_raw.astype(jnp.int32)]                  # [X,Y,Z,C]
        mx, my, mz = _dilated_axis_masks(jnp.argmax(vox, -1) != 0)
        return vox, mx, my, mz

    return fn


def _jit_unflatten_img():
    import jax.numpy as jnp

    @jax.jit
    def fn(flat, ny, nz, wx, wy, wz):
        # Bucketed flat upload -> padded [Xp, Yp, Zp, C] f32 image (zero
        # pads): the host ships only the cropped volume's real bytes instead
        # of a fixed-pad frame that is ~40% zeros (the serve relay is the
        # bottleneck). Same bucket scheme as ops/slic_tpu._unflatten_t.
        Xp, Yp, Zp = wx.shape[0], wy.shape[0], wz.shape[0]
        x = jnp.arange(Xp, dtype=jnp.int32)[:, None, None]
        y = jnp.arange(Yp, dtype=jnp.int32)[None, :, None]
        z = jnp.arange(Zp, dtype=jnp.int32)[None, None, :]
        valid = (wx[:, None, None] * wy[None, :, None] * wz[None, None, :]) > 0
        idx = jnp.where(valid, (x * ny + y) * nz + z, 0)
        return flat[idx].astype(jnp.float32) * valid[..., None]

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


def _jit_gather_combine_t():
    from functools import partial

    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("out_dtype",))
    def fn(vol_t, vox, ix, iy, iz, out_dtype):
        # vol_t [C, X, Z, Y] f32: the DEVICE-RESIDENT standardized volume from
        # ops/slic_tpu.serve_preprocess_tpu (transposed padded frame) — no
        # per-request image upload; XLA folds the transpose into the gathers
        img = jnp.transpose(vol_t, (1, 3, 2, 0))        # [X, Y, Z, C]
        x = jnp.concatenate([img, vox], -1)
        x = jnp.take(x, ix, axis=0)
        x = jnp.take(x, iy, axis=1)
        x = jnp.take(x, iz, axis=2)
        return x.astype(out_dtype)

    return fn


_voxel_gather_bbox = None
_voxel_gather_bbox_remap = None
_gather_combine = None
_gather_combine_t = None
_unflatten_img = None


def pad_and_ship_partition(sv_partition: np.ndarray, n_nodes: int,
                           padded_dims: tuple[int, int, int]):
    """Pad the supervoxel partition to the fixed serve shape (-1 = background,
    which gathers the appended bg-logits row) and start its async H2D. Called
    eagerly by the device-preprocess serve path so the ~18 MB transfer streams
    while the host computes segment stats/kNN."""
    import jax.numpy as jnp

    X, Y, Z = sv_partition.shape
    sv_dtype = (np.int16 if n_nodes < np.iinfo(np.int16).max
                else sv_partition.dtype)                     # halve the H2D
    if tuple(padded_dims) == (X, Y, Z):
        sv = sv_partition.astype(sv_dtype, copy=False)
    else:
        sv = np.full(tuple(padded_dims), -1, sv_dtype)       # pads=background
        sv[:X, :Y, :Z] = sv_partition
    return jnp.asarray(sv)


def _axis_indices(ax_mask: np.ndarray, bucket: int, floor: int = 0):
    """Tumor-crop row indices along one axis (np.ix_ semantics — possibly
    non-contiguous), padded by repeating the last row (edge replicate) up to
    the bucket multiple and at least to `floor` (the CNN crop floor: one
    compiled forward shape for all typical tumor crops — a novel bucket
    costs a 30-90 s tunnel compile, measured as a 54 s/brain compile storm
    in batch joint prediction before the floor). All-False falls back to the
    full axis (reference behavior when no tumor is predicted)."""
    idxs = np.where(ax_mask)[0]
    if idxs.size == 0:
        idxs = np.arange(ax_mask.shape[0])
    n = int(idxs.size)
    padded_len = max(-(-n // bucket) * bucket, floor)
    padded = np.concatenate(
        [idxs, np.full(padded_len - n, idxs[-1], idxs.dtype)])
    return padded.astype(np.int32), n, idxs


def predict_one_sample_device(gnn_forward, cnn_forward, graph,
                              img: np.ndarray | None,
                              sv_partition: np.ndarray,
                              stage_times: dict | None = None,
                              pad_shape="default",
                              vol_t=None, sv_raw_dev=None,
                              sv_remap=None) -> np.ndarray:
    """Device-resident variant of `predict_one_sample` (same output).

    The host path materializes the [X,Y,Z,C] voxel-logit volume on the host,
    crops/concats/pads it there, and ships the 9-channel crop to the device
    (~78 MB bf16). Here the GNN logits never leave the device: the host
    uploads only the int16 supervoxel partition and the 4-channel image
    (bf16 under fast precision); voxel gather, argmax, cross-dilation and the
    per-axis tumor projections run on device, the host pulls three tiny
    boolean axis masks to choose the crop-bucket shape, and the crop+combine
    is three index-gathers on device feeding the CNN directly. Exact-mode
    output is bit-identical to the host path (gathers are exact; bucket
    padding via repeated last index == edge-replicate); parity-tested in
    tests/test_cli_pipeline.py.

    pad_shape (default the BraTS raw extent) pads the partition/image to one
    fixed shape so the gather programs compile ONCE per process instead of
    once per brain-crop shape — each novel shape would cost ~2 remote-tunnel
    XLA compiles (10-60 s) in the cold single-MRI serve contract. Pads are
    background (-1 -> the appended bg-logits row -> class 0), so outputs are
    unchanged; pass pad_shape=None to skip padding (tests/micro volumes).

    vol_t, when given, is the DEVICE-RESIDENT standardized volume
    [C, Xp, Zp, Yp] from `ops.slic_tpu.serve_preprocess_tpu` (padded to the
    same pad_shape): the CNN image channels are read from it directly and
    `img` is ignored — zero per-request image upload."""
    global _voxel_gather_bbox, _voxel_gather_bbox_remap, \
        _gather_combine, _gather_combine_t, _unflatten_img
    import jax.numpy as jnp

    from ..train.cnn_trainer import _CROP_BUCKET
    from ..ops.pallas.precision import fast_precision

    if _voxel_gather_bbox is None:
        _voxel_gather_bbox = _jit_voxel_gather_bbox()
        _voxel_gather_bbox_remap = _jit_voxel_gather_bbox_remap()
        _gather_combine = _jit_gather_combine()
        _gather_combine_t = _jit_gather_combine_t()
        _unflatten_img = _jit_unflatten_img()
    rec = time.perf_counter
    t0 = rec()
    X, Y, Z = sv_partition.shape
    if pad_shape == "default":
        pad_shape = default_pad_shape()
    if pad_shape is None:
        Xp, Yp, Zp = X, Y, Z
    else:
        Xp, Yp, Zp = (max(p, s) for p, s in zip(pad_shape, (X, Y, Z)))
    n = int(graph.n_nodes[0])
    node_logits_dev = gnn_forward(graph)[0]                  # [Nmax, C] dev
    n_classes = int(node_logits_dev.shape[-1])
    if n_classes == len(DEFAULT_BACKGROUND_NODE_LOGITS[0]):
        bg = np.asarray(DEFAULT_BACKGROUND_NODE_LOGITS, np.float32)
    else:
        bg = np.asarray([[1.0] + [-1.0] * (n_classes - 1)], np.float32)
    if sv_raw_dev is not None:
        # serve path: the RAW partition's H2D started before the discard
        # renumbering existed; apply the (tiny, 2048-padded) remap on device
        r = np.asarray(sv_remap, np.int32)
        r_pad = np.full(-(-len(r) // 2048) * 2048, -1, np.int32)
        r_pad[:len(r)] = r
        vox, mx, my, mz = _voxel_gather_bbox_remap(
            node_logits_dev.astype(jnp.float32), jnp.asarray(r_pad),
            sv_raw_dev, jnp.asarray(bg))
    else:
        sv_dev = pad_and_ship_partition(sv_partition, n, (Xp, Yp, Zp))
        vox, mx, my, mz = _voxel_gather_bbox(
            node_logits_dev.astype(jnp.float32), n, sv_dev, jnp.asarray(bg))
    # clip masks to the true extents: a tumor at the crop boundary dilates one
    # voxel into the padding, which the host path's zero-extended dilation
    # never sees
    mx, my, mz = np.asarray(mx)[:X], np.asarray(my)[:Y], np.asarray(mz)[:Z]
    t1 = rec()
    from ..train.cnn_trainer import default_crop_floor

    fl = default_crop_floor() or (0, 0, 0)
    ix, nx, rx = _axis_indices(mx, _CROP_BUCKET, floor=fl[0])
    iy, ny, ry = _axis_indices(my, _CROP_BUCKET, floor=fl[1])
    iz, nz, rz = _axis_indices(mz, _CROP_BUCKET, floor=fl[2])
    out_dtype = jnp.bfloat16 if fast_precision() else jnp.float32
    if vol_t is not None:
        x = _gather_combine_t(vol_t, vox, jnp.asarray(ix), jnp.asarray(iy),
                              jnp.asarray(iz), out_dtype)
    else:
        up_dtype = np.float32
        if fast_precision():
            import ml_dtypes

            up_dtype = ml_dtypes.bfloat16
        if (Xp, Yp, Zp) == (X, Y, Z):
            img_up = jnp.asarray(img.astype(up_dtype, copy=False))
        else:
            # flat bucketed upload: ship only real bytes, rebuild padded on
            # device (same scheme as the SLIC upload, ops/slic_tpu.py)
            from ..ops.slic_tpu import VOX_BUCKET

            V = X * Y * Z
            VB = -(-V // VOX_BUCKET) * VOX_BUCKET
            buf = np.zeros((VB, img.shape[-1]), up_dtype)
            buf[:V] = img.reshape(V, img.shape[-1])
            img_up = _unflatten_img(
                jnp.asarray(buf), jnp.int32(Y), jnp.int32(Z),
                jnp.asarray((np.arange(Xp) < X).astype(np.float32)),
                jnp.asarray((np.arange(Yp) < Y).astype(np.float32)),
                jnp.asarray((np.arange(Zp) < Z).astype(np.float32)))
        x = _gather_combine(img_up, vox, jnp.asarray(ix),
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
    from ..train.cnn_trainer import default_crop_floor

    x, _ = pad_to_bucket(x, floor=default_crop_floor())
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
