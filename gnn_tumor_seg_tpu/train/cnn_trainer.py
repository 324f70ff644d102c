"""Refinement-CNN training/eval engine — TPU counterpart of `model/cnn_model.py`.

Per sample: GNN voxel logits (4ch) + input image (4ch) are concatenated
channels-last, cropped to the dilated predicted-tumor bounding box, and fed to the
two-layer 3D CNN; class-weighted CE against the cropped labels
(`model/cnn_model.py:36-56,85-88`). Samples whose logit file is missing are
skipped (`cnn_model.py:40-43`).

TPU-first deviation: tumor crops have data-dependent shapes, which would force a
recompile per sample. Crops are therefore padded up to per-axis shape buckets
(multiples of 16) with *edge replication* — so voxels near the true crop boundary
see the same replicate-padding values the reference's exact-shape conv would —
and the loss/metrics are masked to the true crop. Compile count is bounded by the
handful of bucket combinations instead of the dataset size.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import evaluation
from ..config import HyperParams
from ..models.refine_cnn import CnnRefinementNet
from .checkpoint import save_checkpoint
from .losses import weighted_cross_entropy
from .optim import make_train_state, apply_updates

__all__ = ["CNNTrainer", "combine_logits_and_image", "pad_to_bucket",
           "default_crop_floor"]

_CROP_BUCKET = 16


def combine_logits_and_image(gnn_logits: np.ndarray, img: np.ndarray,
                             tumor_crop) -> np.ndarray:
    """Concat [image(4ch), logits(4ch)] channels-last and crop -> [dx,dy,dz,8]
    (`model/cnn_model.py:85-88`, channels-last instead of NCDHW)."""
    combined = np.concatenate([img, gnn_logits], axis=-1)
    return combined[tumor_crop]


def pad_to_bucket(vol: np.ndarray, bucket: int = _CROP_BUCKET,
                  floor: tuple[int, int, int] | None = None):
    """Edge-replicate-pad the leading 3 spatial dims up to multiples of
    `bucket`, and at least to `floor` when given. Returns
    (padded, valid_mask[spatial]).

    `floor` is the compile-count lever: with a dataset-stable floor (e.g.
    (128,128,128)) every typical tumor crop shares ONE compiled train step —
    measured on v5e, a fresh conv fwd+bwd compile costs 30-90 s through the
    remote tunnel while the extra padded-voxel compute costs milliseconds,
    so trading FLOPs for compile stability wins by orders of magnitude
    (scripts/bench_cnn.py). Oversized crops still fall back to bucketing
    (rare -> rare compiles)."""
    spatial = vol.shape[:3]
    target = tuple(-(-s // bucket) * bucket for s in spatial)
    if floor is not None:
        target = tuple(max(t, f) for t, f in zip(target, floor))
    pads = [(0, t - s) for s, t in zip(spatial, target)]
    if vol.ndim == 4:
        pads.append((0, 0))
    padded = np.pad(vol, pads, mode="edge")
    mask = np.zeros(target, np.float32)
    mask[: spatial[0], : spatial[1], : spatial[2]] = 1.0
    return padded, mask


DEFAULT_CROP_FLOOR = (128, 128, 128)


def default_crop_floor() -> tuple[int, int, int] | None:
    """CNN crop floor: DEFAULT_CROP_FLOOR unless overridden via
    GTS_CNN_CROP_FLOOR ('X,Y,Z' or 'none' — the CPU test suite disables it;
    tiny test crops floored to 128^3 would pay ~86 GFLOP convs per step)."""
    import os

    env = os.environ.get("GTS_CNN_CROP_FLOOR")
    if env:
        if env.strip().lower() in ("none", "0"):
            return None
        return tuple(int(v) for v in env.split(","))
    return DEFAULT_CROP_FLOOR


class CNNTrainer:
    def __init__(self, hp: HyperParams, image_dataset=None, logit_dataset=None,
                 seed: int = 0, crop_floor="default",
                 precision: str | None = None):
        """crop_floor: minimum padded crop shape (edge-replicate, masked
        loss). Valid-region conv outputs are unchanged only when the 16-
        bucketed crop already leaves >=2 replicate planes per axis; for axes
        sized 0 or 15 mod 16 the floored padding replaces the conv's implicit
        zero padding with replicate rows, shifting outputs within 2 voxels of
        that crop face (advisor r4). Training and prediction both run floored
        (cli/common.py), so train/serve see consistent semantics; only
        pre-floor checkpoints evaluated at such crop shapes shift. The
        default floors typical BraTS tumor crops into ONE compiled step
        shape — data-dependent 16-buckets alone cost a 30-90 s tunnel
        compile per novel bucket (a multi-minute storm on first epochs,
        scripts/bench_cnn.py) for a padding-compute cost of milliseconds.
        None restores pure 16-bucketing."""
        self.crop_floor = (default_crop_floor() if crop_floor == "default"
                           else crop_floor)
        # conv precision mode, scoped around every step/forward call like
        # GNNTrainer: default 'fast' (bf16 convs — the serve/warmup default).
        # IMPORTANT for compile cost: the mode is baked into the traced
        # program and therefore into the XLA persistent-cache key. The
        # round-4 "CNN conv never hits the persistent cache across
        # processes" was exactly this — the train CLI traced exact/f32 convs
        # while serve/warmup traced fast/bf16 ones (measured round 5:
        # matched-config second process loads the conv step from cache in
        # 0.7 s vs the 80-300 s autotune compile; a mismatched
        # matmul-precision config recompiles from scratch).
        import os as _os

        if precision is None:
            precision = _os.environ.get("GTS_PALLAS_PRECISION", "fast")
        assert precision in ("exact", "fast"), precision
        self.precision = precision
        self.hp = hp
        self.net = CnnRefinementNet(hp.in_feats, hp.out_classes, hp.layer_sizes)
        self.params = self.net.init(jax.random.PRNGKey(seed))
        self.state, self._tx = make_train_state(
            self.params, hp.lr, hp.lr_decay, hp.w_decay
        )
        self.class_weights = jnp.asarray(hp.class_weights, jnp.float32)
        self.image_dataset = image_dataset
        self.logit_dataset = logit_dataset
        self.rng = np.random.default_rng(seed)
        self._step = self._build_step()
        self._forward = jax.jit(lambda p, x: self.net.apply(p, x))
        # Device-resident prepared-sample cache. Each epoch re-decoded
        # ~370 MB of gzipped NIfTI per brain (image + labels + logits) and
        # re-uploaded the prepared crop through the relay — ~4 s/brain of
        # host work for a 0.1-0.3 s device step. The prepared tensors are
        # deterministic per mri_id for a trainer lifetime (fixed logit dir +
        # crop floor) and only ~8-35 MB each once cropped, so epochs >1 hit
        # HBM instead (x/labels/mask stay device-side; neither is donated by
        # _step). Budget: GTS_CNN_PREP_CACHE_MB (MB of HBM), default 4096;
        # 0 disables. Beyond-budget entries rebuild per epoch (LRU); at
        # BraTS-2021 scale (1,251 brains x ~30 MB) the shuffled access
        # pattern will mostly rebuild — the cache targets the common
        # dataset-fits-in-budget case.
        import os as _os

        from ..data.cache import LRUBytesCache

        mb = int(_os.environ.get("GTS_CNN_PREP_CACHE_MB", "4096"))
        self._prep_cache = LRUBytesCache(mb << 20) if mb > 0 else None

    def _build_step(self):
        net, cw, tx = self.net, self.class_weights, self._tx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, x, labels, mask):
            def loss_fn(params):
                logits = net.apply(params, x, train=True)
                return weighted_cross_entropy(logits, labels, cw, mask)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_updates(tx, state, grads), loss

        return step

    # ------------------------------------------------------------------ data
    def _prepare(self, mri_id: str, img: np.ndarray, labels: np.ndarray | None):
        """-> (x [1,dx,dy,dz,8], labels [1,...], mask [1,...]) or None if the
        logit file is missing."""
        try:
            gnn_logits, crop = self.logit_dataset.get_one(mri_id)
        except FileNotFoundError:
            return None
        x = combine_logits_and_image(gnn_logits, img, crop)
        x, mask = pad_to_bucket(x, floor=self.crop_floor)
        out = [jnp.asarray(x)[None], None, jnp.asarray(mask)[None]]
        if labels is not None:
            lab = labels[crop]
            lab_p = np.full(mask.shape, -1, np.int32)
            lab_p[: lab.shape[0], : lab.shape[1], : lab.shape[2]] = lab
            out[1] = jnp.asarray(lab_p)[None]
        return out, crop

    # ------------------------------------------------------------------ epochs
    def _load_and_prepare(self, mri_id: str):
        if self._prep_cache is not None:
            hit = self._prep_cache.get(mri_id)
            if hit is not None:
                return hit
        img = self.image_dataset.get_image(mri_id)
        labels = self.image_dataset.get_voxel_labels(mri_id)
        prep = self._prepare(mri_id, img, labels)
        if self._prep_cache is not None and prep is not None:
            self._prep_cache.put(mri_id, prep)
        return prep

    def run_epoch(self) -> float:
        """One shuffled bs=1 pass (`model/cnn_model.py:36-56`).

        The FIRST epoch is host-IO-bound (~2.3 s/brain of image+logit NIfTI
        decode and crop prep vs 0.1-0.3 s device step, scripts/bench_cnn.py).
        Later epochs hit the device-resident prepared-sample cache (see
        __init__) and skip the decode + upload entirely. The device step
        already overlaps the NEXT sample's host prep via async dispatch
        (losses are only device_get at epoch end), and an explicit prefetch
        thread was tried and REVERTED: holding two samples' ~70-150 MB
        buffers alive concurrently re-triggers this host class's slow
        first-touch page faults and measured 1.5-3x SLOWER epochs
        (alternating A/B, round 4)."""
        assert self.image_dataset is not None and self.logit_dataset is not None
        ids = list(self.image_dataset.ids)
        self.rng.shuffle(ids)
        losses = []
        for mri_id in ids:
            prep = self._load_and_prepare(mri_id)
            if prep is None:
                continue
            (x, lab, mask), _ = prep
            from ..ops.pallas.precision import precision_scope

            with precision_scope(self.precision):
                self.state, loss = self._step(self.state, x, lab, mask)
            losses.append(loss)
        self.state = self.state.next_epoch()
        return float(np.mean([jax.device_get(l) for l in losses]))

    # ------------------------------------------------------------------ eval
    def evaluate(self, ids=None):
        """Per-sample [loss, WT/CT/ET dice, WT/CT/ET hd95] averaged
        (`model/cnn_model.py:58-78`; metrics over the cropped region)."""
        ids = list(ids if ids is not None else self.image_dataset.ids)
        metrics = np.zeros((len(ids), 7))
        row = 0
        for mri_id in ids:
            img = self.image_dataset.get_image(mri_id)
            labels = self.image_dataset.get_voxel_labels(mri_id)
            prep = self._prepare(mri_id, img, labels)
            if prep is None:
                continue
            (x, lab, mask), crop = prep
            from ..ops.pallas.precision import precision_scope

            with precision_scope(self.precision):
                logits = self._forward(self.state.params, x)
            loss = weighted_cross_entropy(logits, lab, self.class_weights, mask)
            preds = np.asarray(jnp.argmax(logits, -1))[0]
            true = labels[crop]
            preds = preds[: true.shape[0], : true.shape[1], : true.shape[2]]
            metrics[row][0] = float(loss)
            metrics[row][1:] = evaluation.calculate_brats_metrics(preds, true)
            row += 1
        return np.mean(metrics[:row], axis=0) if row else np.zeros(7)

    def predict_crop(self, x: jax.Array) -> np.ndarray:
        """Logits for one prepared [1,dx,dy,dz,8] input."""
        from ..ops.pallas.precision import precision_scope

        with precision_scope(self.precision):
            return np.asarray(self._forward(self.state.params, x))

    # ------------------------------------------------------------------ io
    def save_weights(self, folder: str, name: str,
                     include_opt_state: bool = True) -> None:
        save_checkpoint(
            f"{folder}{name}.ckpt", self.state.params, "CNN", self.hp,
            opt_state=self.state.opt_state if include_opt_state else None,
            extra={"epoch": int(self.state.epoch)},
        )

    def load_params(self, params) -> None:
        self.state = dataclasses.replace(self.state, params=params)

    def restore(self, path: str) -> None:
        """Resume params + optimizer + epoch (see GNNTrainer.restore)."""
        import jax.numpy as jnp

        from .checkpoint import load_checkpoint, load_opt_state

        params, model_type, _, manifest = load_checkpoint(path, self.state.params)
        assert model_type == "CNN", model_type
        self.state = dataclasses.replace(self.state, params=params)
        opt = load_opt_state(path, self.state.opt_state)
        if opt is not None:
            self.state = dataclasses.replace(self.state, opt_state=opt)
        epoch = manifest.get("extra", {}).get("epoch")
        if epoch is not None:
            self.state = dataclasses.replace(
                self.state, epoch=jnp.asarray(epoch, jnp.int32)
            )
