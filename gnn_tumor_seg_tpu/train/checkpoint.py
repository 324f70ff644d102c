"""Checkpointing with embedded config.

The reference saves bare state_dicts (`model/gnn_model.py:89-90`) and requires the
user to hand-synchronize hyperparameters at load time
(`scripts/generate_gnn_predictions.py:27-34`, README "make sure ... correspond").
Here every checkpoint embeds the model type + HyperParams JSON (and optionally the
optimizer state for exact training resume, which the reference cannot do —
SURVEY §5.4), so prediction scripts reconstruct the network automatically.

Format: a single .npz holding flattened pytree leaves plus a JSON manifest. Pure
numpy — no pickle, safe to load, multi-host-safe (atomic rename; callers write from
process 0 only).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import jax
import numpy as np

from ..config import HyperParams

__all__ = ["save_checkpoint", "load_checkpoint"]

_MANIFEST_KEY = "__manifest__"


def _flatten(tree: Any, prefix: str) -> dict[str, Any]:
    # Leaves stay device-resident here; save_checkpoint pulls ALL of them in
    # ONE jax.device_get so the copies pipeline through the relay. Per-leaf
    # np.asarray paid ~30 ms of relay round-trip per leaf: 3.4 s vs 0.52 s
    # for the ~105-leaf flagship params+AdamW tree — and train_on_fold
    # checkpoints every improving epoch, so this dominated the training
    # CLI's wall-clock (444 of 513 s at 120 epochs).
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"{prefix}/{i}": leaf for i, leaf in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(
    path: str,
    params: Any,
    model_type: str,
    hp: HyperParams,
    opt_state: Any = None,
    extra: dict | None = None,
) -> None:
    arrays, treedef = _flatten(params, "p")
    manifest = {
        "model_type": model_type,
        "hyperparams": json.loads(hp.to_json()),
        "treedef": str(treedef),
        "n_params": len(arrays),
        "extra": extra or {},
        "format_version": 1,
    }
    payload = dict(arrays)
    if opt_state is not None:
        opt_arrays, opt_treedef = _flatten(opt_state, "o")
        payload.update(opt_arrays)
        manifest["n_opt"] = len(opt_arrays)
        manifest["opt_treedef"] = str(opt_treedef)
    # one batched D2H for every leaf (see _flatten), then host ndarrays
    payload = {k: np.asarray(v) for k, v in jax.device_get(payload).items()}
    payload[_MANIFEST_KEY] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_opt_state(path: str, opt_state_template: Any):
    """Restore the optimizer state saved alongside params, or None if the
    checkpoint was saved without one."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z[_MANIFEST_KEY].tobytes()).decode())
        n_opt = manifest.get("n_opt")
        if not n_opt:
            return None
        leaves = [z[f"o/{i}"] for i in range(n_opt)]
    treedef = jax.tree_util.tree_structure(opt_state_template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint(path: str, params_template: Any = None):
    """Returns (params, model_type, HyperParams, manifest).

    If params_template is given, leaves are restored into its tree structure
    (required — treedefs are stored stringly for inspection, not reconstruction;
    build the template from the embedded config via the model factory)."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z[_MANIFEST_KEY].tobytes()).decode())
        leaves = [z[f"p/{i}"] for i in range(manifest["n_params"])]
        hp = HyperParams.from_json(json.dumps(manifest["hyperparams"]))
        if params_template is None:
            return leaves, manifest["model_type"], hp, manifest
        treedef = jax.tree_util.tree_structure(params_template)
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        return params, manifest["model_type"], hp, manifest
