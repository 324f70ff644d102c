"""Precision-mode resolution for the Pallas aggregation kernels.

Two modes for the one-hot-MXU kernels (see gather_agg.py for the numerics):

  "exact" — hi/lo bf16 split carries ~2^-16 relative error: activations and
            gradients match the f32 dense oracle to near-f32 precision. This is
            the LIBRARY default so every parity test/fixture compares exactly.
  "fast"  — single bf16 pass (~2^-8 relative, i.e. standard bf16 training
            numerics — the TPU-native norm, and looser-but-comparable to the
            TF32 (2^-11) matmuls torch uses by default on current NVIDIA
            hardware, reference `model/gnn_model.py:23`). Halves the MXU
            one-hot dot count (the train step's compute bound) and the
            byte-bound unique-block gathers. Additionally the GNN models carry
            ACTIVATIONS in bf16 (`compute_dtype()`): parameters stay f32
            master copies cast at use (so param grads/AdamW state remain f32),
            every kernel preserves its input dtype, and the final logits are
            cast back to f32 before the loss — the standard TPU
            mixed-precision recipe, halving all activation HBM traffic.
            The TRAINER default (train/gnn_trainer.py) — convergence parity
            with "exact" is pinned by tests/test_training.py::
            test_fast_vs_exact_convergence_pallas (pallas impl, both modes).

Resolution order: set_precision_mode(...) > GTS_PALLAS_PRECISION env >
"exact". NOTE: the mode is baked into traced/jitted programs at trace time;
set it before building a train step (changing it later will not retrace
already-compiled functions).
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["get_precision_mode", "set_precision_mode", "precision_scope",
           "fast_precision", "compute_dtype"]

_MODES = ("exact", "fast")
_OVERRIDE: str | None = None


def _validate(mode: str | None) -> None:
    if mode is not None and mode not in _MODES:
        raise ValueError(f"precision mode must be one of {_MODES} or None, "
                         f"got {mode!r}")


def set_precision_mode(mode: str | None) -> None:
    """Set (or with None, clear) the process-wide kernel precision mode.

    Not thread-safe: the override is a process global, intended to be set once
    at startup or used via precision_scope around a trace on one thread."""
    global _OVERRIDE
    _validate(mode)
    _OVERRIDE = mode


def get_precision_mode() -> str:
    if _OVERRIDE is not None:
        return _OVERRIDE
    return os.environ.get("GTS_PALLAS_PRECISION", "exact")


@contextlib.contextmanager
def precision_scope(mode: str | None):
    """Scoped mode override (restores the previous mode on exit).

    The trainer wraps every jitted-step call in this so its precision choice
    is active exactly while its step traces, without leaking a process-global
    override into unrelated code (e.g. parity tests in the same process)."""
    global _OVERRIDE
    _validate(mode)
    prev = _OVERRIDE
    _OVERRIDE = mode
    try:
        yield
    finally:
        _OVERRIDE = prev


def fast_precision() -> bool:
    return get_precision_mode() == "fast"


def compute_dtype():
    """Model activation dtype for the current precision mode (trace-time).

    fast -> bfloat16 (mixed-precision: f32 master params cast at use, bf16
    activations end-to-end, logits cast back to f32 at the model head);
    exact -> float32."""
    import jax.numpy as jnp

    return jnp.bfloat16 if fast_precision() else jnp.float32
