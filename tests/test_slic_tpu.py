"""TPU SLIC (ops/slic_tpu.py) vs the host canonical (data/slic.py).

Both implement the identical blockwise 27-candidate formulation; they can
differ only in float associativity inside the k-means iterations (XLA fusion
/ einsum accumulation order vs numpy bincount order), which flips a small
fraction of voxels sitting exactly on supervoxel boundaries. Tests therefore
pin *partition agreement* (majority-label mapping) rather than exact label
equality, plus the structural invariants the downstream graph build relies
on. Runs on the CPU backend (conftest) — the same jitted program the TPU
executes.
"""

import numpy as np
import pytest

from gnn_tumor_seg_tpu.data.slic import slic_supervoxels
from gnn_tumor_seg_tpu.ops.slic_tpu import slic_assign_tpu, slic_supervoxels_tpu


def _volume(shape=(36, 28, 24), channels=2, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish blobs so supervoxels have real structure to latch onto
    base = rng.normal(size=shape + (channels,)).astype(np.float32)
    from scipy import ndimage

    return np.stack(
        [ndimage.gaussian_filter(base[..., c], 2.0) for c in range(channels)],
        -1,
    ) * 10.0


def _agreement(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of voxels matching after mapping each a-label to its majority
    b-label (label ids may renumber when a boundary voxel flips)."""
    a_f, b_f = a.ravel(), b.ravel()
    conf = np.zeros((int(a_f.max()) + 1, int(b_f.max()) + 1), np.int64)
    np.add.at(conf, (a_f, b_f), 1)
    return float(np.mean(conf.argmax(1)[a_f] == b_f))


def test_tpu_matches_numpy_canonical():
    vol = _volume()
    lab_np = slic_supervoxels(vol, n_segments=48, compactness=0.5,
                              use_native=False)
    lab_tpu = slic_supervoxels_tpu(vol, n_segments=48, compactness=0.5)
    assert lab_tpu.shape == vol.shape[:3]
    assert lab_tpu.dtype == np.int32
    assert lab_tpu.min() == 0
    # contiguous labels
    assert np.array_equal(np.unique(lab_tpu), np.arange(lab_tpu.max() + 1))
    assert _agreement(lab_np, lab_tpu) >= 0.98
    # segment counts in the same ballpark
    assert abs(int(lab_np.max()) - int(lab_tpu.max())) <= max(
        3, int(lab_np.max()) // 10
    )


def test_raw_assignment_agreement_no_connectivity():
    vol = _volume(seed=3)
    lab_np = slic_supervoxels(vol, n_segments=64, compactness=1.0,
                              use_native=False, enforce_connectivity=False)
    lab_tpu = slic_supervoxels_tpu(vol, n_segments=64, compactness=1.0,
                                   enforce_connectivity=False)
    assert _agreement(lab_np, lab_tpu) >= 0.98


def test_padding_is_semantically_inert():
    vol = _volume(seed=1, shape=(30, 26, 22))
    unpadded = slic_supervoxels_tpu(vol, n_segments=40, compactness=0.5)
    padded = slic_supervoxels_tpu(vol, n_segments=40, compactness=0.5,
                                  pad_shape=(48, 40, 32))
    # padding only changes shapes XLA sees; zero-weight pad voxels cannot
    # perturb centers, so only fp-order flips are tolerated
    assert _agreement(unpadded, padded) >= 0.995


def test_pad_shape_too_small_raises():
    vol = _volume(seed=2, shape=(20, 18, 16))
    with pytest.raises(ValueError):
        slic_supervoxels_tpu(vol, n_segments=27, pad_shape=(16, 18, 16))


def test_bf16_upload_mode():
    import jax.numpy as jnp

    vol = _volume(seed=4)
    f32 = slic_supervoxels_tpu(vol, n_segments=48, compactness=0.5)
    bf16 = slic_supervoxels_tpu(vol, n_segments=48, compactness=0.5,
                                input_dtype=jnp.bfloat16)
    assert _agreement(f32, bf16) >= 0.95


def test_device_gaussian_matches_scipy():
    """_gauss_smooth_t == scipy gaussian_filter (reflect boundary), including
    on a padded volume with traced true extents."""
    import jax.numpy as jnp
    from scipy import ndimage

    from gnn_tumor_seg_tpu.ops.slic_tpu import _gauss_kernel1d, _gauss_smooth_t

    rng = np.random.default_rng(11)
    X, Z, Y, C = 20, 14, 17, 3
    vol = rng.normal(size=(C, X, Z, Y)).astype(np.float32)
    want = np.stack(
        [ndimage.gaussian_filter(vol[c], 1.0, mode="reflect")
         for c in range(C)]
    )
    w = _gauss_kernel1d(1.0)
    # unpadded
    got = np.asarray(_gauss_smooth_t(jnp.asarray(vol), jnp.int32(X),
                                     jnp.int32(Z), jnp.int32(Y),
                                     jnp.asarray(w), taps=len(w)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # padded: true extents traced; pad region must stay exactly zero
    pad = np.zeros((C, X + 6, Z + 3, Y + 5), np.float32)
    pad[:, :X, :Z, :Y] = vol
    got_p = np.asarray(_gauss_smooth_t(jnp.asarray(pad), jnp.int32(X),
                                       jnp.int32(Z), jnp.int32(Y),
                                       jnp.asarray(w), taps=len(w)))
    np.testing.assert_allclose(got_p[:, :X, :Z, :Y], want, rtol=2e-5,
                               atol=2e-5)
    assert np.all(got_p[:, X:] == 0) and np.all(got_p[:, :, Z:] == 0)
    assert np.all(got_p[:, :, :, Y:] == 0)


def test_device_vs_host_smoothing_pipeline_agreement():
    vol = _volume(seed=9)
    dev = slic_supervoxels_tpu(vol, n_segments=48, compactness=0.5,
                               smooth_impl="device")
    host = slic_supervoxels_tpu(vol, n_segments=48, compactness=0.5,
                                smooth_impl="host")
    assert _agreement(dev, host) >= 0.98


def test_assign_is_deterministic():
    vol = _volume(seed=5, shape=(24, 20, 18))
    from scipy import ndimage

    sm = np.stack(
        [ndimage.gaussian_filter(vol[..., c], 1.0) for c in range(2)], -1
    )
    a = slic_assign_tpu(sm, 27, 0.5)
    b = slic_assign_tpu(sm, 27, 0.5)
    assert np.array_equal(a, b)


def test_build_graph_sample_with_tpu_slic():
    from gnn_tumor_seg_tpu.data.graph_build import build_graph_sample

    vol = _volume(seed=6, shape=(32, 28, 24), channels=4)
    labels = (vol[..., 0] > vol[..., 0].mean()).astype(np.int16)
    ref = build_graph_sample(vol, labels, approx_num_nodes=48, boxiness=0.5,
                             k=4)
    got = build_graph_sample(vol, labels, approx_num_nodes=48, boxiness=0.5,
                             k=4, slic_fn=slic_supervoxels_tpu)
    n_ref, n_got = ref.feats.shape[0], got.feats.shape[0]
    assert abs(n_ref - n_got) <= max(2, n_ref // 5)
    assert got.feats.shape[1] == ref.feats.shape[1]
    assert got.src.max() < n_got and got.dst.max() < n_got
    assert got.sv_partition.shape == vol.shape[:3]


def test_resolve_slic_fn_cli_mapping():
    from gnn_tumor_seg_tpu.cli.common import resolve_slic_fn

    assert resolve_slic_fn("auto") is None
    # oversize volume (vs pad_shape) gets clamped, not rejected
    fn = resolve_slic_fn("tpu", pad_shape=(16, 16, 16))
    vol = _volume(seed=7, shape=(20, 18, 16))
    lab = fn(vol, n_segments=27, compactness=0.5)
    assert lab.shape == vol.shape[:3]
    host = resolve_slic_fn("numpy")
    assert _agreement(host(vol, n_segments=27, compactness=0.5), lab) >= 0.98
    with pytest.raises(ValueError):
        resolve_slic_fn("bogus")
