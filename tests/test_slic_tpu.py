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


# ---------------------------------------------------------------- serve prep


def test_serve_preprocess_bitwise_parity():
    """serve_preprocess_tpu == host normalize->standardize->smooth->SLIC.

    The device chain (ops/slic_tpu.py: _order_stats_t bisection quantile +
    _affine_t + device Gaussian + assignment) must reproduce the host
    preprocessing of `cli/predict_single.py` BIT-FOR-BIT in exact mode: same
    q (f32-interpolated order statistics), same standardized volume, same
    raw SLIC labels. Reference semantics: `image_processing.py:45-56` inside
    `generate_joint_predictions.py:59-73`."""
    from gnn_tumor_seg_tpu.data.image import (_fast_quantile_per_channel,
                                              normalize_img, standardize_img)
    from gnn_tumor_seg_tpu.ops.slic_tpu import serve_preprocess_tpu

    rng = np.random.default_rng(3)
    X, Y, Z, C = 40, 37, 29, 4
    raw = rng.random((X, Y, Z, C)).astype(np.float32) * 97.0
    raw[:5] = 0.0  # background margin
    mean = np.array([0.4, 0.5, 0.45, 0.4], np.float32)
    std = np.array([0.15, 0.17, 0.12, 0.16], np.float32)

    labels, dev_std, q, step = serve_preprocess_tpu(
        raw, 64, 0.5, mean, std, sigma=1.0, pad_shape=(48, 48, 32))

    assert np.array_equal(q, _fast_quantile_per_channel(raw, 0.995))
    host_std = standardize_img(normalize_img(raw), mean, std)
    ds = np.asarray(dev_std)[:, :X, :Z, :Y].transpose(1, 3, 2, 0)
    assert np.array_equal(ds, host_std)
    host_labels = slic_assign_tpu(host_std, 64, 0.5,
                                  pad_shape=(48, 48, 32), smooth_sigma=1.0)
    assert np.array_equal(labels, host_labels)
    # pads of the resident volume must be exactly zero (downstream gathers
    # and the smoothing row-mask rely on it)
    padded = np.asarray(dev_std)
    assert np.all(padded[:, X:] == 0) and np.all(padded[:, :, Z:] == 0) \
        and np.all(padded[:, :, :, Y:] == 0)


def test_serve_preprocess_negative_values_and_bf16():
    """The bitwise-order-statistic quantile must handle negative intensities
    (sign-flipped monotonic key) and the bf16 fast-mode upload."""
    import ml_dtypes

    from gnn_tumor_seg_tpu.data.image import _fast_quantile_per_channel
    from gnn_tumor_seg_tpu.ops.slic_tpu import serve_preprocess_tpu

    rng = np.random.default_rng(4)
    raw = (rng.random((30, 26, 22, 2)).astype(np.float32) - 0.3) * 50.0
    mean = np.array([0.1, 0.2], np.float32)
    std = np.array([0.5, 0.6], np.float32)
    _, _, q, _ = serve_preprocess_tpu(raw, 27, 0.5, mean, std, sigma=0.0)
    assert np.array_equal(q, _fast_quantile_per_channel(raw, 0.995))
    # bf16 upload: q equals the quantile of the bf16-rounded data
    _, _, qb, _ = serve_preprocess_tpu(raw, 27, 0.5, mean, std, sigma=0.0,
                                       input_dtype=ml_dtypes.bfloat16)
    rb = raw.astype(ml_dtypes.bfloat16).astype(np.float32)
    assert np.array_equal(qb, _fast_quantile_per_channel(rb, 0.995))


def test_smooth_extent_guard():
    """Degenerate extents below the Gaussian radius raise instead of silently
    under-weighting edge rows (advisor r3)."""
    from gnn_tumor_seg_tpu.ops.slic_tpu import serve_preprocess_tpu

    raw = np.ones((3, 20, 20, 1), np.float32)
    with pytest.raises(ValueError, match="too small"):
        serve_preprocess_tpu(raw, 8, 0.5, [0.0], [1.0], sigma=1.0)
    with pytest.raises(ValueError, match="too small"):
        slic_assign_tpu(np.ones((20, 3, 20, 1), np.float32), 8, 0.5,
                        smooth_sigma=1.0)


def test_affine_feats_match_standardized_feats():
    """Graph features from RAW image + affine == features from the
    standardized image (quantiles commute with positive affine maps; the
    device-preprocess serve path relies on this)."""
    from gnn_tumor_seg_tpu.data.graph_build import sample_from_partition
    from gnn_tumor_seg_tpu.data.image import (_fast_quantile_per_channel,
                                              normalize_img, standardize_img)

    rng = np.random.default_rng(5)
    raw = rng.random((24, 22, 20, 4)).astype(np.float32) * 80.0
    raw[:4] = 0.0
    mean = np.array([0.4, 0.5, 0.45, 0.4], np.float32)
    std = np.array([0.15, 0.17, 0.12, 0.16], np.float32)
    host_std = standardize_img(normalize_img(raw), mean, std)
    sv = slic_supervoxels(host_std, n_segments=27, compactness=0.5)

    ref = sample_from_partition(host_std, None, sv, k=4)
    q = _fast_quantile_per_channel(raw, 0.995)
    a = (1.0 / (q * std)).astype(np.float32)
    b = (-mean / std).astype(np.float32)
    aff = sample_from_partition(raw, None, sv, k=4, feat_affine=(a, b))

    assert ref.feats.shape == aff.feats.shape
    np.testing.assert_allclose(aff.feats, ref.feats, atol=2e-5)
    assert np.array_equal(ref.sv_partition, aff.sv_partition)
    assert np.array_equal(ref.src, aff.src) and np.array_equal(ref.dst, aff.dst)
