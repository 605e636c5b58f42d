"""Fast native batcher must be bit-identical to the per-item generators."""

import os

import numpy as np
import pytest

from uplift_upsample_tpu.data.fast_batcher import FastAMASSBatcher, FastH36mBatcher
from uplift_upsample_tpu.data.generator import AMASSSequenceGenerator, H36mSequenceGenerator
from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
from uplift_upsample_tpu.data.loading import filter_and_subsample_dataset, load_dataset_and_2d_poses
from uplift_upsample_tpu.data.mocap import AMASSDataset
from uplift_upsample_tpu.data.pipeline import batched, repeat_epochs

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")

H36M_CASES = {
    "train_flip": dict(seq_len=9, subsample=3, stride=5, padding_type="copy",
                       flip_augment=True, in_batch_augment=False,
                       mask_stride=[5, 10, 20], stride_mask_align_global=False,
                       rand_shift_stride_mask=True, shuffle=True, seed=0),
    "train_inbatch": dict(seq_len=9, subsample=2, stride=5, padding_type="copy",
                          flip_augment=True, in_batch_augment=True,
                          mask_stride=[5, 10, 20], stride_mask_align_global=False,
                          rand_shift_stride_mask=True, shuffle=True, seed=3),
    "eval_global": dict(seq_len=9, subsample=1, stride=5, padding_type="copy",
                        flip_augment=False, in_batch_augment=False,
                        mask_stride=5, stride_mask_align_global=True,
                        rand_shift_stride_mask=False, shuffle=False, seed=0),
    "zeros_pad": dict(seq_len=11, subsample=1, stride=2, padding_type="zeros",
                      flip_augment=False, in_batch_augment=False,
                      mask_stride=None, stride_mask_align_global=False,
                      rand_shift_stride_mask=False, shuffle=False, seed=0),
}

AMASS_CASES = {
    "amass_train": dict(seq_len=9, subsample=2, stride=5, padding_type="copy",
                        flip_augment=True, in_batch_augment=False,
                        mask_stride=[5, 10, 20], stride_mask_align_global=False,
                        rand_shift_stride_mask=True, shuffle=True, seed=0),
    "amass_inbatch": dict(seq_len=9, subsample=3, stride=5, padding_type="copy",
                          flip_augment=True, in_batch_augment=True,
                          mask_stride=[5, 10, 20], stride_mask_align_global=False,
                          rand_shift_stride_mask=True, shuffle=True, seed=1),
    "amass_eval": dict(seq_len=9, subsample=4, stride=5, padding_type="copy",
                       flip_augment=False, in_batch_augment=False,
                       mask_stride=10, stride_mask_align_global=True,
                       rand_shift_stride_mask=False, shuffle=False, seed=0),
}


@pytest.fixture(scope="module")
def h36m_flat():
    if not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")):
        pytest.skip("synthetic npz missing")
    dataset, keypoints = load_dataset_and_2d_poses(
        os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"), verbose=False)
    return filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1", "S5"], action_filter="*",
        downsample=1, image_base_path=None, verbose=False)


def _assert_batches_equal(fast_batches, ref_batches, n_batches):
    count = 0
    for fast, ref in zip(fast_batches, ref_batches):
        for i, (f, r) in enumerate(zip(fast, ref)):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(r),
                                          err_msg=f"batch {count} col {i}")
        count += 1
        if count >= n_batches:
            break
    assert count == n_batches


@pytest.mark.parametrize("name", list(H36M_CASES.keys()))
def test_h36m_fast_batcher_parity(name, h36m_flat):
    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    make = lambda: H36mSequenceGenerator(
        p3d, p2d, camera_params=cams, subjects=subj, actions=act,
        frame_rates=frates, split="t", flip_lr_indices=H36MOrder17P.flip_lr_indices(),
        verbose=False, **H36M_CASES[name])
    # tf.data repeat→batch semantics: batches straddle epoch boundaries.
    # Run past 2 epochs to pin cross-epoch RNG stream state.
    batch_size = 32
    fast = FastH36mBatcher(make(), batch_size=batch_size)
    ref_gen = make()
    n_batches = (2 * len(ref_gen)) // batch_size + 1
    _assert_batches_equal(
        fast.batches(),
        batched(repeat_epochs(ref_gen.next_epoch_iterator), batch_size,
                drop_remainder=True),
        n_batches=n_batches)


@pytest.mark.parametrize("name", list(AMASS_CASES.keys()))
def test_amass_fast_batcher_parity(name):
    if not os.path.exists(os.path.join(SYNTH_DIR, "amass")):
        pytest.skip("synthetic amass missing")
    amass = AMASSDataset(path=os.path.join(SYNTH_DIR, "amass"),
                         h36m_path=None, split="train_debug")
    make = lambda: AMASSSequenceGenerator(
        amass_dataset=amass, flip_lr_indices=H36MOrder17P.flip_lr_indices(),
        verbose=False, **AMASS_CASES[name])
    batch_size = 32
    fast = FastAMASSBatcher(make(), batch_size=batch_size)
    ref_gen = make()
    n_batches = (2 * len(ref_gen)) // batch_size + 1
    _assert_batches_equal(
        fast.batches(),
        batched(repeat_epochs(ref_gen.next_epoch_iterator), batch_size,
                drop_remainder=True),
        n_batches=n_batches)


def test_native_gather_matches_numpy():
    from uplift_upsample_tpu.data import native

    rng = np.random.default_rng(0)
    src = rng.normal(size=(100, 17, 3)).astype(np.float32)
    idx = rng.integers(0, 100, size=(8, 9))
    zm = rng.uniform(size=(8, 9)) < 0.2
    df = (rng.uniform(size=8) < 0.5).astype(np.uint8)
    fp = np.asarray(H36MOrder17P.flip_lr_indices(), np.int32)

    out = native.gather_windows(src, idx, zm, df, fp)
    expected = src[idx].copy()
    expected[zm] = 0
    sel = df.astype(bool)
    fl = expected[sel][:, :, fp]
    fl[..., 0] *= -1
    expected[sel] = fl
    np.testing.assert_array_equal(out, expected)
    assert native.native_available(), "native library should be built for tests"


def test_bench_mask_matches_generator_protocol():
    """bench.py's protocol mask construction for keyframe-centered windows
    must equal the generator's aligned stride_mask_for — the bench rows'
    s_in semantics hang on this equality."""
    from uplift_upsample_tpu.data.generator import SequenceWindower

    n = 71
    mid = n // 2
    t_off = 5 * (np.arange(n) - mid)
    for s_in in (5, 10, 20):
        w = SequenceWindower(seq_len=n, stride=5, mask_stride=[s_in],
                             stride_mask_align_global=True,
                             flip_augment=False, shuffle=False,
                             verbose=False)
        for r in range(8):
            center = 5 * r  # keyframe-centered windows only
            stride, ams = w.resolve_strides(50)
            ref = w.stride_mask_for(center, stride, ams)
            bench = ((center + t_off) % s_in) == 0
            np.testing.assert_array_equal(bench, ref,
                                          err_msg=f"s_in={s_in} center={center}")


def test_h36m_fast_batcher_central_3d_only(h36m_flat):
    """central_3d_only must return seq3d (B, 1, K, 3) equal to the full
    batcher's central column, with every other column bit-identical (the
    eval feed mode — the loop only reads central-frame 3D ground truth)."""
    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    make = lambda: H36mSequenceGenerator(
        p3d, p2d, camera_params=cams, subjects=subj, actions=act,
        frame_rates=frates, split="t",
        flip_lr_indices=H36MOrder17P.flip_lr_indices(),
        verbose=False, **H36M_CASES["zeros_pad"])
    batch_size = 32
    full_it = FastH36mBatcher(make(), batch_size=batch_size).batches()
    cent_it = FastH36mBatcher(make(), batch_size=batch_size,
                              central_3d_only=True).batches()
    for b in range(4):
        full = next(full_it)
        cent = next(cent_it)
        mid = full[0].shape[1] // 2
        assert cent[0].shape == (batch_size, 1) + full[0].shape[2:]
        np.testing.assert_array_equal(cent[0][:, 0], full[0][:, mid],
                                      err_msg=f"batch {b} central 3D")
        for col in range(1, len(full)):
            np.testing.assert_array_equal(np.asarray(cent[col]),
                                          np.asarray(full[col]),
                                          err_msg=f"batch {b} col {col}")
