"""Data-pipeline parity vs the reference implementation (fixture-based).

Fixtures from tools/make_generator_fixtures.py: reference loading + generator
outputs on synthetic npz data. The same configs replayed through the new
pipeline must match element-wise (RNG streams included).
"""

import os

import numpy as np
import pytest

from uplift_upsample_tpu.data.generator import AMASSSequenceGenerator, H36mSequenceGenerator
from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
from uplift_upsample_tpu.data.loading import filter_and_subsample_dataset, load_dataset_and_2d_poses
from uplift_upsample_tpu.data.mocap import AMASSDataset

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")

H36M_GEN_CASES = {
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

AMASS_GEN_CASES = {
    "amass_train": dict(seq_len=9, subsample=2, stride=5, padding_type="copy",
                        flip_augment=True, in_batch_augment=False,
                        mask_stride=[5, 10, 20], stride_mask_align_global=False,
                        rand_shift_stride_mask=True, shuffle=True, seed=0),
    "amass_eval": dict(seq_len=9, subsample=4, stride=5, padding_type="copy",
                       flip_augment=False, in_batch_augment=False,
                       mask_stride=10, stride_mask_align_global=True,
                       rand_shift_stride_mask=False, shuffle=False, seed=0),
}


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} missing; run tools/make_generator_fixtures.py")
    return path


@pytest.fixture(scope="module")
def h36m_flat():
    _require(os.path.join(SYNTH_DIR, "data_3d_h36m.npz"))
    dataset, keypoints = load_dataset_and_2d_poses(
        os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"), verbose=False)
    return filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1", "S5"], action_filter="*",
        downsample=1, image_base_path=None, verbose=False)


def test_loading_parity(h36m_flat):
    ref = np.load(_require(os.path.join(FIXTURE_DIR, "loading_parity.npz")))
    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    assert len(p3d) == int(ref["n_seqs"])
    np.testing.assert_array_equal(np.stack(cams), ref["cams"])
    np.testing.assert_array_equal(np.array(subj), ref["subjects"])
    np.testing.assert_array_equal(np.array(act), ref["actions"])
    np.testing.assert_array_equal(np.array(frates), ref["frame_rates"])
    np.testing.assert_allclose(p3d[0], ref["p3d_0"], atol=1e-7)
    np.testing.assert_allclose(p3d[-1], ref["p3d_last"], atol=1e-7)
    np.testing.assert_allclose(p2d[0], ref["p2d_0"], atol=1e-7)
    np.testing.assert_allclose(p2d[-1], ref["p2d_last"], atol=1e-7)


def _collect(iterator, n):
    cols = None
    for idx, item in enumerate(iterator):
        if idx >= n:
            break
        if cols is None:
            cols = [[] for _ in item]
        for c, v in zip(cols, item):
            c.append(np.asarray(v))
    return [np.stack(c, axis=0) for c in cols]


def _compare_epochs(gen, ref):
    n1 = ref["e1_0"].shape[0]
    cols = _collect(gen.next_epoch_iterator(), n1)
    for i, col in enumerate(cols):
        np.testing.assert_allclose(col, ref[f"e1_{i}"], atol=1e-6, err_msg=f"epoch1 col{i}")
    n2 = ref["e2_0"].shape[0]
    cols2 = _collect(gen.next_epoch_iterator(), n2)
    for i, col in enumerate(cols2):
        np.testing.assert_allclose(col, ref[f"e2_{i}"], atol=1e-6, err_msg=f"epoch2 col{i}")


@pytest.mark.parametrize("name", list(H36M_GEN_CASES.keys()))
def test_h36m_generator_parity(name, h36m_flat):
    ref = np.load(_require(os.path.join(FIXTURE_DIR, f"gen_{name}.npz")))
    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    gen = H36mSequenceGenerator(p3d, p2d, camera_params=cams, subjects=subj,
                                actions=act, frame_rates=frates, split="fixture",
                                flip_lr_indices=H36MOrder17P.flip_lr_indices(),
                                verbose=False, **H36M_GEN_CASES[name])
    assert len(gen) == int(ref["length"])
    _compare_epochs(gen, ref)


FPS100_GEN_CASES = {
    # fps≠50 multiplier path (reference uplifiting_dataset.py:322-327): the
    # per-sample window stride AND the absolute mask stride double at 100 fps.
    "fps100_train": dict(seq_len=9, subsample=3, stride=2, padding_type="copy",
                         flip_augment=True, in_batch_augment=False,
                         mask_stride=[4, 20], stride_mask_align_global=False,
                         rand_shift_stride_mask=True, shuffle=True, seed=0),
    "fps100_eval": dict(seq_len=9, subsample=2, stride=2, padding_type="zeros",
                        flip_augment=False, in_batch_augment=False,
                        mask_stride=4, stride_mask_align_global=True,
                        rand_shift_stride_mask=False, shuffle=False, seed=0),
}


@pytest.mark.parametrize("name", list(FPS100_GEN_CASES.keys()))
def test_h36m_generator_parity_fps100(name, h36m_flat):
    """Golden parity for sequences declared at 100 fps (multiplier path)."""
    ref = np.load(_require(os.path.join(FIXTURE_DIR, f"gen_{name}.npz")))
    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    frates100 = [100 for _ in frates]
    gen = H36mSequenceGenerator(p3d, p2d, camera_params=cams, subjects=subj,
                                actions=act, frame_rates=frates100, split="fixture",
                                flip_lr_indices=H36MOrder17P.flip_lr_indices(),
                                verbose=False, **FPS100_GEN_CASES[name])
    assert len(gen) == int(ref["length"])
    _compare_epochs(gen, ref)


@pytest.mark.parametrize("name", list(FPS100_GEN_CASES.keys()))
def test_fast_batcher_parity_fps100(name, h36m_flat):
    """The vectorized batcher's multiplier path must be bit-identical to the
    per-item generator at fps=100 (stride and mask-stride scaling per row)."""
    from uplift_upsample_tpu.data.fast_batcher import FastH36mBatcher

    cams, p3d, p2d, _, subj, act, frates = h36m_flat
    frates100 = [100 for _ in frates]
    make = lambda: H36mSequenceGenerator(
        p3d, p2d, camera_params=cams, subjects=subj, actions=act,
        frame_rates=frates100, split="fixture",
        flip_lr_indices=H36MOrder17P.flip_lr_indices(), verbose=False,
        **FPS100_GEN_CASES[name])
    batch_size = 32
    fast = FastH36mBatcher(make(), batch_size=batch_size)
    ref_gen = make()

    def repeat_epochs():
        while True:
            yield from ref_gen.next_epoch_iterator()

    it = repeat_epochs()
    n_batches = len(ref_gen) // batch_size + 2  # cross the epoch boundary
    for bi, fast_batch in enumerate(fast.batches()):
        if bi >= n_batches:
            break
        ref_rows = [next(it) for _ in range(batch_size)]
        for ci in range(len(ref_rows[0])):
            ref_col = np.stack([np.asarray(r[ci]) for r in ref_rows])
            np.testing.assert_array_equal(np.asarray(fast_batch[ci]), ref_col,
                                          err_msg=f"batch {bi} col {ci}")


@pytest.mark.parametrize("name", list(AMASS_GEN_CASES.keys()))
def test_amass_generator_parity(name):
    ref = np.load(_require(os.path.join(FIXTURE_DIR, f"gen_{name}.npz")))
    amass = AMASSDataset(path=os.path.join(SYNTH_DIR, "amass"),
                         h36m_path=None, split="train_debug")
    gen = AMASSSequenceGenerator(amass_dataset=amass,
                                 flip_lr_indices=H36MOrder17P.flip_lr_indices(),
                                 verbose=False, **AMASS_GEN_CASES[name])
    assert len(gen) == int(ref["length"])
    _compare_epochs(gen, ref)


def test_camera_ops_parity():
    """Device-side world→cam + projection vs reference tf.data stage."""
    import jax.numpy as jnp
    from uplift_upsample_tpu.ops.camera import world_to_cam_and_2d

    ref = np.load(_require(os.path.join(FIXTURE_DIR, "camera_ops.npz")))
    cam3d, pose2d = world_to_cam_and_2d(jnp.asarray(ref["seq3d"]), jnp.asarray(ref["cam18"]))
    np.testing.assert_allclose(np.asarray(cam3d), ref["cam3d"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(pose2d), ref["pose2d"], atol=2e-5)
