"""Generate data-pipeline parity fixtures from the reference implementation.

Builds synthetic H36M / AMASS npz files, runs the *reference* loading +
sequence-generator pipeline over them in several configurations, and saves the
yielded tuples. tests/test_pipeline_parity.py then replays the same configs
through the new pipeline and compares element-wise.

Also records reference `tf_world_to_cam_and_2d` outputs as goldens for the
device-side camera ops.

Run once: python tools/make_generator_fixtures.py
"""

import os
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")

sys.path.insert(0, REPO)
from uplift_upsample_tpu.utils.testing import (  # noqa: E402
    make_synthetic_amass_dir, make_synthetic_h36m_npz)

sys.path.insert(0, "/root/reference")
from common.dataset.uplifiting_dataset import (  # noqa: E402
    AMASSSequenceGenerator, H36mSequenceGenerator, filter_and_subsample_dataset,
    load_dataset_and_2d_poses, tf_world_to_cam_and_2d)
from common.dataset.amass_dataset import AMASSDataset  # noqa: E402
from common.dataset.keypoint_order import H36MOrder17P  # noqa: E402

# Generator configurations to cover (name → kwargs)
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

N_ITEMS = 300


def collect(iterator, n):
    cols = None
    for idx, item in enumerate(iterator):
        if idx >= n:
            break
        if cols is None:
            cols = [[] for _ in item]
        for c, v in zip(cols, item):
            c.append(np.asarray(v))
    return [np.stack(c, axis=0) for c in cols]


def main():
    os.makedirs(SYNTH_DIR, exist_ok=True)
    path_3d = os.path.join(SYNTH_DIR, "data_3d_h36m.npz")
    path_2d = os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz")
    make_synthetic_h36m_npz(path_3d, path_2d)
    amass_dir = os.path.join(SYNTH_DIR, "amass")
    make_synthetic_amass_dir(amass_dir)

    dataset, keypoints = load_dataset_and_2d_poses(path_3d, path_2d, verbose=False)
    cams, p3d, p2d, _, subj, act, frates = filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1", "S5"], action_filter="*",
        downsample=1, image_base_path=None, verbose=False)

    # Save the flattened loading outputs as their own fixture
    np.savez(os.path.join(FIXTURE_DIR, "loading_parity.npz"),
             cams=np.stack(cams), subjects=np.array(subj), actions=np.array(act),
             frame_rates=np.array(frates),
             p3d_0=p3d[0], p3d_last=p3d[-1], p2d_0=p2d[0], p2d_last=p2d[-1],
             n_seqs=np.array(len(p3d)))

    flip_idx = H36MOrder17P.flip_lr_indices()
    for name, kwargs in H36M_GEN_CASES.items():
        gen = H36mSequenceGenerator(p3d, p2d, camera_params=cams, subjects=subj,
                                    actions=act, frame_rates=frates, split="fixture",
                                    flip_lr_indices=flip_idx, verbose=False, **kwargs)
        cols = collect(gen.next_epoch_iterator(), N_ITEMS)
        # Also capture a second epoch to pin cross-epoch RNG behavior
        cols2 = collect(gen.next_epoch_iterator(), 50)
        np.savez(os.path.join(FIXTURE_DIR, f"gen_{name}.npz"),
                 **{f"e1_{i}": c for i, c in enumerate(cols)},
                 **{f"e2_{i}": c for i, c in enumerate(cols2)},
                 length=np.array(len(gen)))
        print(f"gen_{name}: {cols[0].shape[0]} items, len={len(gen)}")

    # fps≠50 multiplier path (reference uplifiting_dataset.py:322-327 +
    # mask-stride scaling :329-339): the same sequences declared at 100 fps
    # must double the window stride AND the absolute mask stride per sample.
    frates100 = [100 for _ in frates]
    for name, kwargs in {
        "fps100_train": dict(seq_len=9, subsample=3, stride=2, padding_type="copy",
                             flip_augment=True, in_batch_augment=False,
                             mask_stride=[4, 20], stride_mask_align_global=False,
                             rand_shift_stride_mask=True, shuffle=True, seed=0),
        "fps100_eval": dict(seq_len=9, subsample=2, stride=2, padding_type="zeros",
                            flip_augment=False, in_batch_augment=False,
                            mask_stride=4, stride_mask_align_global=True,
                            rand_shift_stride_mask=False, shuffle=False, seed=0),
    }.items():
        gen = H36mSequenceGenerator(p3d, p2d, camera_params=cams, subjects=subj,
                                    actions=act, frame_rates=frates100,
                                    split="fixture", flip_lr_indices=flip_idx,
                                    verbose=False, **kwargs)
        cols = collect(gen.next_epoch_iterator(), N_ITEMS)
        cols2 = collect(gen.next_epoch_iterator(), 50)
        np.savez(os.path.join(FIXTURE_DIR, f"gen_{name}.npz"),
                 **{f"e1_{i}": c for i, c in enumerate(cols)},
                 **{f"e2_{i}": c for i, c in enumerate(cols2)},
                 length=np.array(len(gen)))
        print(f"gen_{name}: {cols[0].shape[0]} items, len={len(gen)}")

    amass = AMASSDataset(path=amass_dir, h36m_path=path_3d, split="train_debug")
    for name, kwargs in AMASS_GEN_CASES.items():
        gen = AMASSSequenceGenerator(amass_dataset=amass, flip_lr_indices=flip_idx,
                                     verbose=False, **kwargs)
        cols = collect(gen.next_epoch_iterator(), N_ITEMS)
        cols2 = collect(gen.next_epoch_iterator(), 50)
        np.savez(os.path.join(FIXTURE_DIR, f"gen_{name}.npz"),
                 **{f"e1_{i}": c for i, c in enumerate(cols)},
                 **{f"e2_{i}": c for i, c in enumerate(cols2)},
                 length=np.array(len(gen)))
        print(f"gen_{name}: {cols[0].shape[0]} items, len={len(gen)}")

    # Camera-op goldens: reference tf_world_to_cam_and_2d on AMASS eval samples
    gen = AMASSSequenceGenerator(amass_dataset=amass, flip_lr_indices=flip_idx,
                                 verbose=False, **AMASS_GEN_CASES["amass_eval"])
    seqs, cams18 = [], []
    for idx, item in enumerate(gen.next_epoch_iterator()):
        if idx >= 16:
            break
        seqs.append(item[0])
        cams18.append(item[1])
    import tensorflow as tf
    cam3d_list, pose2d_list = [], []
    for s, c in zip(seqs, cams18):
        out = tf_world_to_cam_and_2d(tf.constant(s), tf.constant(c), None, 0, 0, 0, None)
        cam3d_list.append(out[0].numpy())
        pose2d_list.append(out[1].numpy())
    np.savez(os.path.join(FIXTURE_DIR, "camera_ops.npz"),
             seq3d=np.stack(seqs), cam18=np.stack(cams18),
             cam3d=np.stack(cam3d_list), pose2d=np.stack(pose2d_list))
    print("camera_ops fixture saved")


if __name__ == "__main__":
    main()
