"""Loader robustness against the quirks real (VideoPose3D-prepared) H36M data
has: per-subject action sets, 2D-longer-than-3D truncation, and the
frame-image-path revert to original (pre-canonicalization) action names.

Reference semantics: uplifiting_dataset.py:96-210 (filter + image paths),
:25-93 (loading + truncation); VideoPose3D's prepare_data_h36m.py
canonicalizes TakingPhoto→Photo / WalkingDog→WalkDog in the npz keys and
discards the corrupted S11 "Directions" video.
"""

import os

import numpy as np
import pytest

from uplift_upsample_tpu.data import h36m_splits
from uplift_upsample_tpu.data.loading import (filter_and_subsample_dataset,
                                              load_dataset_and_2d_poses)
from uplift_upsample_tpu.utils.testing import make_quirks_h36m_npz


@pytest.fixture(scope="module")
def quirks_npz(tmp_path_factory):
    d = tmp_path_factory.mktemp("quirks")
    return make_quirks_h36m_npz(str(d / "data_3d_h36m.npz"),
                                str(d / "data_2d_h36m_synth.npz"))


@pytest.fixture(scope="module")
def quirks_flat(quirks_npz):
    path_3d, path_2d = quirks_npz
    dataset, keypoints = load_dataset_and_2d_poses(path_3d, path_2d, verbose=False)
    return dataset, keypoints


def test_subject_specific_action_sets(quirks_flat):
    """S11 lacks "Directions": every list stays aligned, counts reflect the
    per-subject action sets, and truncation holds 2D == 3D lengths."""
    dataset, keypoints = quirks_flat
    subjects = ["S9", "S11"]
    cams, p3d, p2d, _, subj, act, frates = filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=subjects, action_filter="*",
        downsample=1, image_base_path=None, verbose=False)
    # 7 actions for S9, 6 for S11, 4 cameras each
    assert len(p2d) == (7 + 6) * 4
    assert len(p3d) == len(p2d) == len(cams) == len(subj) == len(act) == len(frates)
    for a, b in zip(p3d, p2d):
        assert a.shape[0] == b.shape[0]  # trailing 2D frames truncated
    # action ids index the canonical renamed vocabulary
    names = [h36m_splits.renamed_actions[i] for i in act]
    assert "Photo" in names and "WalkDog" in names and "Directions" in names
    s11_rows = [i for i, s in enumerate(subj)
                if h36m_splits.all_subjects[s] == "S11"]
    assert len(s11_rows) == 6 * 4
    assert all(h36m_splits.renamed_actions[act[i]] != "Directions"
               for i in s11_rows)


def test_action_filter_exact_name_match(quirks_flat):
    """action_filter matches the space-split base name exactly — "Walking"
    must not pull in "WalkDog" (reference :137-143 exact comparison)."""
    dataset, keypoints = quirks_flat
    _, p3d, p2d, _, subj, act, _ = filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1"],
        action_filter=["Walking"], downsample=1, verbose=False)
    names = {h36m_splits.renamed_actions[i] for i in act}
    assert names == {"Walking"}
    assert len(p2d) == 2 * 4  # "Walking" + "Walking 1"


def test_frame_name_revert_to_original_action_dirs(quirks_flat, tmp_path):
    """Image paths fall back to the ORIGINAL on-disk action names when the
    canonical-name directory does not exist (reference :177-188): npz keys say
    "Photo 1" / "WalkDog", the frames live in "TakingPhoto 1.<cam>" /
    "WalkingDog.<cam>". A canonical-name dir that DOES exist is kept."""
    dataset, keypoints = quirks_flat
    base = str(tmp_path / "h36m")
    cam_ids = h36m_splits.cameras

    def touch(subject, action_dirname):
        for cam in cam_ids:
            d = os.path.join(base, "frames", subject, f"{action_dirname}.{cam}")
            os.makedirs(d, exist_ok=True)
            open(os.path.join(d, "img_000000.jpg"), "wb").close()

    # S1: original names on disk for the renamed actions; canonical for Walking
    touch("S1", "TakingPhoto")
    touch("S1", "TakingPhoto 1")
    touch("S1", "WalkingDog")
    touch("S1", "Walking")

    _, _, _, frame_names, subj, act, _ = filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1"], action_filter="*",
        downsample=1, image_base_path=base, verbose=False)
    by_row = {}
    for i, names in enumerate(frame_names):
        by_row.setdefault(h36m_splits.renamed_actions[act[i]], []).append(names)

    photo_first = by_row["Photo"][0][0]  # cam 0 of "Photo" or "Photo 1"
    assert ("TakingPhoto." in photo_first or "TakingPhoto 1." in photo_first), \
        photo_first
    walkdog_first = by_row["WalkDog"][0][0]
    assert "WalkingDog." in walkdog_first, walkdog_first
    walking_first = by_row["Walking"][0][0]
    assert "/Walking." in walking_first or "/Walking 1." in walking_first
    # 0-based frame numbering, one path per frame
    assert photo_first.endswith("img_000000.jpg")
    row0 = frame_names[0]
    assert len(row0) > 1 and row0[1].endswith("img_000001.jpg")


@pytest.mark.slow
def test_train_eval_cli_roundtrip_on_quirks_data(quirks_npz, tmp_path):
    """Full train → best-h5 → final multi-mask-stride eval sweep on the
    quirks-shaped data (the reference train.py:734-749 end-of-run path)."""
    from uplift_upsample_tpu.config import UpliftUpsampleConfig
    from uplift_upsample_tpu.train import train_and_validate

    path_3d, path_2d = quirks_npz
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 2, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 1,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [4, 10],
        "BATCH_SIZE": 16, "DROP_PATH_RATE": [0.0, 0.0, 0.0], "EPOCHS": 1,
        "STEPS_PER_EPOCH": 3, "VALIDATION_INTERVAL": 1, "CHECKPOINT_INTERVAL": 1,
        "VALIDATION_EXAMPLES": 16, "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {},
        "WEIGHT_DECAY": 4e-6, "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 4e-5, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
        "EMA_ENABLED": False, "DATASET_VAL_3D_SUBSAMPLE_STEP": 10,
        "DATASET_TEST_3D_SUBSAMPLE_STEP": 25, "EVAL_FLIP": True,
    })
    hist, best_path, last_path = train_and_validate(
        config=config, out_dir=str(tmp_path / "run"), dataset_name="h36m",
        h36m_path=path_3d, dataset_2d_path=path_2d,
        train_subset="train", val_subset="val", test_subset="test")
    assert best_path is not None and os.path.exists(best_path)
    mpjpe = hist.latest_value("MPJPE")
    assert mpjpe is not None and np.isfinite(mpjpe)
