"""Metric unit tests against hand-computed values (SURVEY §4 strategy)."""

import numpy as np

from uplift_upsample_tpu.utils.eval_protocol import interpolate_between_keyframes
from uplift_upsample_tpu.utils.metrics import (compute_similarity_transform, mpjpe,
                                               nmpjpe, pmpjpe)


def _gt(pose, valid=None):
    v = np.ones(pose.shape[:-1] + (1,)) if valid is None else valid[..., None]
    return np.concatenate([pose, v], axis=-1)


def test_mpjpe_hand_computed():
    # Root at index 0; prediction offset by a constant must be fully root-aligned away
    gt = np.zeros((1, 3, 3))
    gt[0, 1] = [1, 0, 0]
    gt[0, 2] = [0, 2, 0]
    pred = gt[0].copy() + [5.0, -3.0, 2.0]  # constant offset
    assert np.isclose(mpjpe(pred[None], _gt(gt), root_index=0), 0.0)

    # Move joint 1 by 0.3 along z → error 0.3 on one of three joints
    pred2 = gt[0].copy()
    pred2[1, 2] += 0.3
    assert np.isclose(mpjpe(pred2[None], _gt(gt), root_index=0), 0.1)


def test_mpjpe_valid_flags():
    gt = np.zeros((1, 2, 3))
    gt[0, 1] = [1, 0, 0]
    pred = gt[0].copy()
    pred[1, 0] = 2.0  # error 1.0 at joint 1
    valid = np.array([[1.0, 0.0]])  # joint 1 invalid
    assert np.isclose(mpjpe(pred[None], _gt(gt, valid), root_index=0), 0.0)
    per_joint = mpjpe(pred[None], _gt(gt, valid), root_index=0, normalize=False)
    assert per_joint[0, 1] == -1.0


def test_nmpjpe_optimal_scale():
    # Prediction = 2x ground truth → optimal scaling recovers it exactly
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(2, 5, 3))
    gt -= gt[:, [0]]
    pred = 2.0 * gt
    assert np.isclose(nmpjpe(pred, _gt(gt), root_index=0), 0.0, atol=1e-12)


def test_pmpjpe_rotation_scale_translation():
    # Prediction = rotated + scaled + translated gt → Procrustes removes all
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(1, 6, 3))
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1.0]])
    pred = 1.7 * gt[0] @ rot.T + np.array([3.0, -1.0, 0.5])
    assert pmpjpe(pred[None], _gt(gt)) < 1e-9


def test_similarity_transform_reflection_guard():
    # Y mirrored: the transform must still be a proper rotation (det +1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, 3))
    y = x.copy()
    y[:, 0] *= -1
    _, _, T, _, _ = compute_similarity_transform(x, y)
    assert np.isclose(np.linalg.det(T), 1.0, atol=1e-9)


def test_interpolation_sequence_restart():
    # Frame indices restart mid-array → no interpolation across the boundary
    pred = np.arange(8, dtype=np.float64)[:, None, None] * np.ones((1, 1, 3))
    indices = np.array([0, 5, 7, 0, 5, 7, 10, 11])
    interp, keyframes = interpolate_between_keyframes(pred, indices, 5)
    # Non-keyframe idx 7 (pos 2) copies the last keyframe (pos 1): the
    # sequence restarts at pos 3, so no interpolation crosses the boundary
    assert np.allclose(interp[2], pred[1])
    # After the restart, pos 5 (idx 7) interpolates between keyframes 4 and 6
    assert np.allclose(interp[5], (pred[4] + pred[6]) / 2)
    # idx 10 is a keyframe
    assert keyframes[6]


def test_interpolation_linear_weights():
    pred = np.zeros((3, 1, 3))
    pred[0] = 0.0
    pred[2] = 10.0
    indices = np.array([0, 3, 5])
    interp, _ = interpolate_between_keyframes(pred, indices, 5)
    # position 1 (non-keyframe) between keyframes at 0 and 2: w = (1-0)/(2-0)
    assert np.allclose(interp[1], 5.0)


def test_action_wise_eval_skips_absent_actions():
    """Absent actions must not NaN-propagate into the cross-action mean."""
    from uplift_upsample_tpu.utils.eval_protocol import h36_action_wise_eval

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(20, 17, 3))
    gt = np.concatenate([pred + 0.001 * rng.normal(size=pred.shape),
                         np.ones((20, 17, 1))], axis=-1)  # xyz + valid flag
    actions = np.array([0] * 10 + [3] * 10)  # only 2 of 15 actions present
    frame_results, average_results, per_action = h36_action_wise_eval(
        pred_3d=pred, gt_3d=gt, actions=actions, root_index=0)
    assert len(per_action) == 2
    for name, value in average_results.items():
        assert np.isfinite(value), (name, value)
    assert np.isfinite(frame_results["mpjpe"])


def test_interpolation_leading_nonkeyframe_keeps_raw():
    """A sequence that starts off-keyframe keeps its raw predictions."""
    from uplift_upsample_tpu.utils.eval_protocol import interpolate_between_keyframes

    pred = np.arange(4, dtype=np.float64)[:, None, None] * np.ones((1, 1, 3))
    indices = np.array([3, 5, 7, 10])
    interp, keyframes = interpolate_between_keyframes(pred, indices, 5)
    assert not keyframes[0]
    assert np.allclose(interp[0], pred[0])


def test_pmpjpe_batched_matches_reference_loop():
    """The batched Procrustes path must reproduce the per-example reference
    loop (compute_similarity_transform) to float64 round-off, including
    reflection cases."""
    from uplift_upsample_tpu.utils.metrics import (
        _procrustes_align_batched, compute_similarity_transform)

    rng = np.random.default_rng(41)
    gt3d = rng.normal(size=(64, 17, 3))
    pred = rng.normal(size=(64, 17, 3)) * 0.9 + gt3d * 0.3
    # Force some reflection-guard activations: mirrored predictions
    pred[::5] = pred[::5] * np.asarray([-1.0, 1.0, 1.0])

    batched = _procrustes_align_batched(pred, gt3d)
    for i in range(len(pred)):
        _, ref_aligned, _, _, _ = compute_similarity_transform(
            X=gt3d[i], Y=pred[i], compute_optimal_scale=True)
        np.testing.assert_allclose(batched[i], ref_aligned,
                                   rtol=1e-10, atol=1e-12,
                                   err_msg=f"row {i}")


def test_interpolation_vectorized_matches_loop():
    """Vectorized interpolate_between_keyframes must be bit-identical to the
    reference per-row loop across random sequence-restart/keyframe layouts,
    including leading non-keyframes and per-frame stride arrays."""
    from uplift_upsample_tpu.utils.eval_protocol import (
        _interpolate_loop, interpolate_between_keyframes)

    rng = np.random.default_rng(43)
    for case in range(8):
        m = int(rng.integers(1, 400))
        # random frame-index stream with restarts: concatenated ascending runs
        idx, start = [], int(rng.integers(0, 7))
        while len(idx) < m:
            run = int(rng.integers(1, 60))
            first = int(rng.integers(0, 5))
            idx.extend(range(first, first + run))
        idx = np.asarray(idx[:m])
        stride = (int(rng.integers(1, 6)) if case % 2 == 0
                  else rng.integers(1, 6, size=m))
        pred = rng.normal(size=(m, 17, 3))
        got, kf = interpolate_between_keyframes(pred, idx, stride)
        ref_kf = np.equal(np.mod(idx, stride), 0)
        ref = _interpolate_loop(pred, idx, ref_kf)
        np.testing.assert_array_equal(kf, ref_kf, err_msg=f"case {case}")
        np.testing.assert_array_equal(got, ref, err_msg=f"case {case}")
