"""End-to-end eval-harness parity vs reference eval.py (fixture-based).

The fixture (tools/make_eval_fixture.py) records the reference pipeline's
printed metrics on synthetic data with fixture weights. The same eval through
the new harness must reproduce them to within float32-forward noise (~0.03mm
at these random-weight magnitudes).
"""

import json
import os

import numpy as np
import pytest

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.eval import run_eval

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")


@pytest.mark.parametrize("mask_stride", [5, 10])
def test_eval_parity(mask_stride):
    ref_path = os.path.join(FIXTURE_DIR, "eval_parity.json")
    if not os.path.exists(ref_path):
        pytest.skip("run tools/make_eval_fixture.py")
    with open(ref_path) as f:
        ref = json.load(f)[str(mask_stride)]

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = mask_stride

    all_frames, keyframes = run_eval(
        config=config, dataset_name="h36m",
        dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
        test_subset="test",
        weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
        action_wise=True, verbose=False)

    for section, mine in (("all_frames", all_frames), ("keyframes", keyframes)):
        frame_results = mine[0]
        for metric, ref_value in ref[section]["frame"].items():
            np.testing.assert_allclose(
                frame_results[metric], ref_value, atol=5e-2, rtol=1e-4,
                err_msg=f"{section}/{metric} (mask_stride={mask_stride})")


def test_eval_window_sparse_matches_dense():
    """EVAL_SKIP_INTERPOLATED_WINDOWS must not change any reported metric:
    skipped windows' predictions are interpolation-only in the strided
    protocol. A/B on the synthetic fixture, including the packed-batch
    boundary handling (batch size does not divide the keyframe count)."""
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5

    results = {}
    for sparse in (False, True):
        config.EVAL_SKIP_INTERPOLATED_WINDOWS = sparse
        results[sparse] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):  # all_frames, keyframes
        dense_frame, sparse_frame = results[False][section][0], results[True][section][0]
        for metric, dense_value in dense_frame.items():
            np.testing.assert_allclose(
                sparse_frame[metric], dense_value, atol=1e-9, rtol=1e-9,
                err_msg=f"section {section}/{metric}")


def test_eval_window_sparse_disable_learned_upsampling():
    """The EVAL_DISABLE_LEARNED_UPSAMPLING branch (keyframe stride =
    MASK_STRIDE instead of SEQUENCE_STRIDE) must also be window-sparse-safe:
    A/B identical metrics with the skip on and off."""
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 10
    config.EVAL_DISABLE_LEARNED_UPSAMPLING = True

    results = {}
    for sparse in (False, True):
        config.EVAL_SKIP_INTERPOLATED_WINDOWS = sparse
        results[sparse] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):
        dense_frame = results[False][section][0]
        sparse_frame = results[True][section][0]
        for metric, dense_value in dense_frame.items():
            np.testing.assert_allclose(
                sparse_frame[metric], dense_value, atol=1e-9, rtol=1e-9,
                err_msg=f"disable-upsampling section {section}/{metric}")


@pytest.mark.slow
def test_eval_parity_fused_full():
    """The benchmark configuration (EVAL_FUSED=full) through the eval harness.

    Runs the fused Pallas path in interpreter mode on the small fixture;
    guards that the bench and parity configurations are one and the same
    (the fused path must reproduce the reference metrics too).
    """
    from jax.experimental.pallas import tpu as pltpu

    ref_path = os.path.join(FIXTURE_DIR, "eval_parity.json")
    if not os.path.exists(ref_path):
        pytest.skip("run tools/make_eval_fixture.py")
    with open(ref_path) as f:
        ref = json.load(f)["5"]

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5
    config.EVAL_FUSED = "full"

    with pltpu.force_tpu_interpret_mode():
        all_frames, keyframes = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section, mine in (("all_frames", all_frames), ("keyframes", keyframes)):
        frame_results = mine[0]
        for metric, ref_value in ref[section]["frame"].items():
            np.testing.assert_allclose(
                frame_results[metric], ref_value, atol=5e-2, rtol=1e-4,
                err_msg=f"fused-full {section}/{metric}")


def test_eval_shared_spatial_matches_dense():
    """EVAL_SHARED_SPATIAL (per-frame spatial features computed once per
    unique masked frame, gathered into windows) must not change any reported
    metric — the spatial stage is frame-independent. A/B on the XLA path
    (CPU), flip-TTA on (fixture config), window-sparse protocol active."""
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5
    # bit-identity only holds on identical execution: pin single-device so
    # the shared and dense steps don't run under different shardings
    config.DATA_PARALLEL_DEVICES = 1

    results = {}
    for shared in (False, True):
        config.EVAL_SHARED_SPATIAL = shared
        results[shared] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):  # all_frames, keyframes
        dense_frame = results[False][section][0]
        shared_frame = results[True][section][0]
        for metric, dense_value in dense_frame.items():
            np.testing.assert_allclose(
                shared_frame[metric], dense_value, atol=1e-9, rtol=1e-9,
                err_msg=f"shared-spatial section {section}/{metric}")


def test_eval_shared_spatial_capacity_fallback():
    """Batches whose unique-frame count exceeds the static step capacity
    must fall back to the dense step with identical metrics (the capacity
    is a throughput knob, never a correctness one)."""
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5
    config.EVAL_SHARED_SPATIAL = True
    config.DATA_PARALLEL_DEVICES = 1  # see test_eval_shared_spatial_matches_dense

    results = {}
    for extra in (1024, -10_000):  # normal capacity vs force-fallback
        config.EVAL_SHARED_UMAX_EXTRA = extra
        results[extra] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):
        a, b = results[1024][section][0], results[-10_000][section][0]
        for metric, value in a.items():
            np.testing.assert_allclose(
                b[metric], value, atol=1e-9, rtol=1e-9,
                err_msg=f"capacity-fallback section {section}/{metric}")


@pytest.mark.slow
def test_eval_parity_fused_full_shared():
    """The full bench configuration (EVAL_FUSED=full + shared spatial stage,
    interpret mode) must still reproduce the reference fixture metrics."""
    from jax.experimental.pallas import tpu as pltpu

    ref_path = os.path.join(FIXTURE_DIR, "eval_parity.json")
    if not os.path.exists(ref_path):
        pytest.skip("run tools/make_eval_fixture.py")
    with open(ref_path) as f:
        ref = json.load(f)["5"]

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5
    config.EVAL_FUSED = "full"
    config.EVAL_SHARED_SPATIAL = True

    with pltpu.force_tpu_interpret_mode():
        all_frames, keyframes = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section, mine in (("all_frames", all_frames), ("keyframes", keyframes)):
        frame_results = mine[0]
        for metric, ref_value in ref[section]["frame"].items():
            np.testing.assert_allclose(
                frame_results[metric], ref_value, atol=5e-2, rtol=1e-4,
                err_msg=f"fused-full-shared {section}/{metric}")


def test_sparse_rows_to_compute():
    """Row selection for window-sparse eval: keyframes plus the
    interpolation-untouched rows before a sequence's first keyframe,
    with restart detection and cross-batch state carry."""
    from uplift_upsample_tpu.eval import sparse_rows_to_compute

    # Sequence starting OFF-keyframe: rows 0,1 precede the first keyframe
    # (index 10) — interpolation keeps their raw predictions, so they must
    # be computed; rows after a keyframe follow the normal % rule.
    state = [None, False]
    rows = sparse_rows_to_compute([3, 7, 10, 11, 15, 20], 5, state)
    assert rows == [0, 1, 2, 4, 5]

    # Restart (non-increasing index) resets the seen-keyframe flag even
    # across a batch boundary via the carried state.
    rows2 = sparse_rows_to_compute([21, 2, 4, 5, 9, 10], 5, state)
    #          idx:                  21  2  4  5  9  10
    # 21: not kf, seen_kf from prev batch -> skip; 2: restart, not kf,
    # unseen -> compute; 4: compute; 5: kf; 9: skip; 10: kf
    assert rows2 == [1, 2, 3, 5]

    # Fully aligned stream: plain keyframe selection.
    state3 = [None, False]
    rows3 = sparse_rows_to_compute([0, 1, 2, 3, 4, 5], 5, state3)
    assert rows3 == [0, 5]


def test_eval_data_parallel_matches_single_device():
    """run_eval over the 8-virtual-device dp mesh (the DATA_PARALLEL_DEVICES
    auto default when multiple devices are visible) must reproduce the
    single-device metrics to partition-reorder noise."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5

    results = {}
    for dp in (1, 8):
        config.DATA_PARALLEL_DEVICES = dp
        results[dp] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):
        single, sharded = results[1][section][0], results[8][section][0]
        for metric, value in single.items():
            np.testing.assert_allclose(
                sharded[metric], value, atol=1e-4, rtol=1e-7,
                err_msg=f"dp-eval section {section}/{metric}")


def test_eval_packed_upload_matches_unpacked():
    """EVAL_PACKED_UPLOAD (one uint8 byte-packed host→device transfer per
    flush: f32 frame bytes + int16 indices + bit-packed masks) must be
    bit-exact vs the three-array path — identical metrics on the shared
    window-sparse protocol."""
    if not os.path.exists(os.path.join(FIXTURE_DIR, "eval_parity.json")):
        pytest.skip("run tools/make_eval_fixture.py")

    config = UpliftUpsampleConfig(
        config_file=os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    config.MASK_STRIDE = 5
    config.EVAL_SHARED_SPATIAL = True
    config.DATA_PARALLEL_DEVICES = 1

    results = {}
    for packed in (False, True):
        config.EVAL_PACKED_UPLOAD = packed
        results[packed] = run_eval(
            config=config, dataset_name="h36m",
            dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            test_subset="test",
            weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
            action_wise=True, verbose=False)

    for section in (0, 1):  # all_frames, keyframes
        for metric, v in results[False][section][0].items():
            np.testing.assert_array_equal(
                results[True][section][0][metric], v,
                err_msg=f"packed-upload section {section}/{metric}")
