"""Inference CLI end-to-end on synthetic 2D keypoints."""

import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_predict_cli(tmp_path):
    if not os.path.exists(os.path.join(FIXTURE_DIR, "small_strided.h5")):
        pytest.skip("fixtures missing")
    from uplift_upsample_tpu.predict import main

    rng = np.random.default_rng(3)
    inp = tmp_path / "kps.npz"
    out = tmp_path / "pred.npz"
    np.savez(inp, positions_2d=rng.normal(size=(120, 17, 2)).astype(np.float32) * 0.3)

    main(["--weights", os.path.join(FIXTURE_DIR, "small_strided.h5"),
          "--config", os.path.join(FIXTURE_DIR, "eval_small_config.json"),
          "--input", str(inp), "--output", str(out)])

    pred = np.load(out)["sequence"]
    assert pred.shape == (120, 17, 3)
    assert np.isfinite(pred).all()
    # Keyframes (stride 5) must carry raw model predictions; in-between frames
    # are linear interpolations of their neighbors
    k0, k5 = pred[0], pred[5]
    np.testing.assert_allclose(pred[2], k0 * 0.6 + k5 * 0.4, atol=1e-5)


def _load_small_model():
    from uplift_upsample_tpu.configs import resolve_config
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    h5 = os.path.join(FIXTURE_DIR, "small_strided.h5")
    if not os.path.exists(h5):
        pytest.skip("fixtures missing")
    config = resolve_config(os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    if isinstance(config.MASK_STRIDE, list):
        config.MASK_STRIDE = config.MASK_STRIDE[0]
    model = build_uplift_upsample_transformer(config)
    variables = load_keras_h5(h5, model)
    return config, model, variables


def test_predict_matches_manual_windows_golden():
    """predict_sequence == hand-rolled protocol: clipped-gather windows at
    SEQUENCE_STRIDE through plain model.apply, then keyframe interpolation
    (the same math run_eval reports metrics on — reference eval.py:147-222).
    Pins the generator wiring, batching/flush order, and interpolation
    placement independently of make_test_step."""
    import jax.numpy as jnp
    from uplift_upsample_tpu.predict import predict_sequence
    from uplift_upsample_tpu.utils.eval_protocol import (
        interpolate_between_keyframes)

    config, model, variables = _load_small_model()
    rng = np.random.default_rng(11)
    t = 57  # deliberately not a stride multiple (trailing copy-forward path)
    kps = (rng.normal(size=(t, 17, 2)) * 0.3).astype(np.float32)

    got = predict_sequence(model, variables, config, kps, flip_tta=False)

    # Manual protocol: window per frame, edge-padded, stride-masked input.
    # Edge rule (reference uplifiting_dataset.py:349-375, slice-then-np.pad):
    # out-of-range slots replicate the first/last SAMPLED in-range frame
    # (e.g. center 37, stride 5, t=57: slot 57 → 52, not 56).
    n, s = config.SEQUENCE_LENGTH, config.SEQUENCE_STRIDE
    ms = config.MASK_STRIDE
    left = (n - 1) * s // 2
    preds = []
    for center in range(t):
        pos = center - left + np.arange(n) * s
        in_range = pos[(pos >= 0) & (pos < t)]
        idx = np.where(pos < 0, in_range[0],
                       np.where(pos >= t, in_range[-1], pos))
        window = kps[idx]
        # global stride-mask alignment: real tokens where the global frame
        # index is a MASK_STRIDE multiple (generator stride_mask_align_global)
        sm = ((center - left + np.arange(n) * s) % ms) == 0 if ms else \
            np.ones(n, bool)
        x = window * sm[:, None, None]
        _, central = model.apply(variables, jnp.asarray(x[None]),
                                 stride_mask=jnp.asarray(sm[None]),
                                 training=False)
        preds.append(np.asarray(central[0], np.float64))
    manual = np.stack(preds)
    manual, _ = interpolate_between_keyframes(
        manual, np.arange(t), np.full(t, s))

    np.testing.assert_allclose(got, manual.astype(np.float32),
                               atol=2e-5, rtol=1e-4)


def test_predict_vp3d_input_order(tmp_path):
    """--input_order vp3d (VideoPose3D 17p) must equal the canonical-order
    run after the to_our_17p_order() remap (reference keypoint_order.py)."""
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17POriginalOrder
    from uplift_upsample_tpu.predict import main

    if not os.path.exists(os.path.join(FIXTURE_DIR, "small_strided.h5")):
        pytest.skip("fixtures missing")
    rng = np.random.default_rng(5)
    kps_ours = (rng.normal(size=(40, 17, 2)) * 0.3).astype(np.float32)
    # store rows in vp3d order: ours[i] = vp3d[to_our[i]] → vp3d[j] = ours[inv]
    to_our = np.asarray(H36MOrder17POriginalOrder.to_our_17p_order())
    kps_vp3d = np.empty_like(kps_ours)
    kps_vp3d[:, to_our] = kps_ours

    outs = {}
    for order, kps in (("ours", kps_ours), ("vp3d", kps_vp3d)):
        inp = tmp_path / f"kps_{order}.npz"
        out = tmp_path / f"pred_{order}.npz"
        np.savez(inp, positions_2d=kps)
        main(["--weights", os.path.join(FIXTURE_DIR, "small_strided.h5"),
              "--config", os.path.join(FIXTURE_DIR, "eval_small_config.json"),
              "--input", str(inp), "--output", str(out),
              "--input_order", order, "--no_flip_tta"])
        outs[order] = np.load(out)["sequence"]
    np.testing.assert_array_equal(outs["ours"], outs["vp3d"])


def test_predict_flip_tta_equivariance_and_multiseq(tmp_path):
    """Flip-TTA makes prediction exactly L/R-equivariant: predicting the
    flipped input (x-negated + L/R joint swap, reference eval.py:154-180)
    returns the flip-map of the original prediction. Also covers dict
    (multi-sequence) npz input and that TTA actually changes the output."""
    from uplift_upsample_tpu.configs import resolve_config
    from uplift_upsample_tpu.predict import main

    if not os.path.exists(os.path.join(FIXTURE_DIR, "small_strided.h5")):
        pytest.skip("fixtures missing")
    config = resolve_config(os.path.join(FIXTURE_DIR, "eval_small_config.json"))
    flip_idx = np.asarray(config.AUGM_FLIP_KEYPOINT_ORDER)

    rng = np.random.default_rng(9)
    kps = (rng.normal(size=(35, 17, 2)) * 0.3).astype(np.float32)
    kps_flipped = np.concatenate([-kps[..., :1], kps[..., 1:]], axis=-1)
    kps_flipped = kps_flipped[:, flip_idx]

    inp = tmp_path / "kps_multi.npz"
    np.savez(inp, positions_2d=np.array(
        {"orig": kps, "flipped": kps_flipped}, dtype=object))

    out_tta = tmp_path / "pred_tta.npz"
    main(["--weights", os.path.join(FIXTURE_DIR, "small_strided.h5"),
          "--config", os.path.join(FIXTURE_DIR, "eval_small_config.json"),
          "--input", str(inp), "--output", str(out_tta)])
    preds = np.load(out_tta)
    p_orig, p_flip = preds["orig"], preds["flipped"]
    assert p_orig.shape == p_flip.shape == (35, 17, 3)
    # equivariance: pred(flip(x)) == flipmap(pred(x)) under TTA averaging
    expected = np.concatenate([-p_orig[..., :1], p_orig[..., 1:]], axis=-1)
    expected = expected[:, flip_idx]
    np.testing.assert_allclose(p_flip, expected, atol=2e-5, rtol=1e-4)

    # and TTA is not a no-op: the no-TTA run differs
    out_no = tmp_path / "pred_no.npz"
    main(["--weights", os.path.join(FIXTURE_DIR, "small_strided.h5"),
          "--config", os.path.join(FIXTURE_DIR, "eval_small_config.json"),
          "--input", str(inp), "--output", str(out_no), "--no_flip_tta"])
    p_no = np.load(out_no)["orig"]
    assert np.abs(p_no - p_orig).max() > 1e-6
