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
