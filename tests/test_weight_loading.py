"""Name-based partial h5 loading with mismatch diagnostics.

Mirrors the reference loader's tolerance/reporting semantics
(`/root/reference/common/utils/weight_io.py:76-263`): load what matches by
layer name, keep initialization for the rest, report unconsumed/unassigned
layers and weights, raise on shape clashes unless skip_mismatch.
"""

import os
import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from uplift_upsample_tpu.models import (UpliftUpsampleTransformer,  # noqa: E402
                                        init_model_params)
from uplift_upsample_tpu.utils.weights_h5 import (load_keras_h5,  # noqa: E402
                                                  load_keras_h5_by_name,
                                                  save_keras_h5)

BASE = dict(
    num_frames=9, num_keypoints=17, spatial_d_model=16, temporal_d_model=32,
    spatial_depth=2, temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)),
    num_heads=4, mlp_ratio=2.0, qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
    has_strided_input=True, first_strided_token_attention_layer=1)


def _make_checkpoint(tmp, **overrides):
    kwargs = dict(BASE, **overrides)
    model = UpliftUpsampleTransformer(**kwargs)
    variables = init_model_params(model, seed=3)
    path = os.path.join(tmp, "ckpt.h5")
    save_keras_h5(path, variables, model)
    return model, variables, path


def test_partial_load_fewer_temporal_blocks():
    """File has 2 temporal blocks; model expects 3 → block 3 stays initialized
    and is reported unassigned; everything else loads."""
    with tempfile.TemporaryDirectory() as tmp:
        src_model, src_vars, path = _make_checkpoint(tmp)
        dst_model = UpliftUpsampleTransformer(**dict(BASE, temporal_depth=3))
        template = init_model_params(dst_model, seed=7)
        loaded, report = load_keras_h5_by_name(path, dst_model,
                                               template=template, verbose=False)
        assert "temporal_block_3" in report.unassigned_layers
        assert not report.unconsumed_layers and not report.mismatched
        # Matched layer took the file's values...
        np.testing.assert_array_equal(
            loaded["params"]["temporal_block_1"]["attn"]["wq"]["kernel"],
            np.asarray(src_vars["params"]["temporal_block_1"]["attn"]["wq"]["kernel"]))
        # ...and the absent layer kept the template's initialization.
        np.testing.assert_array_equal(
            loaded["params"]["temporal_block_3"]["attn"]["wq"]["kernel"],
            np.asarray(template["params"]["temporal_block_3"]["attn"]["wq"]["kernel"]))


def test_partial_load_extra_file_layers_unconsumed():
    """File has more temporal blocks than the model → extras reported."""
    with tempfile.TemporaryDirectory() as tmp:
        _, _, path = _make_checkpoint(tmp, temporal_depth=3)
        dst_model = UpliftUpsampleTransformer(**BASE)
        template = init_model_params(dst_model, seed=7)
        loaded, report = load_keras_h5_by_name(path, dst_model,
                                               template=template, verbose=False)
        assert report.unconsumed_layers == ["temporal_block_3"]
        assert not report.unassigned_layers
        full, central = dst_model.apply(
            loaded, np.zeros((1, 9, 17, 2), np.float32),
            stride_mask=np.ones((1, 9), bool), training=False)
        assert central.shape == (1, 17, 3)


def test_shape_mismatch_raises_then_skips():
    """Different temporal width → ValueError; skip_mismatch loads the rest."""
    with tempfile.TemporaryDirectory() as tmp:
        _, src_vars, path = _make_checkpoint(tmp, temporal_d_model=48)
        dst_model = UpliftUpsampleTransformer(**BASE)
        template = init_model_params(dst_model, seed=7)
        with pytest.raises(ValueError, match="[Ss]hape"):
            load_keras_h5_by_name(path, dst_model, template=template,
                                  verbose=False)
        loaded, report = load_keras_h5_by_name(path, dst_model,
                                               template=template,
                                               skip_mismatch=True, verbose=False)
        assert report.mismatched, "expected skipped shape clashes to be reported"
        # The spatial stage (same width in both configs) still loads.
        np.testing.assert_array_equal(
            loaded["params"]["spatial_block_1"]["attn"]["wq"]["kernel"],
            np.asarray(src_vars["params"]["spatial_block_1"]["attn"]["wq"]["kernel"]))
        # Mismatched weights keep the template values (correct dst shapes).
        assert (loaded["params"]["temporal_block_1"]["attn"]["wq"]["kernel"].shape
                == template["params"]["temporal_block_1"]["attn"]["wq"]["kernel"].shape)


def test_transform_applied_per_weight():
    with tempfile.TemporaryDirectory() as tmp:
        _, src_vars, path = _make_checkpoint(tmp)
        model = UpliftUpsampleTransformer(**BASE)
        template = init_model_params(model, seed=7)
        seen = []

        def transform(p, v):
            seen.append(p)
            return v * 2.0 if p == "temporal_pe" else v

        loaded, _ = load_keras_h5_by_name(path, model, template=template,
                                          transform=transform, verbose=False)
        assert "temporal_pe" in seen and len(seen) > 10
        np.testing.assert_allclose(
            loaded["params"]["temporal_pe"],
            2.0 * np.asarray(src_vars["params"]["temporal_pe"]), rtol=1e-6)


def test_strict_loader_reports_missing_layer():
    """load_keras_h5 (strict) raises with a diagnostic, not a bare KeyError."""
    with tempfile.TemporaryDirectory() as tmp:
        _, _, path = _make_checkpoint(tmp)
        bigger = UpliftUpsampleTransformer(**dict(BASE, temporal_depth=3))
        with pytest.raises(KeyError, match="temporal_block_3"):
            load_keras_h5(path, bigger)


def test_report_summary_format():
    with tempfile.TemporaryDirectory() as tmp:
        _, _, path = _make_checkpoint(tmp, temporal_depth=3)
        dst_model = UpliftUpsampleTransformer(**dict(BASE, temporal_depth=1))
        template = init_model_params(dst_model, seed=7)
        _, report = load_keras_h5_by_name(path, dst_model, template=template,
                                          verbose=False)
        text = report.summary()
        assert "not consumed from .h5 file" in text
        assert not report.fully_matched


def test_strict_load_rejects_wrong_geometry():
    """A checkpoint from a different model geometry must fail AT LOAD with an
    actionable message, not later with a broadcast error inside the forward
    (reference fails at load via weight_io.py shape checks). Found by the
    full-scale dress rehearsal: 71-frame h36m_351 weights into the 27-frame
    default-config model loaded silently (shapes came from the file) and
    crashed at `y + temporal_pe`."""
    with tempfile.TemporaryDirectory() as tmp:
        _, _, path = _make_checkpoint(tmp)  # 9-frame model
        dst_model = UpliftUpsampleTransformer(**dict(BASE, num_frames=15))
        with pytest.raises(ValueError, match="--config"):
            load_keras_h5(path, dst_model)
        # Same-geometry load still passes validation.
        ok_model = UpliftUpsampleTransformer(**BASE)
        loaded = load_keras_h5(path, ok_model)
        assert loaded["params"]["temporal_pe"].shape[0] == 9
