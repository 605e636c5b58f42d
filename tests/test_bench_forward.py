"""Fused bench forward (spatial+temporal Pallas splice) vs the plain model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                        init_model_params)
from uplift_upsample_tpu.models.bench_forward import bench_forward


def _flagship_small():
    """h36m_351 topology at reduced width/length (interpret mode is slow)."""
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 27, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 32,
        "TEMPORAL_EMBED_DIM": 128, "SPATIAL_TRANSFORMER_BLOCKS": 2,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3, 3],
        "PADDINGS": [[0, 0], [0, 0], [0, 0]], "NUM_HEADS": 8,
        "MASK_STRIDE": [5, 10, 20], "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.1, 0.1, 0.0],
    })
    return config


@pytest.mark.slow
def test_bench_forward_matches_model():
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)

    rng = np.random.default_rng(0)
    b, n = 4, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    _, ref = model.apply(variables, xm, stride_mask=sm, training=False)
    with pltpu.force_tpu_interpret_mode():
        got = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.HIGHEST,
                            temporal_precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_bench_forward_odd_batch_traces():
    """B not divisible by temporal_wpt=4: the kernel halves windows_per_tile
    and the strided epilogue must follow (regression: PE-tiling shape
    mismatch at TRACE time with B=2). Trace-only — the original crash was a
    trace-time shape error, so eval_shape catches it in seconds; the numeric
    check lives in the slow variant below."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=3)

    b, n = 2, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    x = jnp.zeros((b, n, 17, 2), jnp.float32)
    out = jax.eval_shape(
        lambda v, a, m: bench_forward(
            model, v, a, m, spatial_precision=jax.lax.Precision.HIGHEST,
            temporal_precision=jax.lax.Precision.HIGHEST),
        variables, x, sm)
    assert out.shape == (b, 17, 3)


@pytest.mark.slow
def test_bench_forward_odd_batch():
    """Numeric parity of the odd-batch (halved-wpt) fused path."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=3)

    rng = np.random.default_rng(3)
    b, n = 2, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    _, ref = model.apply(variables, xm, stride_mask=sm, training=False)
    with pltpu.force_tpu_interpret_mode():
        got = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.HIGHEST,
                            temporal_precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_bench_forward_tiled_matches_model():
    """Fully-tiled pipeline (fuse_s2t + banded + selection epilogue) vs the
    plain model, odd batch included."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=7)

    rng = np.random.default_rng(7)
    b, n = 2, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    _, ref = model.apply(variables, xm, stride_mask=sm, training=False)
    with pltpu.force_tpu_interpret_mode():
        got = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.HIGHEST,
                            temporal_precision=jax.lax.Precision.HIGHEST,
                            temporal_attn="banded", fuse_s2t=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_bench_forward_keyframe_sparse_matches_dense():
    """max_keyframes (spatial stack on gathered real-input frames only) must
    be EXACT vs the dense path — the model multiplies masked frames' spatial
    output by zero, and the spatial stage is frame-independent. Mixed
    per-window mask patterns (different strides and phases, counts below and
    at the bound) exercise the gather/inverse-gather logic."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=11)

    rng = np.random.default_rng(11)
    b, n = 4, config.SEQUENCE_LENGTH
    sm_np = np.zeros((b, n), dtype=bool)
    sm_np[0, 0::5] = True   # 6 keyframes (the bound)
    sm_np[1, 2::5] = True   # phase-shifted, 5
    sm_np[2, 1::10] = True  # sparser, 3
    sm_np[3, 4::7] = True   # irregular stride, 4
    sm = jnp.asarray(sm_np)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    with pltpu.force_tpu_interpret_mode():
        dense = bench_forward(model, variables, xm, sm,
                              spatial_precision=jax.lax.Precision.HIGHEST,
                              temporal_precision=jax.lax.Precision.HIGHEST)
        sparse = bench_forward(model, variables, xm, sm,
                               spatial_precision=jax.lax.Precision.HIGHEST,
                               temporal_precision=jax.lax.Precision.HIGHEST,
                               max_keyframes=6)
    # Not bit-equal: the gathered (B, KF, ·) s2t matmul blocks/accumulates in
    # a different order than the (B, N, ·) dense one. 2e-5 ≈ f32 noise.
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=2e-5, rtol=0)


def test_shared_spatial_forward_matches_dense():
    """shared_spatial_forward (per-unique-frame spatial features + gather)
    must be exact vs the dense fused path — the spatial stage and the s2t
    Dense are frame-independent. Emulates the window-sparse eval stream:
    consecutive overlapping windows, host np.unique dedup, with a
    token-sparse variant where all masked (zeroed) frames collapse into a
    single unique row."""
    from uplift_upsample_tpu.models.bench_forward import shared_spatial_forward

    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=17)

    rng = np.random.default_rng(17)
    b, n = 4, config.SEQUENCE_LENGTH
    stream = rng.normal(size=(b + n - 1, 17, 2)).astype(np.float32) * 0.3
    win_idx_np = np.arange(b)[:, None] + np.arange(n)[None, :]

    for dense_tokens in (True, False):
        if dense_tokens:
            sm_np = np.ones((b, n), bool)
        else:  # token-sparse windows (the s_in>stride protocol rungs)
            sm_np = np.zeros((b, n), bool)
            sm_np[:, ::2] = True
        xm_np = stream[win_idx_np] * sm_np[:, :, None, None]
        uniq, inv = np.unique(xm_np.reshape(b * n, -1), axis=0,
                              return_inverse=True)
        u_max = 48
        assert len(uniq) <= u_max
        if not dense_tokens:
            # all masked frames share the single all-zeros unique row (the
            # even-t mask hits every stream frame in some window, so the
            # real-frame uniques stay b+n-1; +1 for the zero row)
            assert len(uniq) <= b + n
        uq = np.zeros((u_max, 17, 2), np.float32)
        uq[:len(uniq)] = uniq.reshape(-1, 17, 2)
        idx = inv.reshape(b, n).astype(np.int32)

        sm = jnp.asarray(sm_np)
        with pltpu.force_tpu_interpret_mode():
            dense = bench_forward(
                model, variables, jnp.asarray(xm_np), sm,
                spatial_precision=jax.lax.Precision.HIGHEST,
                temporal_precision=jax.lax.Precision.HIGHEST,
                assume_dense_mask=dense_tokens)
            shared = shared_spatial_forward(
                model, variables, jnp.asarray(uq), jnp.asarray(idx), sm,
                spatial_precision=jax.lax.Precision.HIGHEST,
                temporal_precision=jax.lax.Precision.HIGHEST,
                assume_dense_mask=dense_tokens)
        np.testing.assert_allclose(np.asarray(shared), np.asarray(dense),
                                   atol=2e-5, rtol=0,
                                   err_msg=f"dense_tokens={dense_tokens}")


def test_s2t_splice_flags():
    """model(s2t_output=True) ∘ gather ∘ model(s2t_input=True) == full model
    (the XLA shared-spatial path). Frame count N=1 through the prefix must
    be accepted (frame-independent stage)."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=19)

    rng = np.random.default_rng(19)
    b, n = 3, config.SEQUENCE_LENGTH
    stream = rng.normal(size=(b + n - 1, 17, 2)).astype(np.float32) * 0.3
    win_idx_np = np.arange(b)[:, None] + np.arange(n)[None, :]
    xm_np = stream[win_idx_np]
    sm = jnp.asarray(np.ones((b, n), bool))

    _, ref = model.apply(variables, jnp.asarray(xm_np), stride_mask=sm,
                         training=False)
    feats = model.clone(s2t_output=True)
    tail = model.clone(s2t_input=True)
    y_u = feats.apply(variables, jnp.asarray(stream)[:, None], training=False)
    y = jnp.take(y_u[:, 0], jnp.asarray(win_idx_np), axis=0)
    _, central = tail.apply(variables, y, stride_mask=sm, training=False)
    np.testing.assert_allclose(np.asarray(central), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_temporal_input_splice_alone():
    """model(temporal_input=True) must equal the tail of the full model."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=1)
    # Full path vs splice on the *flax* temporal output: run the full model's
    # spatial+temporal in flax by reusing spatial_input model with an
    # identity check instead — simplest proxy: the splice with zeros input
    # produces the same output as manually running the tail params.
    rng = np.random.default_rng(1)
    b, n, d = 3, config.SEQUENCE_LENGTH, config.TEMPORAL_EMBED_DIM
    y = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    tail = model.clone(temporal_input=True)
    full, central = tail.apply(variables, y, stride_mask=sm, training=False)
    assert central.shape == (b, 17, 3)
    assert full is not None and full.shape == (b, n, 17, 3)


@pytest.mark.slow
@pytest.mark.parametrize("pads,n", [((1, 1), 41), ((1, 0), 43), ((0, 1), 43)])
def test_bench_forward_padded_strides(pads, n):
    """h36m_81-style geometry (padding (1,1) on block 1, plus the asymmetric
    combinations at a length where the downstream stack stays non-empty):
    the padded strided-epilogue (zero-padded conv taps via h1 lane masking,
    residual cropped only at unpadded ends) must match the model. Before
    round 4 padded geometries fell back to the XLA strided stack; now they
    fuse like the (0,0) configs."""
    config = _flagship_small()
    config.update_from({"STRIDES": [4, 4, 3],
                        "PADDINGS": [list(pads), [0, 0], [0, 0]],
                        "SEQUENCE_LENGTH": n, "MASK_STRIDE": [4, 10, 20]})
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=5)

    rng = np.random.default_rng(5)
    b, n = 4, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 4 == 0))[None].repeat(b, axis=0)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    _, ref = model.apply(variables, xm, stride_mask=sm, training=False)
    with pltpu.force_tpu_interpret_mode():
        got = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.HIGHEST,
                            temporal_precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_shared_spatial_padded_strides():
    """The shared-spatial eval default on the padded h36m_81 geometry (the
    configuration bench.py --config h36m_81 actually times) must match the
    dense fused path."""
    from uplift_upsample_tpu.models.bench_forward import shared_spatial_forward

    config = _flagship_small()
    config.update_from({"STRIDES": [4, 4, 3],
                        "PADDINGS": [[1, 1], [0, 0], [0, 0]],
                        "SEQUENCE_LENGTH": 41, "MASK_STRIDE": [4, 10, 20]})
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=23)

    rng = np.random.default_rng(23)
    b, n = 4, config.SEQUENCE_LENGTH
    stream = rng.normal(size=(b + n - 1, 17, 2)).astype(np.float32) * 0.3
    win_idx_np = np.arange(b)[:, None] + np.arange(n)[None, :]
    sm_np = np.zeros((b, n), bool)
    sm_np[:, ::4] = True
    xm_np = (stream[win_idx_np] * sm_np[:, :, None, None]).astype(np.float32)
    uniq, inv = np.unique(xm_np.reshape(b * n, -1), axis=0,
                          return_inverse=True)
    u_max = 56
    assert len(uniq) <= u_max
    uq = np.zeros((u_max, 17, 2), np.float32)
    uq[:len(uniq)] = uniq.reshape(-1, 17, 2)
    idx = inv.reshape(b, n).astype(np.int32)

    sm = jnp.asarray(sm_np)
    with pltpu.force_tpu_interpret_mode():
        dense = bench_forward(model, variables, jnp.asarray(xm_np), sm,
                              spatial_precision=jax.lax.Precision.HIGHEST,
                              temporal_precision=jax.lax.Precision.HIGHEST)
        shared = shared_spatial_forward(
            model, variables, jnp.asarray(uq), jnp.asarray(idx), sm,
            spatial_precision=jax.lax.Precision.HIGHEST,
            temporal_precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(dense),
                               atol=2e-5, rtol=0)


def test_bench_forward_strided_sel_matches_slice():
    """strided_sel=True (in-kernel one-hot lane selection replacing the
    epilogue's lane shifts + the caller's XLA stride slice) must match the
    default path — same math re-expressed as selection dots (round-9;
    measured perf-neutral on chip, kept off by default)."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=29)

    rng = np.random.default_rng(29)
    b, n = 4, config.SEQUENCE_LENGTH
    sm = jnp.asarray((np.arange(n) % 5 == 0))[None].repeat(b, axis=0)
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)
    xm = x * sm[:, :, None, None].astype(x.dtype)

    with pltpu.force_tpu_interpret_mode():
        base = bench_forward(model, variables, xm, sm,
                             spatial_precision=jax.lax.Precision.HIGHEST,
                             temporal_precision=jax.lax.Precision.HIGHEST)
        sel = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.HIGHEST,
                            temporal_precision=jax.lax.Precision.HIGHEST,
                            strided_sel=True)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(base),
                               atol=2e-5, rtol=0)


def test_resolve_temporal_wpt():
    """EVAL_TEMPORAL_WPT auto rule: 8 only when it lane-aligns R=wpt*s_pad
    to 128 and wpt=4 does not (h36m_81 s_pad=48 → 8; flagship s_pad=72 → 4;
    s_pad already 128-aligned at wpt=4 → stay 4). Explicit ints win."""
    from uplift_upsample_tpu.eval import resolve_temporal_wpt

    assert resolve_temporal_wpt("auto", 41) == 8    # s_pad 48, R 384 = 3*128
    assert resolve_temporal_wpt(None, 41) == 8
    assert resolve_temporal_wpt("auto", 71) == 4    # s_pad 72: neither aligns
    assert resolve_temporal_wpt("auto", 27) == 4    # s_pad 32: both align
    assert resolve_temporal_wpt("auto", 9) == 8     # s_pad 16, R 128
    assert resolve_temporal_wpt(2, 41) == 2
    assert resolve_temporal_wpt("4", 41) == 4


def test_bench_forward_assume_dense_mask_matches():
    """assume_dense_mask=True (key-mask machinery skipped) must equal the
    default path when the stride mask is genuinely all-ones."""
    config = _flagship_small()
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=13)

    rng = np.random.default_rng(13)
    b, n = 4, config.SEQUENCE_LENGTH
    sm = jnp.asarray(np.ones((b, n), dtype=bool))
    x = jnp.asarray(rng.normal(size=(b, n, 17, 2)).astype(np.float32) * 0.3)

    with pltpu.force_tpu_interpret_mode():
        base = bench_forward(model, variables, x, sm,
                             spatial_precision=jax.lax.Precision.HIGHEST,
                             temporal_precision=jax.lax.Precision.HIGHEST)
        dense = bench_forward(model, variables, x, sm,
                              spatial_precision=jax.lax.Precision.HIGHEST,
                              temporal_precision=jax.lax.Precision.HIGHEST,
                              assume_dense_mask=True)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(base),
                               atol=1e-6, rtol=1e-6)
