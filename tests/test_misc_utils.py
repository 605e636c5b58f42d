"""Small utility behaviors: txt config mode, weight-prefix resolution, EMA math."""

import os

import numpy as np

from uplift_upsample_tpu.config import UpliftUpsampleConfig


def test_config_txt_mode(tmp_path):
    path = tmp_path / "cfg.txt"
    path.write_text(
        "# comment line\n"
        "BATCH_SIZE 128\n"
        "MASK_STRIDE [5, 10]\n"
        "PADDING_TYPE \"zeros\"\n"
        "\n")
    cfg = UpliftUpsampleConfig(config_file=str(path))
    assert cfg.BATCH_SIZE == 128
    assert cfg.MASK_STRIDE == [5, 10]
    assert cfg.PADDING_TYPE == "zeros"


def test_resolve_weight_selector(tmp_path):
    from uplift_upsample_tpu.train import resolve_weight_selector

    (tmp_path / "best_weights_0007.h5").write_bytes(b"x")
    (tmp_path / "best_weights_0012.h5").write_bytes(b"x")
    (tmp_path / "other.h5").write_bytes(b"x")
    # Prefix resolves to the first sorted match
    resolved = resolve_weight_selector(str(tmp_path / "best_weights"))
    assert resolved.endswith("best_weights_0007.h5")
    # Full paths pass through
    full = str(tmp_path / "other.h5")
    assert resolve_weight_selector(full) == full
    assert resolve_weight_selector(None) is None


def test_ema_update_semantics():
    """EMA: ema ← ema − (1−d)(ema − w), d = min(cap, (1+g)/(10+g))."""
    import jax
    import jax.numpy as jnp
    from uplift_upsample_tpu.config import UpliftUpsampleConfig
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer, init_model_params
    from uplift_upsample_tpu.parallel import TrainState, make_optimizer, make_train_step

    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 1,
        "TEMPORAL_TRANSFORMER_BLOCKS": 1, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [5],
        "BATCH_SIZE": 4, "DROP_PATH_RATE": 0.0, "DROP_RATE": 0.0,
        "EMA_ENABLED": True, "EMA_DECAY": 0.999,
        "OPTIMIZER": "Adam", "OPTIMIZER_PARAMS": {"amsgrad": True, "epsilon": 1e-8},
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-3, "decay_steps": 100,
                            "decay_rate": 0.9, "staircase": True},
    })
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    tx, _, _ = make_optimizer(config)
    state = TrainState(params=jax.tree.map(jnp.copy, params), opt_state=tx.init(params),
                       ema_params=jax.tree.map(jnp.copy, params),
                       step=jnp.zeros([], jnp.int32))
    step = make_train_step(model, tx, config)

    rng = np.random.default_rng(0)
    b, n, k = 4, 9, 17
    batch = (rng.normal(size=(b, n, k, 3)).astype(np.float32) * 0.1,
             rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.1,
             np.ones((b, n), np.float32), np.zeros((b, 11), np.float32),
             np.zeros((b,), np.int32), np.zeros((b,), np.int32),
             np.zeros((b,), np.int32), np.ones((b, n), bool))

    old_params = jax.tree.map(jnp.copy, state.params)
    state, _ = step(state, batch)
    # Step 0: d = min(0.999, 1/10) = 0.1 → ema = 0.1*old + 0.9*new
    leaf_new = jax.tree.leaves(state.params)[0]
    leaf_old = jax.tree.leaves(old_params)[0]
    leaf_ema = jax.tree.leaves(state.ema_params)[0]
    expected = 0.1 * leaf_old + 0.9 * leaf_new
    np.testing.assert_allclose(np.asarray(leaf_ema), np.asarray(expected),
                               atol=1e-7)


def test_dedup_rows_exact():
    """Hash dedup must be exact vs np.unique(axis=0): same group structure,
    bytewise-reconstructible, masked-zero rows collapsed, and robust to
    duplicate-heavy and all-identical inputs."""
    import numpy as np
    from uplift_upsample_tpu.utils.dedup import dedup_rows

    rng = np.random.default_rng(0)
    # overlapping-window structure (69/71 duplicates per row)
    stream = rng.normal(size=(96, 34)).astype(np.float32)
    flat = stream[(np.arange(64)[:, None] + np.arange(27)) % 96].reshape(-1, 34)
    uniq, inv = dedup_rows(flat)
    assert (uniq[inv] == flat).all()
    assert len(uniq) == len(np.unique(flat, axis=0))

    # zeroed (masked) rows collapse into one
    flat2 = flat.copy()
    flat2[::3] = 0.0
    u2, i2 = dedup_rows(flat2)
    assert (u2[i2] == flat2).all()
    assert len(u2) == len(np.unique(flat2, axis=0))

    # degenerate: all rows identical
    u3, i3 = dedup_rows(np.ones((50, 16), np.float32))
    assert len(u3) == 1 and (i3 == 0).all()

    # masked rows built as x * 0.0 carry -0.0 wherever x was negative: they
    # must all merge with the true zero row (value semantics), on the FAST
    # path — thousands of distinct sign-bit patterns used to collide in the
    # hash and force the np.unique(axis=0) exact fallback (~1.5 s per 145k-row
    # batch at the s_in=10/20 eval rungs). Assert structurally (spy on the
    # fallback call) rather than by wall clock: suite load made a timing
    # bound flaky.
    from uplift_upsample_tpu.utils import dedup as dedup_mod
    flat4 = stream[(np.arange(2048)[:, None] + np.arange(27)) % 96]
    mask = (np.arange(2048) % 2 == 0).astype(np.float32)
    flat4 = (flat4 * mask[:, None, None]).reshape(-1, 34)
    fallback_calls = []
    real_unique = np.unique

    def spy_unique(*args, **kwargs):
        if kwargs.get("axis") is not None:
            fallback_calls.append(kwargs)
        return real_unique(*args, **kwargs)

    orig_np_unique = dedup_mod.np.unique
    dedup_mod.np.unique = spy_unique
    try:
        u4, i4 = dedup_rows(flat4)
    finally:
        dedup_mod.np.unique = orig_np_unique
    zero_ids = np.unique(i4[(flat4 == 0).all(axis=1)])
    assert len(zero_ids) == 1, "all value-zero rows must share one group"
    assert (u4[i4] == flat4).all()  # -0.0 == 0.0 under float ==
    assert len(u4) == 97  # 96 distinct stream rows + the zero row
    assert not fallback_calls, "exact fallback fired — hash collided on -0.0"
