"""Device feed (device-resident store + on-device window materialization)
must be bit-identical to the host fast batcher — same epoch planner, same
RNG streams, materialization moved inside jit (data/device_feed.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.data.device_feed import make_device_feed
from uplift_upsample_tpu.data.fast_batcher import (FastAMASSBatcher,
                                                   FastH36mBatcher)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")


def _config(**over):
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "MASK_STRIDE": [5, 10, 20],
        "BATCH_SIZE": 16, "STRIDE_MASK_RAND_SHIFT": True,
        "IN_BATCH_AUGMENT": True, **over,
    })
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    config.AUGM_FLIP_KEYPOINT_ORDER = H36MOrder17P.flip_lr_indices()
    return config


def _assert_batches_equal(host_iter, feed, n_batches):
    plan_iter = feed.plan_batches()
    mat = jax.jit(feed.materialize, static_argnums=2)
    for i in range(n_batches):
        host = next(host_iter)
        plan = tuple(jnp.asarray(a) for a in next(plan_iter))
        dev = mat(feed.store, plan, feed.pad_edge)
        assert len(host) == len(dev)
        for j, (h, d) in enumerate(zip(host, dev)):
            np.testing.assert_array_equal(
                np.asarray(h, dtype=np.asarray(d).dtype), np.asarray(d),
                err_msg=f"batch {i} field {j}")


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")),
                    reason="synthetic npz missing")
@pytest.mark.parametrize("pad_edge", [True, False])
def test_device_feed_h36m_bit_identical(pad_edge):
    from uplift_upsample_tpu.train import create_h36m_generators

    config = _config()

    def fresh_gen():
        # independent generator per side: each batcher consumes the RNG
        # streams of its own generator
        gen, _, _ = create_h36m_generators(
            os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            config, "train", None, shuffle_seed=7)
        gen.windower.pad_edge = pad_edge
        return gen

    host = FastH36mBatcher(fresh_gen(), batch_size=config.BATCH_SIZE)
    feed = make_device_feed(FastH36mBatcher(fresh_gen(),
                                            batch_size=config.BATCH_SIZE))
    assert feed.pad_edge == pad_edge
    # 3 epochs worth of batches so epoch-boundary carry + RNG resets align
    n = (3 * len(host)) // config.BATCH_SIZE + 1
    _assert_batches_equal(host.batches(), feed, min(n, 12))


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "amass")),
                    reason="synthetic amass missing")
def test_device_feed_amass_bit_identical():
    from uplift_upsample_tpu.train import create_amass_generators

    config = _config()

    def fresh_gen():
        gen, _, _ = create_amass_generators(
            os.path.join(SYNTH_DIR, "amass"),
            os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            config, "train_debug", None, target_frame_rate=50, shuffle_seed=7)
        return gen

    host = FastAMASSBatcher(fresh_gen(), batch_size=config.BATCH_SIZE)
    feed = make_device_feed(FastAMASSBatcher(fresh_gen(),
                                             batch_size=config.BATCH_SIZE))
    _assert_batches_equal(host.batches(), feed, 8)


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")),
                    reason="synthetic npz missing")
def test_train_loop_device_feed_smoke(tmp_path):
    """train_and_validate with TRAIN_DEVICE_FEED forced on (the TPU default
    path; auto resolves False on CPU) runs end to end."""
    from uplift_upsample_tpu.train import train_and_validate

    config = _config(**{
        "SPATIAL_EMBED_DIM": 16, "TEMPORAL_EMBED_DIM": 32,
        "SPATIAL_TRANSFORMER_BLOCKS": 1, "TEMPORAL_TRANSFORMER_BLOCKS": 2,
        "STRIDES": [3, 3], "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4,
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.1, 0.1, 0.0],
        "EPOCHS": 1, "STEPS_PER_EPOCH": 4, "VALIDATION_INTERVAL": 1,
        "CHECKPOINT_INTERVAL": 5, "VALIDATION_EXAMPLES": 24,
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 4e-5, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
        "EMA_ENABLED": True, "EMA_DECAY": 0.999,
        "DATASET_VAL_3D_SUBSAMPLE_STEP": 10,
        "TRAIN_DEVICE_FEED": True,
    })
    hist, best_path, last_path = train_and_validate(
        config=config, out_dir=str(tmp_path / "run"), dataset_name="h36m",
        h36m_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        dataset_2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
        train_subset="train", val_subset="val", test_subset=None)
    assert hist.latest_value("MPJPE") is not None
    assert np.isfinite(hist.latest_value("MPJPE"))
    assert last_path is not None and os.path.exists(last_path)


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")),
                    reason="synthetic npz missing")
def test_train_step_device_feed_matches_host():
    """One optimizer step driven by the device feed == one step driven by the
    host feed (same plan → identical batch values → identical loss/params)."""
    from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                            init_model_params)
    from uplift_upsample_tpu.parallel import TrainState, make_optimizer
    from uplift_upsample_tpu.parallel.train_step import make_train_step
    from uplift_upsample_tpu.train import create_h36m_generators

    config = _config(**{
        "SPATIAL_EMBED_DIM": 16, "TEMPORAL_EMBED_DIM": 32,
        "SPATIAL_TRANSFORMER_BLOCKS": 1, "TEMPORAL_TRANSFORMER_BLOCKS": 2,
        "STRIDES": [3, 3], "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4,
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.0, 0.0, 0.0],
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 4e-5, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
        "EMA_ENABLED": False,
    })
    def fresh_gen():
        gen, _, _ = create_h36m_generators(
            os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
            os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
            config, "train", None, shuffle_seed=3)
        return gen
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    tx, _, _ = make_optimizer(config)

    def fresh_state():
        # independent buffers per state: the steps donate their state arg,
        # which deletes the donated buffers after the call
        p = jax.tree.map(jnp.array, params)
        return TrainState(params=p, opt_state=tx.init(p),
                          ema_params=None, step=jnp.zeros([], jnp.int32))

    host = FastH36mBatcher(fresh_gen(), batch_size=config.BATCH_SIZE)
    feed = make_device_feed(FastH36mBatcher(fresh_gen(),
                                            batch_size=config.BATCH_SIZE))

    step_host = make_train_step(model, tx, config, dataset_name="h36m")
    step_dev = make_train_step(model, tx, config, dataset_name="h36m",
                               device_feed=feed)
    hb = next(host.batches())
    pb = next(feed.plan_batches())
    _, loss_h = step_host(fresh_state(), tuple(jnp.asarray(a) for a in hb))
    _, loss_d = step_dev(fresh_state(), tuple(jnp.asarray(a) for a in pb))
    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-6)

    # Validation step through the feed == through host batches
    from uplift_upsample_tpu.parallel.train_step import make_val_step
    val_host = make_val_step(model, config, dataset_name="h36m")
    val_dev = make_val_step(model, config, dataset_name="h36m",
                            device_feed=feed)
    ph, gh, lh = val_host(params, tuple(jnp.asarray(a) for a in hb))
    pd, gd, ld = val_dev(params, tuple(jnp.asarray(a) for a in pb))
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(gh))
    np.testing.assert_allclose(np.asarray(pd), np.asarray(ph), atol=1e-6)
    np.testing.assert_allclose(float(ld), float(lh), rtol=1e-6)
    sub, act = feed.host_ids(pb)
    np.testing.assert_array_equal(sub, np.asarray(hb[-4]))
    np.testing.assert_array_equal(act, np.asarray(hb[-3]))
