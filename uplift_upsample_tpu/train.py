"""Training harness + CLI (parity with reference `train.py`).

Flow: config → datasets (H36M or AMASS) → model + optimizer + optional EMA →
epoch loop of jitted data-parallel train steps → periodic validation with
flip-TTA and (action-wise) metrics → Orbax checkpoints for full training state
+ Keras-compatible `.h5` export of best/last weights → final test-set eval
sweep over mask strides.

CLI:
    python -m uplift_upsample_tpu.train --config cfg.json --out_dir out/ \
        [--dataset h36m|amass] [--weights init.h5] [--continue_training true]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from .config import UpliftUpsampleConfig
from .data import h36m_splits
from .data.generator import AMASSSequenceGenerator, H36mSequenceGenerator
from .data.keypoint_order import H36MOrder17P
from .data.loading import filter_and_subsample_dataset, load_dataset_and_2d_poses
from .data.mocap import AMASSDataset
from .data.fast_batcher import FastAMASSBatcher, FastH36mBatcher
from .data.pipeline import _threaded
from .models import build_uplift_upsample_transformer, init_model_params
from .parallel import (TrainState, make_mesh, make_optimizer, make_train_step,
                       make_val_step, shard_batch)
from .utils import eval_protocol
from .utils.metric_history import MetricHistory
from .utils.scalar_log import ScalarLogger
from .utils.time_format import format_time
from .utils.weights_h5 import load_keras_h5_by_name, save_keras_h5


def log(*args):
    print(*args)
    sys.stdout.flush()


def resolve_weight_selector(weight_path, target_extension=".h5"):
    """Resolve a weight-file prefix (e.g. '<dir>/best_weights') to a file."""
    if weight_path is None:
        return None
    if os.path.splitext(weight_path)[1]:
        return weight_path
    weight_dir, selector = os.path.split(weight_path)
    candidates = sorted(s for s in os.listdir(weight_dir)
                        if s.startswith(selector) and s.endswith(target_extension))
    if not candidates:
        raise FileNotFoundError(f"No weights matching {weight_path}*{target_extension}")
    return os.path.join(weight_dir, candidates[0])


def create_h36m_generators(h36_path, dataset_2d_path, config, train_subset, val_subset,
                           shuffle_seed=0):
    """Build (train_generator, val_generator, val_batches)."""
    dataset_3d, poses_2d_all = load_dataset_and_2d_poses(
        dataset_path=h36_path, poses_2d_path=dataset_2d_path, verbose=True)
    train_gen, val_gen, val_batches = None, None, None
    for split, selection in zip(["train", "val"], [train_subset, val_subset]):
        if selection is None:
            continue
        subsample = (config.DATASET_TRAIN_3D_SUBSAMPLE_STEP if split == "train"
                     else config.DATASET_VAL_3D_SUBSAMPLE_STEP)
        shuffle = split == "train"
        subjects = h36m_splits.subjects_by_split[selection]
        cams, p3d, p2d, _, subj, act, frates = filter_and_subsample_dataset(
            dataset=dataset_3d, poses_2d=poses_2d_all, subjects=subjects,
            action_filter="*", downsample=1, image_base_path=h36_path, verbose=True)
        do_flip = split == "train" and config.AUGM_FLIP_PROB > 0
        gen = H36mSequenceGenerator(
            p3d, p2d, camera_params=cams, subjects=subj, actions=act,
            frame_rates=frates, split=split, seq_len=config.SEQUENCE_LENGTH,
            target_frame_rate=50, subsample=subsample, stride=config.SEQUENCE_STRIDE,
            padding_type=config.PADDING_TYPE, flip_augment=do_flip,
            in_batch_augment=config.IN_BATCH_AUGMENT,
            flip_lr_indices=config.AUGM_FLIP_KEYPOINT_ORDER,
            mask_stride=config.MASK_STRIDE, stride_mask_align_global=False,
            rand_shift_stride_mask=config.STRIDE_MASK_RAND_SHIFT and split == "train",
            shuffle=shuffle, seed=shuffle_seed)
        log(f"Sequences: {len(gen)}")
        if split == "train":
            train_gen = gen
        else:
            if config.VALIDATION_EXAMPLES < 0:
                config.VALIDATION_EXAMPLES = len(gen)
            assert config.VALIDATION_EXAMPLES <= len(gen)
            val_batches = int(np.ceil(config.VALIDATION_EXAMPLES / config.BATCH_SIZE))
            val_gen = gen
    return train_gen, val_gen, val_batches


def create_amass_generators(amass_path, h36_path, config, train_subset, val_subset,
                            target_frame_rate, shuffle_seed=0):
    h36m_cameras = None
    train_gen, val_gen, val_batches = None, None, None
    for split, selection in zip(["train", "val"], [train_subset, val_subset]):
        if selection is None:
            continue
        log(f"Loading AMASS dataset for split {selection}")
        amass = AMASSDataset(path=amass_path, h36m_path=h36_path, split=selection,
                             h36m_cameras=h36m_cameras)
        h36m_cameras = amass.cameras()
        subsample = (config.DATASET_TRAIN_3D_SUBSAMPLE_STEP if split == "train"
                     else config.DATASET_VAL_3D_SUBSAMPLE_STEP)
        do_flip = split == "train" and config.AUGM_FLIP_PROB > 0
        gen = AMASSSequenceGenerator(
            amass_dataset=amass, seq_len=config.SEQUENCE_LENGTH,
            target_frame_rate=target_frame_rate, subsample=subsample,
            stride=config.SEQUENCE_STRIDE, padding_type=config.PADDING_TYPE,
            flip_augment=do_flip, in_batch_augment=config.IN_BATCH_AUGMENT,
            flip_lr_indices=H36MOrder17P.flip_lr_indices(),
            mask_stride=config.MASK_STRIDE, stride_mask_align_global=False,
            rand_shift_stride_mask=config.STRIDE_MASK_RAND_SHIFT and split == "train",
            shuffle=split == "train", seed=shuffle_seed)
        log(f"Sequences: {len(gen)}")
        if split == "train":
            train_gen = gen
        else:
            if config.VALIDATION_EXAMPLES < 0:
                config.VALIDATION_EXAMPLES = len(gen)
            assert config.VALIDATION_EXAMPLES <= len(gen)
            val_batches = int(np.ceil(config.VALIDATION_EXAMPLES / config.BATCH_SIZE))
            val_gen = gen
    return train_gen, val_gen, val_batches


def _checkpoint_manager(checkpoint_dir):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(checkpoint_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))


def train_and_validate(config: UpliftUpsampleConfig, out_dir, dataset_name="h36m",
                       val_dataset_name=None, h36m_path=None, amass_path=None,
                       dataset_2d_path=None, train_subset="train", val_subset="val",
                       test_subset=None, weights=None, continue_training=False,
                       amass_frame_rate=50, use_tensorboard=False):
    """Full training run; returns (MetricHistory, best_weights_path, last_weights_path)."""
    import orbax.checkpoint as ocp

    val_dataset_name = val_dataset_name or dataset_name
    os.makedirs(out_dir, exist_ok=True)
    checkpoint_dir = os.path.join(out_dir, "checkpoints")
    # Create eagerly (reference path_utils.mkdirs, train.py:426): the Orbax
    # manager only creates it on process 0 in a multi-process run, but the
    # best/last .h5 exports write here from every process's filesystem view.
    os.makedirs(checkpoint_dir, exist_ok=True)

    # ---- datasets ---------------------------------------------------------
    val_subset_name = None if val_dataset_name != dataset_name else val_subset
    if dataset_name == "h36m":
        train_gen, val_gen, val_batches = create_h36m_generators(
            h36m_path, dataset_2d_path, config, train_subset, val_subset_name,
            shuffle_seed=config.SHUFFLE_SEED)
    else:
        train_gen, val_gen, val_batches = create_amass_generators(
            amass_path, h36m_path, config, train_subset, val_subset_name,
            target_frame_rate=amass_frame_rate, shuffle_seed=config.SHUFFLE_SEED)
    if val_dataset_name != dataset_name:
        if val_dataset_name == "h36m":
            _, val_gen, val_batches = create_h36m_generators(
                h36m_path, dataset_2d_path, config, None, val_subset,
                shuffle_seed=config.SHUFFLE_SEED)
        else:
            _, val_gen, val_batches = create_amass_generators(
                amass_path, h36m_path, config, None, val_subset,
                target_frame_rate=amass_frame_rate, shuffle_seed=config.SHUFFLE_SEED)
    log(f"val batches: {val_batches}")

    # ---- model / optimizer / state ---------------------------------------
    mesh = None
    n_devices = len(jax.devices())
    dp = getattr(config, "DATA_PARALLEL_DEVICES", -1)
    dp = n_devices if dp in (-1, None) else dp
    if dp > 1:
        assert config.BATCH_SIZE % dp == 0, "batch must divide over dp devices"
        mesh = make_mesh(num_devices=dp)
        log(f"Data-parallel mesh over {dp} devices")

    model = build_uplift_upsample_transformer(config=config)
    variables = init_model_params(model, seed=config.SHUFFLE_SEED)
    params = variables["params"]
    if weights is not None:
        log(f"Loading weights from {weights}")
        # Name-based partial loading (reference weight_io.py:76-263): layers
        # absent from the file keep their initialization; extra file layers
        # are ignored; both are reported. This is how AMASS-pretrained
        # checkpoints warm-start variant configs.
        loaded, report = load_keras_h5_by_name(weights, model,
                                               template=variables)
        report.log(print_fn=log)
        params = jax.tree.map(jnp.asarray, loaded["params"])

    tx, lr_schedule, wd_schedule = make_optimizer(config)
    ema_params = jax.tree.map(jnp.copy, params) if config.EMA_ENABLED else None
    state = TrainState(params=params, opt_state=tx.init(params),
                       ema_params=ema_params, step=jnp.zeros([], jnp.int32))

    mngr = _checkpoint_manager(checkpoint_dir)
    initial_epoch = 1
    if continue_training:
        latest = mngr.latest_step()
        assert latest is not None, "Cant find checkpoint to continue training"
        log(f"Restoring checkpoint from epoch {latest}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
        try:
            state = mngr.restore(latest,
                                 args=ocp.args.StandardRestore(abstract))
        except (ValueError, KeyError) as e:
            # Checkpoint-format break (round 3): TrainState gained loss_sum
            # and the optimizer state switched to ScaleByKerasAdamState (the
            # Keras-exact Adam transforms) — checkpoints written before that
            # change have a different pytree structure and cannot be resumed.
            raise RuntimeError(
                f"Checkpoint at epoch {latest} does not match the current "
                f"TrainState structure. Checkpoints written before the "
                f"round-3 format change (TrainState.loss_sum + "
                f"ScaleByKerasAdamState optimizer state) are not resumable; "
                f"restart training or export weights via the .h5 path and "
                f"use --weights. Original error: {e}") from e
        initial_epoch = latest + 1
        log(f"Will continue training from epoch {initial_epoch}")

    if mesh is not None:
        from .parallel.mesh import replicated_sharding
        state = jax.device_put(state, replicated_sharding(mesh))


    # ---- bookkeeping ------------------------------------------------------
    logger = ScalarLogger(out_dir, use_tensorboard=use_tensorboard)
    metric_hist = MetricHistory()
    metrics = ["loss", "MPJPE", "NMPJPE", "PAMPJPE"]
    if val_dataset_name == "h36m":
        metrics += ["AW-MPJPE", "AW-NMPJPE", "AW-PAMPJPE"]
    for m in metrics:
        metric_hist.add_metric(m, higher_is_better=False)
    if config.BEST_CHECKPOINT_METRIC is not None and val_dataset_name != "h36m":
        config.BEST_CHECKPOINT_METRIC = config.BEST_CHECKPOINT_METRIC.replace("AW-", "")
    if config.BEST_CHECKPOINT_METRIC is not None:
        assert config.BEST_CHECKPOINT_METRIC in metrics

    prev_best_weights_path, last_weights_path = None, None
    # Resume completeness: the Orbax checkpoint holds only the numeric state;
    # MetricHistory and the best/last .h5 paths live in a sidecar so a resumed
    # run keeps best-checkpoint tracking instead of restarting it empty (the
    # reference loses this history on --continue_training, train.py:430-438 —
    # a stale best_weights_*.h5 could then survive or be overwritten).
    history_sidecar = os.path.join(out_dir, "train_history.json")
    if continue_training and os.path.exists(history_sidecar):
        with open(history_sidecar) as f:
            sidecar = json.load(f)
        metric_hist.restore(sidecar["metric_history"])
        prev_best_weights_path = sidecar.get("prev_best_weights_path")
        if prev_best_weights_path and not os.path.exists(prev_best_weights_path):
            prev_best_weights_path = None
        last_weights_path = sidecar.get("last_weights_path")
        if last_weights_path and not os.path.exists(last_weights_path):
            last_weights_path = None
        log(f"Restored metric history through epoch "
            f"{sidecar.get('epoch')} (best: {prev_best_weights_path})")

    root = config.ROOT_KEYTPOINT

    def make_fast_batcher(gen, name):
        if isinstance(gen, H36mSequenceGenerator):
            return FastH36mBatcher(gen, batch_size=config.BATCH_SIZE)
        return FastAMASSBatcher(gen, batch_size=config.BATCH_SIZE)

    # Multi-host: every process builds the identical deterministic batcher
    # and materializes only its row range of each global batch; the train
    # step then runs on globally-sharded arrays (data/multihost.py).
    multihost = jax.process_count() > 1
    train_batcher = make_fast_batcher(train_gen, dataset_name)
    if multihost:
        from .data.multihost import HostShardedBatcher, globalize_batch
        assert mesh is not None, "multi-host training requires a dp mesh"
        train_batcher = HostShardedBatcher(train_batcher)
        log(f"Multi-host feed: process {jax.process_index()}/"
            f"{jax.process_count()}, local batch {train_batcher.batch_size}")

    # Device feed: pose stores resident on device, per-step host→device
    # traffic = the window plan only (~0.2 MB vs ~45 MB materialized windows;
    # bit-identical batches — data/device_feed.py). "auto" enables it on
    # accelerator runs. Multi-host: every process uploads the full store
    # (replicated over the global mesh) and plans only its host's batch rows,
    # exactly like the host feed's row sharding.
    tdf = getattr(config, "TRAIN_DEVICE_FEED", "auto")
    if tdf == "auto":
        from .utils.backend import is_tpu_backend
        tdf = is_tpu_backend()
    device_feed = None
    if tdf:
        from .data.device_feed import make_device_feed
        plan_rows = None
        if multihost:
            device_feed = make_device_feed(train_batcher.batcher)
            plan_rows = train_batcher.rows
        else:
            device_feed = make_device_feed(train_batcher)
        if mesh is not None:
            from .parallel.mesh import replicated_sharding as _repl
            repl = _repl(mesh)
            if multihost:
                # Every process holds the identical full store; lift it to a
                # replicated global array (local data == global data).
                device_feed.store = {
                    k: jax.make_array_from_process_local_data(repl, np.asarray(v))
                    for k, v in device_feed.store.items()}
            else:
                device_feed.store = jax.device_put(device_feed.store, repl)
        log("Device feed: pose store resident on device "
            f"({sum(int(np.prod(v.shape)) * 4 for v in device_feed.store.values()) / 1e6:.0f} MB), "
            "per-step transfer = window plans only")

    train_step = make_train_step(model, tx, config, dataset_name=dataset_name,
                                 mesh=mesh, rng_seed=config.SHUFFLE_SEED,
                                 device_feed=device_feed)

    # Native-accelerated host feed, produced ahead by a background thread
    train_iter = _threaded(device_feed.plan_batches(rows=plan_rows)
                           if device_feed is not None
                           else train_batcher.batches(), depth=4)
    val_batcher = None if val_gen is None else make_fast_batcher(val_gen, val_dataset_name)
    val_feed, val_rows = None, None
    if val_batcher is not None and device_feed is not None:
        from .data.device_feed import make_device_feed as _mdf
        val_feed = _mdf(val_batcher)
        if multihost:
            from .data.multihost import host_row_slice
            val_rows = host_row_slice(val_batcher.batch_size)
            val_feed.store = {
                k: jax.make_array_from_process_local_data(
                    _repl(mesh), np.asarray(v))
                for k, v in val_feed.store.items()}
        elif mesh is not None:
            val_feed.store = jax.device_put(val_feed.store, _repl(mesh))
    elif multihost and val_batcher is not None:
        val_batcher = HostShardedBatcher(val_batcher)
    val_step = make_val_step(model, config, dataset_name=val_dataset_name,
                             mesh=mesh, device_feed=val_feed)

    def to_device(batch):
        if multihost:
            return globalize_batch(mesh, batch)
        if mesh is not None:
            return shard_batch(batch, mesh)
        return batch

    for epoch in range(initial_epoch, config.EPOCHS + 1):
        epoch_start = time.time()
        log(f"## EPOCH {epoch} / {config.EPOCHS}")
        # Reset the device-side loss accumulator (same-sharding multiply keeps
        # the jitted step's input layout stable); the epoch's train/loss is
        # then the exact all-steps mean (reference train.py:505), fetched once.
        state = state.replace(loss_sum=state.loss_sum * 0)
        # Fetching the loss syncs the device pipeline — costly through
        # relay-tunneled PJRT — so log sparsely (reference logs every 10;
        # TRAIN_LOG_EVERY overrides, e.g. one sync per epoch for headless
        # convergence sweeps where each sync costs seconds)
        log_every = int(getattr(config, "TRAIN_LOG_EVERY", 0) or
                        max(10, config.STEPS_PER_EPOCH // 60))
        for iteration in range(config.STEPS_PER_EPOCH):
            batch = to_device(next(train_iter))
            state, loss = train_step(state, batch)
            if iteration % log_every == 0:
                loss_val = float(loss)
                elapsed = time.time() - epoch_start
                eta = ((config.STEPS_PER_EPOCH - iteration - 1) / (iteration + 1)) * elapsed
                log(f"{iteration}/{config.STEPS_PER_EPOCH} @ Epoch {epoch} "
                    f"(ETA {format_time(eta)}): loss {loss_val:.6f}")

        if epoch % config.CHECKPOINT_INTERVAL == 0:
            mngr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)))
            mngr.wait_until_finished()
            log(f"Saved checkpoint for epoch {epoch}")

        epoch_duration = time.time() - epoch_start
        if config.STEPS_PER_EPOCH > 0:
            step_s = epoch_duration / config.STEPS_PER_EPOCH
            log(f"Finished epoch {epoch} in {format_time(epoch_duration)}, {step_s:.3f}s/step")
            mean_loss = float(state.loss_sum) / config.STEPS_PER_EPOCH
            log(f"Epoch {epoch} mean train loss: {mean_loss:.6f}")
            logger.scalar("train/loss", mean_loss, epoch)
            logger.scalar("train/LR", float(lr_schedule(int(state.step))), epoch)
            if wd_schedule is not None:
                logger.scalar("train/WD", float(wd_schedule(int(state.step))), epoch)
            logger.scalar("train/step_duration", step_s, epoch)

        # ---- validation ---------------------------------------------------
        if val_gen is not None and epoch % config.VALIDATION_INTERVAL == 0:
            log(f"Running validation on {config.VALIDATION_EXAMPLES} examples")
            val_start = time.time()
            val_params = state.ema_params if config.EMA_ENABLED else state.params
            gt_list, pred_list, subj_list, act_list = [], [], [], []
            loss_vals = []
            examples = 0
            import itertools
            n_val_batches = int(np.ceil(config.VALIDATION_EXAMPLES / config.BATCH_SIZE))
            val_src = (val_feed.plan_batches(rows=val_rows)
                       if val_feed is not None else val_batcher.batches())
            for batch in itertools.islice(val_src, n_val_batches):
                if val_feed is not None:
                    subjects, actions = val_feed.host_ids(batch)
                else:
                    subjects, actions = batch[-4], batch[-3]
                pred_central, central_gt, loss = val_step(val_params, to_device(batch))
                if multihost:
                    # Metrics are computed on host over the full batch: gather
                    # the sharded outputs (and each host's id rows) everywhere.
                    from jax.experimental import multihost_utils
                    pred_central = multihost_utils.process_allgather(pred_central, tiled=True)
                    central_gt = multihost_utils.process_allgather(central_gt, tiled=True)
                    subjects = multihost_utils.process_allgather(subjects, tiled=True)
                    actions = multihost_utils.process_allgather(actions, tiled=True)
                # Keep device arrays; fetch once after the loop (per-batch
                # device_get syncs the pipeline on relay-tunneled PJRT)
                include = min(config.BATCH_SIZE, config.VALIDATION_EXAMPLES - examples)
                loss_vals.append(loss)
                gt_list.append((central_gt, include))
                pred_list.append((pred_central, include))
                subj_list.extend(subjects[:include])
                act_list.extend(actions[:include])
                examples += include

            gt = np.concatenate([np.asarray(jax.device_get(a))[:inc]
                                 for a, inc in gt_list]).astype(np.float64)
            gt = np.concatenate([gt, np.ones(gt.shape[:-1] + (1,))], axis=-1)
            pred = np.concatenate([np.asarray(jax.device_get(a))[:inc]
                                   for a, inc in pred_list]).astype(np.float64)
            actions_arr = np.stack(act_list)
            val_loss = float(np.mean([float(l) for l in loss_vals]))

            if val_dataset_name == "h36m":
                frame_results, aw_results, _ = eval_protocol.h36_action_wise_eval(
                    pred_3d=pred, gt_3d=gt, actions=actions_arr, root_index=root)
            else:
                frame_results = eval_protocol.frame_wise_eval(
                    pred_3d=pred, gt_3d=gt, root_index=root)
                aw_results = None

            log(f"Finished validation in {format_time(time.time() - val_start)}, "
                f"loss: {val_loss:.6f}, MPJPE: {frame_results['mpjpe']:.2f}, "
                f"NMPJPE: {frame_results['nmpjpe']:.2f}, "
                f"PAMPJPE: {frame_results['pampjpe']:.2f}")
            logger.scalar("val/loss", val_loss, epoch)
            metric_hist.add_data("loss", value=val_loss, step=epoch)
            for tag, key in (("MPJPE", "mpjpe"), ("NMPJPE", "nmpjpe"), ("PAMPJPE", "pampjpe")):
                logger.scalar(f"val/{tag}", frame_results[key], epoch)
                metric_hist.add_data(tag, value=frame_results[key], step=epoch)
            if aw_results is not None:
                log(f"AW-MPJPE: {aw_results['mpjpe']:.2f}, "
                    f"AW-NMPJPE: {aw_results['nmpjpe']:.2f}, "
                    f"AW-PAMPJPE: {aw_results['pampjpe']:.2f}")
                for tag, key in (("AW-MPJPE", "mpjpe"), ("AW-NMPJPE", "nmpjpe"),
                                 ("AW-PAMPJPE", "pampjpe")):
                    logger.scalar(f"val/{tag}", aw_results[key], epoch)
                    metric_hist.add_data(tag, value=aw_results[key], step=epoch)

            if config.BEST_CHECKPOINT_METRIC is not None:
                best_value, best_epoch = metric_hist.best_value(config.BEST_CHECKPOINT_METRIC)
                if best_epoch == epoch:
                    log(f"Saving currently best checkpoint @ epoch {best_epoch} "
                        f"({config.BEST_CHECKPOINT_METRIC}: {best_value}) as .h5")
                    weights_path = os.path.join(checkpoint_dir,
                                                f"best_weights_{best_epoch:04d}.h5")
                    save_keras_h5(weights_path, {"params": jax.device_get(val_params)}, model)
                    if prev_best_weights_path is not None:
                        os.remove(prev_best_weights_path)
                    prev_best_weights_path = weights_path

        # last weights each epoch
        if last_weights_path is not None:
            os.remove(last_weights_path)
        last_weights_path = os.path.join(checkpoint_dir, f"last_weights_{epoch:04d}.h5")
        os.makedirs(checkpoint_dir, exist_ok=True)
        val_params = state.ema_params if config.EMA_ENABLED else state.params
        save_keras_h5(last_weights_path, {"params": jax.device_get(val_params)}, model)

        with open(history_sidecar, "w") as f:
            json.dump({"epoch": epoch,
                       "metric_history": metric_hist.to_dict(),
                       "prev_best_weights_path": prev_best_weights_path,
                       "last_weights_path": last_weights_path}, f)

    logger.close()
    if val_gen is not None:
        log("Best checkpoint results:")
        if config.BEST_CHECKPOINT_METRIC is not None:
            metric_hist.print_all_for_best_metric(metric=config.BEST_CHECKPOINT_METRIC)
        else:
            metric_hist.print_best()

    # ---- final test eval --------------------------------------------------
    if test_subset is not None and val_dataset_name == "h36m":
        from .eval import run_eval_multi_mask_stride
        eval_weights = prev_best_weights_path or last_weights_path
        log(f"Eval {'best' if prev_best_weights_path else 'last'} weights: {eval_weights}")
        run_eval_multi_mask_stride(
            config=config, dataset_name=val_dataset_name, dataset_path=h36m_path,
            dataset2d_path=dataset_2d_path, test_subset=test_subset,
            weights_path=eval_weights, action_wise=True)

    return metric_hist, prev_best_weights_path, last_weights_path


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="2D-to-3D uplifting training (TPU-native).")
    parser.add_argument("--config", required=False, default=None)
    parser.add_argument("--dataset", required=False, default="h36m")
    parser.add_argument("--dataset_val", required=False, default=None)
    parser.add_argument("--h36m_path", required=False, default="./data/data_3d_h36m.npz")
    parser.add_argument("--amass_path", required=False, default=None)
    parser.add_argument("--amass_frame_rate", required=False, default="50")
    parser.add_argument("--dataset_2d_path", required=False,
                        default="./data/data_2d_h36m_cpn_ft_h36m_dbb.npz")
    parser.add_argument("--train_subset", required=False, default="train")
    parser.add_argument("--val_subset", required=False, default="val")
    parser.add_argument("--test_subset", required=False, default=None)
    parser.add_argument("--weights", required=False, default=None)
    parser.add_argument("--continue_training", required=False, default=False)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--tensorboard", action="store_true")
    args = parser.parse_args(argv)

    args.continue_training = args.continue_training not in [False, "False", "false", "f", "n", "0"]
    args.val_subset = None if args.val_subset in ["none", "None", "", 0] else args.val_subset
    args.test_subset = None if args.test_subset in ["none", "None", "", 0] else args.test_subset
    args.dataset = args.dataset.lower()
    args.dataset_val = args.dataset_val.lower() if args.dataset_val else None
    assert args.dataset in ["h36m", "amass"]

    args.weights = resolve_weight_selector(args.weights)

    from .configs import resolve_config
    config = resolve_config(args.config)
    assert config.ARCH == "UpliftUpsampleTransformer"
    config.AUGM_FLIP_KEYPOINT_ORDER = H36MOrder17P.flip_lr_indices()

    os.makedirs(args.out_dir, exist_ok=True)
    if args.config:
        stem = os.path.splitext(os.path.split(args.config)[1])[0]
        config.dump(os.path.join(args.out_dir, stem + "_complete.json"))
    else:
        config.dump(os.path.join(args.out_dir, "config_complete.json"))
    config.display()

    train_and_validate(
        config=config, out_dir=args.out_dir, dataset_name=args.dataset,
        val_dataset_name=args.dataset_val, h36m_path=args.h36m_path,
        amass_path=args.amass_path, dataset_2d_path=args.dataset_2d_path,
        train_subset=args.train_subset, val_subset=args.val_subset,
        test_subset=args.test_subset, weights=args.weights,
        continue_training=args.continue_training,
        amass_frame_rate=int(args.amass_frame_rate),
        use_tensorboard=args.tensorboard)
    log("Done.")


if __name__ == "__main__":
    main()
