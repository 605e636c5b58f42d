"""Multi-host feed: per-host rows must reassemble the single-process batch.

Two layers of checking:
  1. In-process: HostShardedBatcher with explicit (index, count) — the
     concatenation over hosts is bit-identical to the unsharded batcher.
  2. A real 2-process `jax.distributed` CPU run (subprocesses): each process
     feeds its local rows into `jax.make_array_from_process_local_data` over
     a global dp mesh and verifies global shape/content and a cross-process
     reduction.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")),
    reason="synthetic npz missing")

def _free_port() -> int:
    """OS-assigned free TCP port for the jax.distributed coordinator.

    Hard-coded ports collide the moment two suite runs (or a concurrent
    dryrun subprocess) overlap — the coordinator then aborts with a
    "different incarnation" error. Binding port 0 and handing the resolved
    port to the workers makes concurrent runs independent."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


GEN_KWARGS = dict(seq_len=9, subsample=2, stride=5, padding_type="copy",
                  flip_augment=True, in_batch_augment=True,
                  mask_stride=[5, 10, 20], stride_mask_align_global=False,
                  rand_shift_stride_mask=True, shuffle=True, seed=3)


def _make_batcher(batch_size=32):
    from uplift_upsample_tpu.data.fast_batcher import FastH36mBatcher
    from uplift_upsample_tpu.data.generator import H36mSequenceGenerator
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    from uplift_upsample_tpu.data.loading import (filter_and_subsample_dataset,
                                                  load_dataset_and_2d_poses)

    dataset, keypoints = load_dataset_and_2d_poses(
        os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"), verbose=False)
    cams, p3d, p2d, _, subj, act, frates = filter_and_subsample_dataset(
        dataset=dataset, poses_2d=keypoints, subjects=["S1", "S5"],
        action_filter="*", downsample=1, image_base_path=None, verbose=False)
    gen = H36mSequenceGenerator(
        p3d, p2d, camera_params=cams, subjects=subj, actions=act,
        frame_rates=frates, split="t",
        flip_lr_indices=H36MOrder17P.flip_lr_indices(), verbose=False,
        **GEN_KWARGS)
    return FastH36mBatcher(gen, batch_size=batch_size)


def test_host_sharded_rows_match_single_process():
    from uplift_upsample_tpu.data.multihost import HostShardedBatcher

    n_batches = 3
    ref_iter = _make_batcher().batches()
    ref = [next(ref_iter) for _ in range(n_batches)]

    shards = []
    for p in range(2):
        it = HostShardedBatcher(_make_batcher(), process_index=p,
                                process_count=2).batches()
        shards.append([next(it) for _ in range(n_batches)])

    for k in range(n_batches):
        for col, ref_col in enumerate(ref[k]):
            got = np.concatenate([np.asarray(shards[p][k][col])
                                  for p in range(2)], axis=0)
            np.testing.assert_array_equal(got, np.asarray(ref_col),
                                          err_msg=f"batch {k} col {col}")
            assert shards[0][k][col].shape[0] == ref_col.shape[0] // 2


_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from test_multihost import _make_batcher
from uplift_upsample_tpu.data.multihost import HostShardedBatcher, globalize_batch

assert jax.process_count() == 2, jax.process_count()
batcher = HostShardedBatcher(_make_batcher())
local = next(iter(batcher.batches()))
devices = np.asarray(jax.devices()).reshape(-1)
mesh = Mesh(devices, ("dp",))
global_batch = globalize_batch(mesh, local)
assert global_batch[0].shape[0] == 32, global_batch[0].shape
# Addressable shards hold exactly this process's rows (in order)
rows = np.concatenate(
    [np.asarray(s.data) for s in
     sorted(global_batch[0].addressable_shards, key=lambda s: s.index[0].start)])
np.testing.assert_array_equal(rows, np.asarray(local[0]))
# Cross-process reduction over the global array
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(
    global_batch[0])

# Device feed across processes: full store replicated over the global mesh,
# plan rows sharded per host, batch materialized on device — the seq3d
# column must reassemble the host-feed batch exactly.
from functools import partial
from uplift_upsample_tpu.data.device_feed import make_device_feed
from uplift_upsample_tpu.data.multihost import host_row_slice
feed = make_device_feed(_make_batcher())
repl = NamedSharding(mesh, P())
store = {{k: jax.make_array_from_process_local_data(repl, np.asarray(v))
          for k, v in feed.store.items()}}
plan = next(iter(feed.plan_batches(rows=host_row_slice(32))))
plan_g = globalize_batch(mesh, plan)
mat = jax.jit(partial(feed.materialize, pad_edge=feed.pad_edge),
              out_shardings=repl)
dev_batch = mat(store, plan_g)
# replicated output is fully addressable; compare against an independent
# full-batch host batcher (identical seeds -> identical windows)
host_full = next(iter(_make_batcher().batches()))
np.testing.assert_array_equal(np.asarray(dev_batch[0]), host_full[0])
np.testing.assert_array_equal(np.asarray(dev_batch[1]), host_full[1])
print("device feed ok", jax.process_index())
np.save(sys.argv[3], np.asarray([float(total)], np.float64))
print("worker ok", jax.process_index())
"""


_TRAIN_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
sys.path.insert(0, {repo!r})
assert jax.process_count() == 2

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.train import train_and_validate

config = UpliftUpsampleConfig()
config.update_from({{
    "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
    "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 1,
    "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
    "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [5, 10, 20],
    "BATCH_SIZE": 16, "DROP_PATH_RATE": [0.0, 0.0, 0.0], "EPOCHS": 1,
    "STEPS_PER_EPOCH": 2, "VALIDATION_INTERVAL": 1,
    "CHECKPOINT_INTERVAL": 5,  # > EPOCHS: Orbax save needs one shared dir
    "VALIDATION_EXAMPLES": 16, "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {{}},
    "WEIGHT_DECAY": 4e-6, "SCHEDULE": "ExponentialDecay",
    "SCHEDULE_PARAMS": {{"initial_learning_rate": 4e-5, "decay_steps": 6000,
                         "decay_rate": 0.99, "staircase": True}},
    "EMA_ENABLED": True, "EMA_DECAY": 0.999, "TRAIN_DEVICE_FEED": True,
    "STRIDE_MASK_RAND_SHIFT": True, "IN_BATCH_AUGMENT": True,
    "DATASET_VAL_3D_SUBSAMPLE_STEP": 10,
}})
synth = os.path.join({repo!r}, "tests", "fixtures", "synth")
hist, best, last = train_and_validate(
    config=config, out_dir=sys.argv[3], dataset_name="h36m",
    h36m_path=os.path.join(synth, "data_3d_h36m.npz"),
    dataset_2d_path=os.path.join(synth, "data_2d_h36m_synth.npz"),
    train_subset="train", val_subset="val", test_subset=None)
mpjpe = hist.latest_value("MPJPE")
assert mpjpe is not None and np.isfinite(mpjpe), mpjpe
assert last is not None and os.path.exists(last)
np.save(sys.argv[4], np.asarray([mpjpe, hist.latest_value("loss")], np.float64))
print("train worker ok", jax.process_index())
"""


@pytest.mark.slow
def test_two_process_train_epoch(tmp_path):
    """A real one-epoch train_and_validate on 2 jax.distributed processes
    (2 virtual CPU devices each → global dp=4 mesh): multihost device feed,
    globally-sharded train steps, allgathered validation metrics, h5 export.
    Both processes must agree on the resulting metrics exactly."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    script = _TRAIN_WORKER.format(repo=REPO)

    procs, outs = [], []
    for p in range(2):
        out = str(tmp_path / f"metrics_{p}.npy")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, f"127.0.0.1:{port}", str(p),
             str(tmp_path / f"out_{p}"), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p, proc in enumerate(procs):
        stdout, _ = proc.communicate(timeout=540)
        assert proc.returncode == 0, f"proc {p}:\n{stdout.decode()[-4000:]}"

    m0, m1 = np.load(outs[0]), np.load(outs[1])
    np.testing.assert_array_equal(m0, m1)
    assert np.all(np.isfinite(m0))


def test_two_process_distributed_feed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    script = _WORKER.format(repo=REPO)

    procs, outs = [], []
    for p in range(2):
        out = str(tmp_path / f"sum_{p}.npy")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, f"127.0.0.1:{port}", str(p), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p, proc in enumerate(procs):
        stdout, _ = proc.communicate(timeout=420)
        assert proc.returncode == 0, f"proc {p}:\n{stdout.decode()[-3000:]}"

    expected = float(np.asarray(next(iter(_make_batcher().batches()))[0],
                                np.float64).sum())
    for out in outs:
        got = float(np.load(out)[0])
        assert np.isclose(got, expected, rtol=1e-5), (got, expected)
