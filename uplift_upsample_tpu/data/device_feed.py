"""Device-resident dataset + on-device batch materialization (train feed).

The host batchers (fast_batcher.py) materialize ~45 MB window batches and
ship them device-ward every step. On real hardware that costs PCIe/ICI
bandwidth; through this environment's relay-tunneled PJRT it costs ~0.5 s a
step AND leaks the full transfer in host RSS (the relay client retains every
host→device buffer — measured 7.2 MB retained per 7.4 MB transfer, never
freed by GC; see PERF_NOTES "Host memory over long runs"). Both costs are
O(batch bytes) — but the windows are GATHERS of a fixed pose store the
device can hold whole (full H36M ≈ 1 GB f32 in 16 GB HBM).

So: upload the concatenated pose store(s) ONCE; per step, ship only the
per-row window plan the epoch planner already computes (~0.2 MB: gather
indices, validity/stride-mask bits, flip flags, camera ids) and materialize
the batch inside the jitted train step with jnp.take. All RNG stays on host
(same planner code path as the host batcher — fast_batcher._epoch_plan), so
batches are bit-identical to the host feed (tests/test_device_feed.py).

This is the device-side input pipeline SURVEY.md §7 calls for; the reference
has no equivalent (it feeds materialized windows through tf.data,
reference train.py:102-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fast_batcher import (FastAMASSBatcher, FastH36mBatcher,
                           _batches_with_carry)


def _flip_poses(seq, flip_perm, do_flip):
    """Per-row flip: joint permutation + x negation where do_flip (B,)."""
    f = jnp.take(seq, flip_perm, axis=2)
    f = jnp.concatenate([-f[..., :1], f[..., 1:]], axis=-1)
    return jnp.where(do_flip[:, None, None, None], f, seq)


def materialize_h36m(store, plan, pad_edge: bool):
    """(plan params on device) → the FastH36mBatcher batch tuple.

    Matches native/gather_windows.cc semantics: gather → flip → zero-fill
    (zero rows stay exactly +0.0 regardless of flip).
    """
    idx, valid, s_i, do_flip, centers, stride_mask = plan
    seq3d = jnp.take(store["store3d"], idx, axis=0)     # (B, N, K, 3)
    seq2d = jnp.take(store["store2d"], idx, axis=0)     # (B, N, K, 2)
    cams = jnp.take(store["cams"], s_i, axis=0)         # (B, 11)
    fp = store.get("flip_perm")
    if fp is not None:
        seq3d = _flip_poses(seq3d, fp, do_flip)
        seq2d = _flip_poses(seq2d, fp, do_flip)
        sign = jnp.where(do_flip, -1.0, 1.0)
        cams = cams.at[:, 4].mul(sign).at[:, 9].mul(sign)  # cx, tangential p2
    if not pad_edge:
        vm = valid[:, :, None, None]
        seq3d = jnp.where(vm, seq3d, 0.0)
        seq2d = jnp.where(vm, seq2d, 0.0)
    return (seq3d, seq2d, valid.astype(jnp.float32), cams,
            jnp.take(store["subjects"], s_i), jnp.take(store["actions"], s_i),
            centers, stride_mask)


def materialize_amass(store, plan, pad_edge: bool):
    """(plan params on device) → the FastAMASSBatcher batch tuple
    (world-space 3D + 18-vec camera; flip does not alter the camera)."""
    idx, valid, cam_choice, do_flip, centers, stride_mask = plan
    seq3d = jnp.take(store["store3d"], idx, axis=0)
    fp = store.get("flip_perm")
    if fp is not None:
        seq3d = _flip_poses(seq3d, fp, do_flip)
    if not pad_edge:
        seq3d = jnp.where(valid[:, :, None, None], seq3d, 0.0)
    cams = jnp.take(store["cams"], cam_choice, axis=0)  # (B, 18)
    zeros = jnp.zeros(idx.shape[0], jnp.int32)
    return (seq3d, cams, valid.astype(jnp.float32), zeros, zeros,
            centers, stride_mask)


class H36mDeviceFeed:
    """Wraps a FastH36mBatcher: same epoch planner / RNG streams, but yields
    per-row PLAN tuples (a few hundred KB) instead of materialized windows;
    `materialize_h36m(self.store, plan, self.pad_edge)` inside the jitted
    step produces the exact host batch."""

    materialize = staticmethod(materialize_h36m)

    def __init__(self, batcher: FastH36mBatcher):
        self.b = batcher
        self.batch_size = batcher.batch_size
        self.pad_edge = bool(batcher.gen.windower.pad_edge)
        assert batcher.store3d.shape[0] < 2 ** 31, "int32 gather indices"
        self.store = dict(
            store3d=jnp.asarray(batcher.store3d),
            store2d=jnp.asarray(batcher.store2d),
            cams=jnp.asarray(batcher.cams),
            subjects=jnp.asarray(batcher.subjects, jnp.int32),
            actions=jnp.asarray(batcher.actions, jnp.int32),
        )
        if batcher.flip_perm is not None:
            self.store["flip_perm"] = jnp.asarray(batcher.flip_perm, jnp.int32)

    def __len__(self):
        return len(self.b)

    def _plan_slice(self, plan, sl):
        return (plan["abs_indices"][sl].astype(np.int32),
                plan["valid"][sl],
                plan["s_i"][sl].astype(np.int32),
                plan["do_flip"][sl].astype(bool),
                plan["centers"][sl].astype(np.int32),
                plan["stride_mask"][sl])

    def plan_batches(self, rows: slice = None):
        return _batches_with_carry(self.b._epoch_plan, self._plan_slice,
                                   self.batch_size, rows=rows)

    def host_ids(self, plan):
        """(subjects, actions) numpy rows for a plan batch (metrics are
        host-side; saves fetching them back off the device)."""
        s_i = plan[2]
        return self.b.subjects[s_i], self.b.actions[s_i]


class AMASSDeviceFeed:
    """AMASS variant of H36mDeviceFeed (cam_choice instead of s_i)."""

    materialize = staticmethod(materialize_amass)

    def __init__(self, batcher: FastAMASSBatcher):
        self.b = batcher
        self.batch_size = batcher.batch_size
        self.pad_edge = bool(batcher.gen.windower.pad_edge)
        assert batcher.store3d.shape[0] < 2 ** 31, "int32 gather indices"
        self.store = dict(
            store3d=jnp.asarray(batcher.store3d),
            cams=jnp.asarray(batcher.cams),
        )
        if batcher.flip_perm is not None:
            self.store["flip_perm"] = jnp.asarray(batcher.flip_perm, jnp.int32)

    def __len__(self):
        return len(self.b)

    def _plan_slice(self, plan, sl):
        return (plan["abs_indices"][sl].astype(np.int32),
                plan["valid"][sl],
                plan["cam_choice"][sl].astype(np.int32),
                plan["do_flip"][sl].astype(bool),
                plan["centers"][sl].astype(np.int32),
                plan["stride_mask"][sl])

    def plan_batches(self, rows: slice = None):
        return _batches_with_carry(self.b._epoch_plan, self._plan_slice,
                                   self.batch_size, rows=rows)

    def host_ids(self, plan):
        n = plan[0].shape[0]
        zeros = np.zeros(n, np.int32)
        return zeros, zeros


def make_device_feed(batcher):
    if isinstance(batcher, FastH36mBatcher):
        return H36mDeviceFeed(batcher)
    if isinstance(batcher, FastAMASSBatcher):
        return AMASSDeviceFeed(batcher)
    raise TypeError(f"no device feed for {type(batcher).__name__}")
