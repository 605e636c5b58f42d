"""Evaluation harness + CLI (parity with reference `eval.py`).

Protocol: one window per test frame (subsample = DATASET_TEST_3D_SUBSAMPLE_STEP,
global stride-mask alignment, no shuffle), central-frame prediction per window,
optional flip-TTA (averaged inside one jitted step), linear interpolation of
keyframe predictions to all frames, float64 metrics on host.

CLI:
    python -m uplift_upsample_tpu.eval --weights w.h5 --config cfg.json \
        --dataset data_3d_h36m.npz --dataset_2d data_2d_...npz
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import itertools

from .config import UpliftUpsampleConfig
from .data import h36m_splits
from .data.fast_batcher import FastH36mBatcher
from .data.generator import H36mSequenceGenerator
from .data.loading import filter_and_subsample_dataset, load_dataset_and_2d_poses
from .models import build_uplift_upsample_transformer
from .utils.eval_protocol import compute_and_log_metrics, interpolate_between_keyframes
from .utils.time_format import format_time
from .utils.weights_h5 import load_keras_h5


def log(*args):
    print(*args)
    sys.stdout.flush()


def resolve_temporal_wpt(wpt, num_frames: int) -> int:
    """Eval temporal-kernel windows-per-tile (config EVAL_TEMPORAL_WPT).

    "auto"/None: 8 when R = wpt*ceil(N/8)*8 aligns to the 128-lane register
    width at wpt=8 but not at wpt=4 (h36m_81: s_pad=48 → R=384, measured
    +10% over wpt=4), else 4 (flagship h36m_351 optimum; PERF_NOTES.md wpt
    sweep)."""
    if wpt not in (None, "auto"):
        return int(wpt)
    s_pad = -(-num_frames // 8) * 8
    if (8 * s_pad) % 128 == 0 and (4 * s_pad) % 128 != 0:
        return 8
    return 4


def make_test_step(model, variables, flip_tta: bool, flip_lr_indices,
                   fused_spatial: bool = False, strict_precision: bool = False,
                   fused: str = None, precision: str = None,
                   max_keyframes: int = None,
                   assume_dense_mask: bool = False,
                   shared_spatial: bool = False,
                   temporal_wpt=None,
                   tta_batched: bool = True,
                   mesh=None,
                   strided_sel: bool = False):
    """Jitted forward step with optional fused flip-TTA.

    `fused` selects the eval compute path — THE one configuration shared by
    eval.py and bench.py (see PERF_NOTES.md for the measured drift/cost
    table):
      - "full": fused Pallas spatial stack (HIGH3 dots; HIGHEST when
        `strict_precision`) + fused transposed-layout temporal stack +
        fused first strided block (ops/pallas_{spatial,temporal_v3,strided}),
        XLA for the small remainder. Central prediction only.
      - "spatial": fused spatial kernel + XLA tail (legacy fused_spatial).
      - "none": pure XLA model.apply.
    `fused_spatial` is the legacy boolean for "spatial".
    `max_keyframes`: keyframe-sparse spatial stage on the "full" path — the
    spatial stack runs only on the ≤max_keyframes real-input frames per
    window (the model discards masked frames' spatial output; see
    bench_forward). Exact when every window has at most that many keyframes;
    the caller derives it from the static MASK_STRIDE (ceil(N/s)).

    Returns fn(keypoints2d (B,N,K,2) unmasked, stride_mask (B,N) bool)
    → (pred_sequence (B,N,K,3) | None, pred_central (B,K,3)).

    `tta_batched`: run flip-TTA as ONE forward on the concatenated
    [unflipped; flipped] batch (2B windows / 2U unique frames in one kernel
    invocation chain) instead of two full forwards. Exact — the same math,
    batched. Config knob: EVAL_TTA_BATCHED (default True).
    `shared_spatial`: cross-window shared spatial stage (window-sparse
    protocol; see models/bench_forward.shared_spatial_forward). The step
    signature becomes fn(unique2d (U,K,2) MASKED deduped frames,
    win_idx (B,N) int32, stride_mask (B,N)) — the caller masks frames on
    host and dedups them (all-masked frames collapse to the zero row).
    Supported for fused="full" and fused="none"; flip-TTA flips the unique
    frames (flip is per-frame, so the dedup structure is preserved).
    """
    flip_idx = jnp.asarray(np.asarray(flip_lr_indices, dtype=np.int32))
    if fused is None:
        fused = "spatial" if fused_spatial else "none"

    if precision is None:
        precision = "highest" if strict_precision else "high"
    if precision == "highest" and fused == "full":
        # Strictest rung: pure XLA under default_matmul_precision("highest")
        # (measured 0.014 mm mean vs CPU-f32 truth — the gold standard; the
        # fused kernels' HIGHEST lowering is not supported by Mosaic).
        fused = "none"

    if shared_spatial:
        assert (model.spatial_depth > 0
                and (fused == "none"
                     or (fused == "full" and model.temporal_depth > 0))), \
            "shared_spatial needs the fused-full or XLA path + a spatial stack"

    if (fused == "full" and model.spatial_depth > 0
            and model.temporal_depth > 0):
        from .models.bench_forward import bench_forward, shared_spatial_forward
        from .ops.pallas_spatial import HIGH3
        from .ops.pallas_temporal import stack_temporal_params
        temporal_wpt = resolve_temporal_wpt(temporal_wpt, model.num_frames)
        # Precision ladder (measured in tools/check_tpu_parity.py, documented
        # in PERF_NOTES.md): "default" = 1-pass-bf16 dots (fast; ~0.8%
        # relative drift vs f32 — fine for throughput work, not for reporting
        # MPJPE); "high" = bf16x3 dots everywhere (~1e-5 relative, holds the
        # 0.1 mm parity bar with margin); "highest" = full f32.
        sp_prec = {"default": jax.lax.Precision.DEFAULT, "high": HIGH3,
                   "highest": jax.lax.Precision.HIGHEST}[precision]
        tm_prec = {"default": jax.lax.Precision.DEFAULT, "high": HIGH3,
                   "highest": jax.lax.Precision.HIGHEST}[precision]
        stacked = stack_temporal_params(variables["params"], model.temporal_depth)

        if shared_spatial:
            def forward(unique2d, win_idx, stride_mask):
                central = shared_spatial_forward(
                    model, variables, unique2d, win_idx, stride_mask,
                    spatial_precision=sp_prec, temporal_precision=tm_prec,
                    stacked_temporal=stacked, temporal_wpt=temporal_wpt,
                    assume_dense_mask=assume_dense_mask,
                    strided_sel=strided_sel)
                return None, central
        else:
            def forward(keypoints2d, stride_mask):
                x = keypoints2d
                if model.has_strided_input:
                    x = x * stride_mask[:, :, None, None].astype(x.dtype)
                central = bench_forward(
                    model, variables, x, stride_mask, spatial_precision=sp_prec,
                    temporal_precision=tm_prec, stacked_temporal=stacked,
                    max_keyframes=max_keyframes, temporal_wpt=temporal_wpt,
                    assume_dense_mask=assume_dense_mask,
                    strided_sel=strided_sel)
                return None, central
    elif fused in ("full", "spatial") and model.spatial_depth > 0:
        from .ops.pallas_spatial import HIGH3, spatial_stack_apply
        tail = model.clone(spatial_input=True)
        kernel_precision = (jax.lax.Precision.HIGHEST
                            if strict_precision else HIGH3)

        def forward(keypoints2d, stride_mask):
            x = keypoints2d
            if model.has_strided_input:
                x = x * stride_mask[:, :, None, None].astype(x.dtype)
            sp = spatial_stack_apply(variables["params"], x,
                                     num_blocks=model.spatial_depth,
                                     num_heads=model.num_heads,
                                     precision=kernel_precision)
            if model.has_strided_input:
                return tail.apply(variables, sp, stride_mask=stride_mask, training=False)
            return tail.apply(variables, sp, training=False)
    elif shared_spatial:
        # Pure-XLA shared path via the model's s2t splice flags (used on CPU
        # and for the strictest precision rung).
        feats_model = model.clone(s2t_output=True)
        tail_model = model.clone(s2t_input=True)

        def forward(unique2d, win_idx, stride_mask):
            y_u = feats_model.apply(variables, unique2d[:, None],
                                    training=False)           # (U, 1, C)
            y = jnp.take(y_u[:, 0], win_idx, axis=0)          # (B, N, C)
            return tail_model.apply(variables, y, stride_mask=stride_mask,
                                    training=False)
    else:
        def forward(keypoints2d, stride_mask):
            x = keypoints2d
            if model.has_strided_input:
                x = x * stride_mask[:, :, None, None].astype(x.dtype)
                return model.apply(variables, x, stride_mask=stride_mask, training=False)
            return model.apply(variables, x, training=False)

    def _flip_in(frames):
        """x-negate + L/R joint swap; frames is (..., K, 2)."""
        flipped = jnp.concatenate([-frames[..., :1], frames[..., 1:]], axis=-1)
        return jnp.take(flipped, flip_idx, axis=-2)

    def _unflip_central(f_central):
        return jnp.concatenate(
            [-f_central[..., :1], f_central[..., 1:]], axis=-1)[:, flip_idx]

    def _unflip_seq(f_seq):
        return jnp.concatenate(
            [-f_seq[..., :1], f_seq[..., 1:]], axis=-1)[:, :, flip_idx]

    def _step_inner(keypoints2d, stride_mask):
        if flip_tta and tta_batched:
            # Batched TTA: ONE forward on the concatenated
            # [unflipped; flipped] batch (2B windows through one kernel
            # invocation chain) instead of two full forwards — halves the
            # per-call/dispatch overhead; per-window work is unchanged.
            b = keypoints2d.shape[0]
            both = jnp.concatenate([keypoints2d, _flip_in(keypoints2d)], axis=0)
            sm2 = jnp.concatenate([stride_mask, stride_mask], axis=0)
            pred_seq2, central2 = forward(both, sm2)
            pred_central = (central2[:b] + _unflip_central(central2[b:])) / 2.0
            pred_seq = None
            if pred_seq2 is not None:
                pred_seq = (pred_seq2[:b] + _unflip_seq(pred_seq2[b:])) / 2.0
            return pred_seq, pred_central
        pred_seq, pred_central = forward(keypoints2d, stride_mask)
        if flip_tta:
            f_seq, f_central = forward(_flip_in(keypoints2d), stride_mask)
            pred_central = (pred_central + _unflip_central(f_central)) / 2.0
            if pred_seq is not None:
                pred_seq = (pred_seq + _unflip_seq(f_seq)) / 2.0
        return pred_seq, pred_central

    def _step_inner_shared(unique2d, win_idx, stride_mask):
        # flip is per-frame, so flipping the UNIQUE frames with the same
        # gather indices is exactly the dense flip pass
        if flip_tta and tta_batched:
            # Batched TTA over the shared path: [uniques; flipped uniques]
            # through one spatial invocation, [windows; flipped windows]
            # (gathering from the second half) through one temporal chain.
            u = unique2d.shape[0]
            b = win_idx.shape[0]
            both_u = jnp.concatenate([unique2d, _flip_in(unique2d)], axis=0)
            both_idx = jnp.concatenate([win_idx, win_idx + u], axis=0)
            both_sm = jnp.concatenate([stride_mask, stride_mask], axis=0)
            pred_seq2, central2 = forward(both_u, both_idx, both_sm)
            pred_central = (central2[:b] + _unflip_central(central2[b:])) / 2.0
            pred_seq = None
            if pred_seq2 is not None:
                pred_seq = (pred_seq2[:b] + _unflip_seq(pred_seq2[b:])) / 2.0
            return pred_seq, pred_central
        pred_seq, pred_central = forward(unique2d, win_idx, stride_mask)
        if flip_tta:
            f_seq, f_central = forward(_flip_in(unique2d), win_idx, stride_mask)
            pred_central = (pred_central + _unflip_central(f_central)) / 2.0
            if pred_seq is not None:
                pred_seq = (pred_seq + _unflip_seq(f_seq)) / 2.0
        return pred_seq, pred_central

    if shared_spatial:
        def step(unique2d, win_idx, stride_mask):
            with jax.default_matmul_precision(precision):
                return _step_inner_shared(unique2d, win_idx, stride_mask)
    else:
        def step(keypoints2d, stride_mask):
            # Bind the XLA remainder (s2t dense, late strided blocks, heads)
            # to the same precision rung as the fused kernels
            with jax.default_matmul_precision(precision):
                return _step_inner(keypoints2d, stride_mask)

    if mesh is not None:
        # Data-parallel eval over a jax.sharding Mesh: windows shard on the
        # "dp" axis, params (closed-over consts) replicate, XLA partitions
        # the step. In the shared-spatial step the unique-frame tensor is
        # REPLICATED — its U dim is not window-aligned, and at ~2k frames
        # the redundant spatial stage is ≪ the sharded temporal stage. The
        # caller guarantees BATCH_SIZE % mesh dp size == 0 (batches are
        # padded to a full static batch already).
        from .parallel.mesh import batch_sharding, replicated_sharding
        data = batch_sharding(mesh)
        repl = replicated_sharding(mesh)
        in_sh = (repl, data, data) if shared_spatial else (data, data)
        return jax.jit(step, in_shardings=in_sh, out_shardings=data)
    return jax.jit(step)


def sparse_rows_to_compute(frame_indices, kf_stride, state):
    """Rows the window-sparse strided eval must run the model on.

    Keyframe-centered rows (index % kf_stride == 0) — the only rows the
    interpolation pass reads — PLUS any row before the first keyframe of its
    sequence (restart = non-increasing index), which the interpolation pass
    deliberately leaves untouched (utils/eval_protocol.py:89-93) and whose
    raw prediction therefore reaches the metrics. `state` is a mutable
    [prev_index, seen_keyframe] carried across batches; start with
    [None, False].
    """
    rows = []
    prev_f, seen_kf = state
    for r, f in enumerate(frame_indices):
        f = int(f)
        if prev_f is not None and f <= prev_f:
            seen_kf = False  # sequence restart
        prev_f = f
        if f % kf_stride == 0:
            seen_kf = True
            rows.append(r)
        elif not seen_kf:
            rows.append(r)
    state[0], state[1] = prev_f, seen_kf
    return rows


def build_eval_generator(config: UpliftUpsampleConfig, dataset_path, dataset2d_path,
                         test_subset, verbose=True):
    selected_subjects = h36m_splits.subjects_by_split[test_subset]
    dataset_3d, poses_2d = load_dataset_and_2d_poses(
        dataset_path=dataset_path, poses_2d_path=dataset2d_path, verbose=verbose)
    camera_params, poses_3d, poses_2d, _, subjects, actions, frame_rates = \
        filter_and_subsample_dataset(
            dataset=dataset_3d, poses_2d=poses_2d, subjects=selected_subjects,
            action_filter="*", downsample=1, image_base_path=dataset_path,
            verbose=verbose)
    return H36mSequenceGenerator(
        poses_3d, poses_2d, camera_params=camera_params, subjects=subjects,
        actions=actions, frame_rates=frame_rates, split=test_subset,
        seq_len=config.SEQUENCE_LENGTH, target_frame_rate=50,
        subsample=config.DATASET_TEST_3D_SUBSAMPLE_STEP, stride=config.SEQUENCE_STRIDE,
        padding_type=config.PADDING_TYPE, mask_stride=config.MASK_STRIDE,
        stride_mask_align_global=True, rand_shift_stride_mask=False,
        flip_augment=False, shuffle=False, verbose=verbose)


def run_eval(config: UpliftUpsampleConfig, dataset_name, dataset_path, dataset2d_path,
             test_subset, weights_path=None, model=None, variables=None,
             action_wise=True, verbose=True):
    """Run H3.6M evaluation; returns (all-frames results, keyframes results or None),
    each as (frame_results, average_results, per_action_results)."""
    assert dataset_name == "h36m", "Invalid dataset"
    assert not (weights_path is None and variables is None)

    if model is None:
        model = build_uplift_upsample_transformer(config=config)
    if variables is None:
        log(f"Loading weights from {weights_path}")
        variables = load_keras_h5(weights_path, model)

    generator = build_eval_generator(config, dataset_path, dataset2d_path,
                                     test_subset, verbose=verbose)
    num_examples = len(generator)
    log(f"Sequences: {num_examples}")

    fused_mode = getattr(config, "EVAL_FUSED", "auto")
    if fused_mode == "auto":
        # Fused Pallas kernels only where Mosaic can lower them (TPU); plain
        # XLA elsewhere (CPU has only the slow interpreter and is already
        # exact f32; GPU cannot lower pltpu kernels).
        from .utils.backend import is_tpu_backend
        if not is_tpu_backend():
            fused_mode = ("spatial"
                          if getattr(config, "USE_PALLAS_SPATIAL", False)
                          else "none")
        else:
            fused_mode = "full"
    # Keyframe-sparse spatial stage: window tokens sit at global frames
    # i + (t-mid)·stride, and the aligned eval mask marks tokens with global
    # frame ≡ 0 (mod ms) (reference uplifiting_dataset.py:381-394), so real-
    # input tokens recur with token period ms/gcd(stride, ms) — at most
    # ceil(N/period) per window. The model discards every other frame's
    # spatial output, so the spatial kernel runs only on the keyframes.
    # Exact; verified by tests/test_bench_forward.py. period == 1 (e.g. the
    # flagship s_in=5 at stride 5: computed windows are fully dense) → off.
    max_kf = None
    period = None
    ms = config.MASK_STRIDE
    if isinstance(ms, int) and ms > 1:
        import math
        period = ms // math.gcd(config.SEQUENCE_STRIDE, ms)
        if period > 1:
            max_kf = -(-config.SEQUENCE_LENGTH // period)

    # Window-sparse strided eval: the interpolation pass overwrites every
    # prediction whose frame index is not a multiple of the keyframe stride
    # (reference eval.py:209-222 + action_wise_eval.py:76-100 — non-keyframe
    # rows are pure interpolation of keyframe rows), and the KEYFRAMES report
    # reads only index % MASK_STRIDE == 0 rows. So the model only needs to
    # run on keyframe-centered windows — 1/stride of the dataset — for
    # bit-identical metrics. Each computed window thus uplifts `stride`
    # output frames. Gated on MASK_STRIDE % keyframe_stride == 0 so the
    # KEYFRAMES subset stays inside the computed set.
    strided_eval = config.SEQUENCE_STRIDE > 1 and config.TEST_STRIDED_EVAL
    kf_stride = config.SEQUENCE_STRIDE
    if config.EVAL_DISABLE_LEARNED_UPSAMPLING and config.MASK_STRIDE is not None:
        kf_stride = config.MASK_STRIDE
    ms_ = config.MASK_STRIDE
    window_sparse = (
        strided_eval and isinstance(kf_stride, int) and kf_stride > 1
        and (ms_ is None or (isinstance(ms_, int) and ms_ % kf_stride == 0))
        and bool(getattr(config, "EVAL_SKIP_INTERPOLATED_WINDOWS", True)))

    # With token period 1 (ms divides stride) every COMPUTED window's mask is
    # all-ones (its center i is a multiple of kf_stride, and ms | kf_stride
    # in both kf_stride branches), so the first-block key-mask machinery is
    # statically inert — skip it.
    assume_dense = bool(window_sparse and period == 1)
    eval_precision = getattr(config, "EVAL_MATMUL_PRECISION", "high") or "high"

    # Data-parallel eval mesh: shard the (static, padded) window batches over
    # the available devices — same layout as training (parallel/mesh.py),
    # params replicated, no collectives in the forward. Single-device runs
    # (the common case here: one chip) keep mesh=None.
    n_devices = len(jax.devices())
    dp = getattr(config, "DATA_PARALLEL_DEVICES", -1)
    dp = n_devices if dp in (-1, None) else dp
    mesh = None
    if dp > 1:
        from .utils.backend import is_tpu_backend
        if fused_mode != "none" and not is_tpu_backend():
            # Interpret-mode Pallas (the non-TPU fallback for the fused
            # kernels) lowers to io_callbacks, which the SPMD partitioner
            # rejects — a fused+mesh eval is only valid on real TPUs.
            log(f"fused={fused_mode} runs Pallas in interpret mode on this "
                f"backend — single-device eval")
        elif config.BATCH_SIZE % dp == 0:
            from .parallel.mesh import make_mesh
            mesh = make_mesh(num_devices=dp)
            log(f"Data-parallel eval over {dp} devices")
        else:
            log(f"BATCH_SIZE {config.BATCH_SIZE} does not divide over "
                f"{dp} devices — single-device eval")

    eval_wpt = getattr(config, "EVAL_TEMPORAL_WPT", "auto")
    tta_batched = bool(getattr(config, "EVAL_TTA_BATCHED", True))
    test_step = make_test_step(
        model, variables, flip_tta=config.EVAL_FLIP,
        flip_lr_indices=config.AUGM_FLIP_KEYPOINT_ORDER,
        fused=fused_mode, precision=eval_precision,
        max_keyframes=max_kf, assume_dense_mask=assume_dense,
        temporal_wpt=eval_wpt, tta_batched=tta_batched, mesh=mesh)

    # Cross-window shared spatial stage (see EVAL_SHARED_SPATIAL in config.py
    # and models/bench_forward.shared_spatial_forward): in window-sparse mode
    # consecutive computed windows overlap in N-1 frames and the spatial
    # stage is frame-independent, so per-frame features are computed once per
    # unique masked frame. Host-side content dedup (utils/dedup.py, exact
    # hash+verify) also collapses all masked frames (zeroed content) into one
    # row — this subsumes the keyframe-sparse gather for token-sparse windows.
    shared_cfg = getattr(config, "EVAL_SHARED_SPATIAL", "auto")
    if shared_cfg == "auto":
        shared = bool(window_sparse and fused_mode == "full"
                      and model.spatial_depth > 0 and model.temporal_depth > 0)
    else:
        shared = bool(shared_cfg and window_sparse
                      and fused_mode in ("full", "none")
                      and model.spatial_depth > 0)
    shared_step, u_max = None, 0
    if shared:
        shared_step = make_test_step(
            model, variables, flip_tta=config.EVAL_FLIP,
            flip_lr_indices=config.AUGM_FLIP_KEYPOINT_ORDER,
            fused=fused_mode, precision=eval_precision,
            assume_dense_mask=assume_dense, shared_spatial=True,
            temporal_wpt=eval_wpt, tta_batched=tta_batched, mesh=mesh)
        u_extra = int(getattr(config, "EVAL_SHARED_UMAX_EXTRA", 1024))
        u_max = min(config.BATCH_SIZE * config.SEQUENCE_LENGTH,
                    max(config.BATCH_SIZE + u_extra, config.SEQUENCE_LENGTH))
        u_max = -(-u_max // 8) * 8

    # One flat BYTE upload per flush instead of three array RPCs (see
    # EVAL_PACKED_UPLOAD in config.py): uq as raw f32 bytes, window indices
    # as int16 (u_max < 32768), stride masks bit-packed — 1.58 MB → 0.71 MB
    # per flush. Through the relay, upload cost ≈ 50 ms fixed per RPC plus
    # tens of ms/MB (measured round-9), so both the RPC count and the bytes
    # matter; on direct-attached hosts this is one DMA instead of three.
    packed_step = None
    if (shared and mesh is None and u_max < 2 ** 15
            and bool(getattr(config, "EVAL_PACKED_UPLOAD", True))):
        _bs, _n = config.BATCH_SIZE, config.SEQUENCE_LENGTH
        _k = config.NUM_KEYPOINTS
        _a = u_max * _k * 2 * 4              # uq f32 bytes
        _b = _a + _bs * _n * 2               # idx int16 bytes
        _nbits = -(-_bs * _n // 8)           # smb packbits (little order)
        _shared_inner = shared_step

        def _pack_host(uq, idx, smb):
            return np.concatenate([
                uq.astype(np.float32, copy=False).view(np.uint8).ravel(),
                idx.astype(np.int16).view(np.uint8).ravel(),
                np.packbits(np.asarray(smb, bool).ravel(),
                            bitorder="little")])

        @jax.jit
        def packed_step(flat_u8):
            uq = jax.lax.bitcast_convert_type(
                flat_u8[:_a].reshape(u_max * _k * 2, 4),
                jnp.float32).reshape(u_max, _k, 2)
            idx = jax.lax.bitcast_convert_type(
                flat_u8[_a:_b].reshape(_bs * _n, 2),
                jnp.int16).astype(jnp.int32).reshape(_bs, _n)
            bits = flat_u8[_b:_b + _nbits]
            smb = ((bits[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
            smb = smb.reshape(-1)[: _bs * _n].reshape(_bs, _n) > 0
            return _shared_inner(uq, idx, smb)

    log(f"Running evaluation on '{test_subset}' with {num_examples} examples")
    start = time.time()
    mid_index = config.SEQUENCE_LENGTH // 2
    root = config.ROOT_KEYTPOINT

    if window_sparse:
        log(f"Window-sparse strided eval: computing only every "
            f"{kf_stride}-th window (others are interpolation-only)"
            + (f"; shared spatial stage (capacity {u_max} unique frames)"
               if shared else ""))

    gt_central = []
    gt_subjects, gt_actions, gt_indices = [], [], []
    examples = 0
    # Packed keyframe-window batches: rows accumulate across incoming batches
    # and run through test_step only when a full batch is ready (one compiled
    # shape); device predictions are scattered back by global example row.
    pend_x, pend_sm, pend_pos = [], [], []
    pred_parts = []  # (device_pred, positions, count)
    sparse_state = [None, False]  # sparse_rows_to_compute carry

    shared_fallbacks = [0]
    # Wall-time attribution of the eval loop's phases (one summary line at
    # the end — the full-scale dress rehearsal showed the CLI is host-bound
    # and subtraction-free phase timers are the only way to see where).
    timing = {"batcher": 0.0, "sparse_pack": 0.0, "dedup": 0.0,
              "upload_dispatch": 0.0, "gt_extract": 0.0, "fetch_scatter": 0.0,
              "interp": 0.0, "metrics": 0.0}

    def flush(force=False):
        bs = config.BATCH_SIZE
        while len(pend_pos) >= bs or (force and pend_pos):
            take = min(bs, len(pend_pos))
            xb = np.stack(pend_x[:take])
            smb = np.stack(pend_sm[:take])
            if take < bs:  # pad the final partial batch
                rep = (0, bs - take)
                xb = np.pad(xb, (rep, (0, 0), (0, 0), (0, 0)), mode="edge")
                smb = np.pad(smb, (rep, (0, 0)), mode="edge")
            pred = None
            if shared_step is not None:
                from .utils.dedup import dedup_rows
                n_seq = xb.shape[1]
                xm = xb * smb[:, :, None, None].astype(xb.dtype)
                t0 = time.perf_counter()
                uniq, inv = dedup_rows(xm.reshape(bs * n_seq, -1))
                timing["dedup"] += time.perf_counter() - t0
                if len(uniq) <= u_max:
                    uq = np.zeros((u_max,) + xm.shape[2:], xm.dtype)
                    uq[:len(uniq)] = uniq.reshape((-1,) + xm.shape[2:])
                    idx = inv.reshape(bs, n_seq).astype(np.int32)
                    t0 = time.perf_counter()
                    if packed_step is not None:
                        _, pred = packed_step(jnp.asarray(_pack_host(
                            uq, idx, smb)))
                    else:
                        _, pred = shared_step(jnp.asarray(uq),
                                              jnp.asarray(idx),
                                              jnp.asarray(smb))
                    timing["upload_dispatch"] += time.perf_counter() - t0
                else:
                    # more unique frames than the static step capacity (many
                    # sequence restarts in one batch) — dense step fallback
                    shared_fallbacks[0] += 1
            if pred is None:
                t0 = time.perf_counter()
                _, pred = test_step(jnp.asarray(xb), jnp.asarray(smb))
                timing["upload_dispatch"] += time.perf_counter() - t0
            pred_parts.append((pred, np.asarray(pend_pos[:take]), take))
            del pend_x[:take], pend_sm[:take], pend_pos[:take]
            if not force:
                break

    # Native-accelerated batches; chained deterministic epochs == the
    # reference's repeat(2) → batch → take(ceil) protocol. Matmul precision
    # is bound inside the step functions at trace time (make_test_step
    # resolves the rung itself) — no outer context needed here.
    num_batches = int(np.ceil(num_examples / config.BATCH_SIZE))
    # central_3d_only: the loop reads only the central-frame 3D ground
    # truth, so skip materializing the other N-1 rows of every 3D window
    # (~60% of the batcher's gather bytes at the flagship geometry).
    fast = FastH36mBatcher(generator, batch_size=config.BATCH_SIZE,
                           central_3d_only=True)
    batch_iter = iter(itertools.islice(fast.batches(), num_batches))
    while True:
        t0 = time.perf_counter()
        batch = next(batch_iter, None)
        timing["batcher"] += time.perf_counter() - t0
        if batch is None:
            break
        seq3d, seq2d, seq_mask, cams, subjects, actions, indices, stride_masks = batch

        include = min(config.BATCH_SIZE, num_examples - examples)
        if window_sparse:
            # Host-side safety net for the keyframe-sparse spatial bound:
            # a window with more real-input frames than max_kf would be
            # silently mis-gathered in bench_forward (documented
            # precondition) — catch protocol drift here instead.
            if max_kf is not None:
                counts = np.asarray(stride_masks[:include]).sum(axis=1)
                assert counts.max(initial=0) <= max_kf, (
                    f"stride mask has {int(counts.max())} keyframes, "
                    f"bound {max_kf} — MASK_STRIDE/window derivation "
                    f"out of sync with the generator")
            t0 = time.perf_counter()
            rows = sparse_rows_to_compute(indices[:include], kf_stride,
                                          sparse_state)
            for r in rows:
                pend_x.append(seq2d[r])
                pend_sm.append(stride_masks[r])
                pend_pos.append(examples + int(r))
            timing["sparse_pack"] += time.perf_counter() - t0
            flush()
        else:
            _, pred = test_step(jnp.asarray(seq2d), jnp.asarray(stride_masks))
            # Keep predictions on device; fetching here would sync every
            # batch (expensive through relay-tunneled PJRT). One transfer
            # at the end.
            pred_parts.append((pred, np.arange(examples, examples + include),
                               include))
        t0 = time.perf_counter()
        # Only the central frame feeds the metrics — avoid the full-window
        # (B, N, 17, 3) root-subtract for a (B, 17, 3) slice. Works for both
        # 3D widths (full N or the batcher's central_3d_only single row).
        central3d = seq3d[:include, seq3d.shape[1] // 2]
        gt_central.append(central3d - central3d[:, root:root + 1, :])
        gt_subjects.extend(subjects[:include])
        gt_actions.append(np.asarray(actions[:include]))
        gt_indices.append(np.asarray(indices[:include]))
        timing["gt_extract"] += time.perf_counter() - t0
        examples += include
    if window_sparse:
        flush(force=True)
    if shared_fallbacks[0]:
        log(f"Shared-spatial: {shared_fallbacks[0]} batch(es) exceeded the "
            f"{u_max}-unique-frame capacity and used the dense step")

    gt_central = np.concatenate(gt_central, axis=0).astype(np.float64)
    gt_central = np.concatenate(
        [gt_central, np.ones(gt_central.shape[:-1] + (1,))], axis=-1)
    pred_central = np.zeros((num_examples, config.NUM_KEYPOINTS, 3), np.float64)
    t0 = time.perf_counter()
    if pred_parts:
        # ONE device→host transfer for the whole run instead of one RPC per
        # batch result (206 RPCs × ~50 ms fixed relay cost per stride at
        # full scale): concatenate the per-batch predictions on device,
        # fetch once, scatter on host.
        all_pred = np.asarray(jax.device_get(
            jnp.concatenate([p for p, _, _ in pred_parts], axis=0)))
        bs = config.BATCH_SIZE
        for i, (pred, positions, count) in enumerate(pred_parts):
            rows = all_pred[i * bs: i * bs + count]
            pred_central[positions] = rows.astype(np.float64)
    timing["fetch_scatter"] += time.perf_counter() - t0
    gt_actions = np.concatenate(gt_actions, axis=0)
    gt_indices = np.concatenate(gt_indices, axis=0)

    full_pred = np.copy(pred_central)
    if config.SEQUENCE_STRIDE > 1 and config.TEST_STRIDED_EVAL:
        log("Performing strided eval: Interpolating between keyframes")
        strides = np.tile([config.SEQUENCE_STRIDE], reps=(gt_indices.shape[0]))
        if config.EVAL_DISABLE_LEARNED_UPSAMPLING and config.MASK_STRIDE is not None:
            strides[:] = config.MASK_STRIDE
        t0 = time.perf_counter()
        interp_pred, _ = interpolate_between_keyframes(
            pred3d=full_pred, frame_indices=gt_indices, keyframe_stride=strides)
        timing["interp"] += time.perf_counter() - t0
        eval_pred = interp_pred
    else:
        eval_pred = full_pred

    log("\n### Evaluation on ALL FRAMES ####\n")
    t0 = time.perf_counter()
    all_frames = compute_and_log_metrics(
        pred3d=eval_pred, gt3d=gt_central, actions=gt_actions,
        root_index=root, action_wise=action_wise)
    timing["metrics"] += time.perf_counter() - t0

    keyframes_results = None
    if (config.SEQUENCE_STRIDE > 1
            or (config.MASK_STRIDE is not None and np.ndim(config.MASK_STRIDE) == 0
                and config.MASK_STRIDE > 1)) and config.TEST_STRIDED_EVAL:
        log("\n### Evaluation on KEYFRAMES ####\n")
        input_stride = config.SEQUENCE_STRIDE if config.MASK_STRIDE is None else config.MASK_STRIDE
        keyframes = np.equal(np.mod(gt_indices, input_stride), 0)
        keyframes_results = compute_and_log_metrics(
            pred3d=full_pred[keyframes], gt3d=gt_central[keyframes],
            actions=gt_actions[keyframes], root_index=root, action_wise=action_wise)

    total = time.time() - start
    attributed = sum(timing.values())
    log("Eval wall attribution: "
        + " ".join(f"{k}={v:.1f}s" for k, v in timing.items())
        + f" other={total - attributed:.1f}s total={total:.1f}s")
    log(f"Finished evaluation in {format_time(total)}")
    return all_frames, keyframes_results


def run_eval_multi_mask_stride(config: UpliftUpsampleConfig, *args, **kwargs):
    """Evaluate once per configured mask-stride value; returns {stride: results}."""
    config = config.copy()
    mask_stride_values = config.MASK_STRIDE
    if not isinstance(mask_stride_values, list):
        mask_stride_values = [mask_stride_values]
    results = {}
    for msv in mask_stride_values:
        config.MASK_STRIDE = msv
        if len(mask_stride_values) > 1:
            log(f"### Running evaluation for mask stride value: {msv} ###")
        results[msv] = run_eval(config=config, *args, **kwargs)
        if len(mask_stride_values) > 1:
            log(f"### Finished evaluation for mask stride value: {msv} ###")
    return results


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="3D evaluation on H36m (TPU-native).")
    parser.add_argument("--weights", required=True, help="Path to .h5 weights")
    parser.add_argument("--config", required=False, default=None)
    parser.add_argument("--batch_size", required=False, default=None, type=int)
    parser.add_argument("--dataset", required=False, default="./data/data_3d_h36m.npz")
    parser.add_argument("--dataset_2d", required=False,
                        default="./data/data_2d_h36m_cpn_ft_h36m_dbb.npz")
    parser.add_argument("--test_subset", required=False, default="test")
    parser.add_argument("--action_wise", dest="action_wise", action="store_true")
    parser.add_argument("--frame_wise", dest="action_wise", action="store_false")
    parser.set_defaults(action_wise=True)
    parser.add_argument("--forced_mask_stride", required=False, default=None, type=int)
    parser.add_argument("--no_learned_upsampling", dest="disable_learned_upsampling",
                        action="store_true")
    parser.set_defaults(disable_learned_upsampling=False)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (faster, ~0.1mm metric noise)")
    parser.add_argument("--pallas", action="store_true",
                        help="fused Pallas attention kernels")
    args = parser.parse_args(argv)

    from .configs import resolve_config
    config = resolve_config(args.config)
    assert config.ARCH == "UpliftUpsampleTransformer"
    if args.forced_mask_stride is not None:
        log(f"Setting mask stride to fixed value: {args.forced_mask_stride}")
        config.MASK_STRIDE = args.forced_mask_stride
    if args.batch_size is not None:
        config.BATCH_SIZE = int(args.batch_size)
    if args.disable_learned_upsampling and config.MASK_STRIDE is not None:
        log("WARNING: Disabling learned upsampling. Will use pure bi-linear upsampling.")
        config.EVAL_DISABLE_LEARNED_UPSAMPLING = True
    if args.bf16:
        config.COMPUTE_DTYPE = "bfloat16"
    if args.pallas:
        config.USE_PALLAS_ATTENTION = True

    config.display()
    run_eval_multi_mask_stride(
        config=config, dataset_name="h36m", dataset_path=args.dataset,
        dataset2d_path=args.dataset_2d, test_subset=args.test_subset,
        weights_path=args.weights, action_wise=args.action_wise)


if __name__ == "__main__":
    main()
