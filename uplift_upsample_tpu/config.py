"""Layered configuration system.

Mirrors the reference semantics (reference `common/utils/config.py:21-111` and
`common/net/uplift_upsample_transformer_config.py:13-106`): class-attribute
defaults, overlaid by a JSON (or `KEY <json-value>` text) file, then by CLI
overrides; the fully-resolved config can be dumped to JSON for archiving.

The key registry is intentionally identical to the reference's so that the
published `config/*.json` files load unchanged.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, Optional


class Config:
    """Base config: class attributes are defaults; instances carry overrides."""

    def __init__(self, config_file: Optional[str] = None, file_mode: Optional[str] = None):
        if config_file is not None:
            self.load(config_file, file_mode)

    # -- introspection ------------------------------------------------------

    def keys(self):
        seen = []
        for klass in type(self).__mro__:
            for name in vars(klass):
                if name.startswith("_") or callable(getattr(self, name)):
                    continue
                if name not in seen:
                    seen.append(name)
        for name in vars(self):
            if not name.startswith("_") and name not in seen:
                seen.append(name)
        return sorted(seen)

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for key in self.keys():
            value = getattr(self, key)
            if hasattr(value, "tolist"):
                value = value.tolist()
            out[key] = value
        return out

    def display(self) -> None:
        print("\nConfigurations:")
        for key in self.keys():
            print(f"{key:30} {getattr(self, key)}")
        print()

    def copy(self) -> "Config":
        new = type(self)()
        for key in self.keys():
            setattr(new, key, copy.deepcopy(getattr(self, key)))
        return new

    # -- file IO ------------------------------------------------------------

    def load(self, config_file: str, file_mode: Optional[str] = None) -> None:
        if not os.path.exists(config_file):
            raise FileNotFoundError(config_file)
        if file_mode is None:
            ext = os.path.splitext(config_file)[1]
            if ext not in (".txt", ".json"):
                raise ValueError(f"Cannot infer config format from extension: {ext!r}")
            file_mode = "txt" if ext == ".txt" else "json"

        if file_mode == "txt":
            with open(config_file) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    parts = line.split(" ", maxsplit=1)
                    if len(parts) == 2 and parts[1]:
                        literal = parts[1].strip().replace("'", '"')
                        setattr(self, parts[0], json.loads(literal))
        else:
            with open(config_file) as f:
                for key, value in json.load(f).items():
                    setattr(self, key, value)

    def dump(self, config_file: str) -> None:
        with open(config_file, "w") as f:
            json.dump(self.to_dict(), f, indent=4, sort_keys=True)

    def update_from(self, overrides: Dict[str, Any]) -> None:
        for key, value in overrides.items():
            setattr(self, key, value)


class UpliftUpsampleConfig(Config):
    """Full hyperparameter registry for the uplift-upsample transformer.

    Defaults match reference `uplift_upsample_transformer_config.py:13-106`.
    """

    # Execution
    GPU_ID = 0
    BATCH_SIZE = 256

    ARCH = "UpliftUpsampleTransformer"

    SHUFFLE_SEED = 0

    SPATIAL_EMBED_DIM = 32
    TEMPORAL_EMBED_DIM = 348

    MLP_RATIO = 2
    NUM_HEADS = 8
    SPATIAL_TRANSFORMER_BLOCKS = 4
    TEMPORAL_TRANSFORMER_BLOCKS = 4
    STRIDES = [3, 3, 3]
    PADDINGS = None  # None means [[1, 1]] per strided block
    QKV_BIAS = True
    DROP_PATH_RATE = [0.1, 0.1, 0.0]
    DROP_RATE = 0.0
    ATTENTION_DROP_RATE = 0.0
    OUTPUT_BN = False

    # Refine module
    USE_REFINE = False
    REFINE_FC_SIZE = 1024
    REFINE_DROP_RATE = 0.5

    # Token masking
    TOKEN_MASK_RATE = 0.0
    LEARNABLE_MASKED_TOKEN = False

    # Objective
    NUM_KEYPOINTS = 17
    SEQUENCE_LENGTH = 27
    PADDING_TYPE = "copy"
    SEQUENCE_STRIDE = 1
    TEST_STRIDED_EVAL = True

    MASK_STRIDE = None
    STRIDE_MASK_RAND_SHIFT = False
    FIRST_STRIDED_TOKEN_ATTENTION_LAYER = 0

    LOSS_WEIGHT_SEQUENCE = 1.0
    LOSS_WEIGHT_CENTER = 1.0

    # Data handling and augmentation (ROOT_KEYTPOINT typo kept for file compat)
    ROOT_KEYTPOINT = 6

    AUGM_FLIP_KEYPOINT_ORDER = [5, 4, 3, 2, 1, 0, 6, 7, 8, 9, 10, 16, 15, 14, 13, 12, 11]
    AUGM_FLIP_PROB = 0.5
    IN_BATCH_AUGMENT = False

    # Training
    EPOCHS = 120
    STEPS_PER_EPOCH = 6000

    DATASET_TRAIN_3D_SUBSAMPLE_STEP = 1
    DATASET_VAL_3D_SUBSAMPLE_STEP = 4
    DATASET_TEST_3D_SUBSAMPLE_STEP = 1

    # Validation
    VALIDATION_INTERVAL = 1
    VALIDATION_EXAMPLES = -1
    EVAL_FLIP = True
    EVAL_DISABLE_LEARNED_UPSAMPLING = False

    # Optimizer and schedule
    OPTIMIZER = "Adam"
    OPTIMIZER_PARAMS = {"amsgrad": True, "epsilon": 1e-08}

    SCHEDULE = "ExponentialDecayWithSteps"
    SCHEDULE_PARAMS = {
        "initial_learning_rate": 1e-3,
        "decay_steps": 12000,
        "decay_rate": 0.95,
        "large_decay_steps": 60000,
        "large_decay_rate": 0.5,
    }
    WEIGHT_DECAY = None

    EMA_ENABLED = False
    EMA_DECAY = None

    # Checkpoints
    CHECKPOINT_INTERVAL = 10
    BEST_CHECKPOINT_METRIC = "AW-MPJPE"

    # -- TPU-native extensions (not present in the reference) ---------------
    # Compute dtype for the forward pass: "float32" (bit-parity eval) or
    # "bfloat16" (throughput). Params are always stored in float32.
    COMPUTE_DTYPE = "float32"
    # Optional dtype override for the (bandwidth-bound) spatial stage only,
    # e.g. "bfloat16"; None inherits COMPUTE_DTYPE.
    SPATIAL_COMPUTE_DTYPE = None
    # Use the fused Pallas attention kernel where shapes allow.
    USE_PALLAS_ATTENTION = False
    # Use the fused Pallas spatial-stack kernel at eval (2.5x forward speedup;
    # matches CPU-f32 truth to ~1e-5, tighter than the XLA TPU path).
    USE_PALLAS_SPATIAL = False
    # Fused Pallas spatial kernels in training (custom VJP with a
    # hand-written Pallas backward, ops/pallas_spatial_bwd.py — 3.57x step
    # speedup). "auto" enables them on accelerators when DROP_RATE == 0 and
    # TOKEN_MASK_RATE == 0; set False to force the XLA path.
    TRAIN_FUSED_SPATIAL = "auto"
    # Frames per grid step for the fused spatial TRAIN kernels (fwd + bwd).
    # 128-multiple; measured sweep (PERF_NOTES round-6): 256 is the sweet
    # spot (18.95 vs 19.88 ms isolated, +1.2% end-to-end step); 512
    # regresses (21.6 ms — VMEM pressure). Per-frame math is block_f-
    # invariant; only the param-grad partial-sum order changes.
    TRAIN_SPATIAL_BLOCK_F = 256
    # Attention packing in the fused spatial TRAIN kernels ("fma" | "hpack").
    # "hpack" lane-packs all heads' attention FMAs into one rank-3 set
    # (identical math, ~8x fewer vector-op issues) — flip after on-chip A/B.
    TRAIN_SPATIAL_ATTN = "fma"
    # Fused Pallas temporal blocks in training (Pallas fwd + hand-written
    # bwd, ops/pallas_temporal_bwd.py). Gradient-parity tested; measured
    # 79.8 ms/step vs 82.2 spatial-only at B=512. "auto" follows
    # TRAIN_FUSED_SPATIAL's accelerator gating.
    TRAIN_FUSED_TEMPORAL = "auto"
    # Matmul precision for the fused TRAIN kernels (fwd+bwd dots):
    # "default" (1-pass bf16 everywhere with f32 accumulate/optimizer —
    # standard bf16 mixed-precision training, the measured-fastest: 9,462
    # w/s at B=512/wpt8 with keyframe-sparse spatial vs 7,874 "mixed"),
    # "mixed" (spatial HIGHEST / temporal DEFAULT — the conservative
    # round-2/3 shipped default), "high" (bf16x3 everywhere; above the
    # reference's effective TF32 training fidelity), "highest" (full f32).
    # The bf16 rung's convergence equivalence is measured: 10-epoch
    # identical-data sweeps on the learnable synthetic task (tools/
    # rung_convergence.py, PERF_NOTES "rung convergence") show mixed/
    # default/high loss trajectories interleaving within ±2-4% with no
    # systematic gap. Real-data confirmation still pending (dataset not in
    # this environment) — revert to "mixed" per config if it ever disagrees.
    TRAIN_MATMUL_PRECISION = "default"
    # Fused Pallas fwd+bwd for strided block 1 in training (head1 inline,
    # blocks 2+ and head2 stay flax). Gradient-parity-exact
    # (tests/test_fused_strided_train.py) but measured ~1 ms/step SLOWER
    # than XLA autodiff at B=512 (9,295 vs 9,462 w/s — the kernel's
    # backward replays the forward while XLA caches activations, and the
    # block is small enough that the saved transposes don't pay for it).
    # Kept off; "auto"/True enables on TPU when the geometry allows.
    TRAIN_FUSED_STRIDED = False
    # Keyframe-sparse spatial training: gather only real-input frames
    # through the spatial fwd+bwd kernels (masked frames' spatial compute
    # has zero gradient — their features are token-substituted). Exact;
    # static per-batch budget = mean + 8σ of the mask-stride mix (overflow
    # ~1e-11/step, poisons the loss with NaN rather than silently dropping
    # a keyframe). False = dense spatial training.
    TRAIN_KEYFRAME_SPARSE = True
    # Explicit frame budget override (0 = derive from MASK_STRIDE mix);
    # rounded up to a 128 multiple.
    TRAIN_KEYFRAME_BUDGET = 0
    # Windows per kernel tile for the fused temporal TRAIN blocks (R = wpt·72
    # lanes). Math-independent tiling choice (grad parity holds at any wpt);
    # 8 measured 16% faster than 4 at B=512 (the backward's in-kernel replay
    # amortizes over fewer grid steps). Benchable via `bench.py --train
    # --train-wpt N`.
    TRAIN_TEMPORAL_WPT = 8
    # Loss-log interval in steps (0 = auto: max(10, steps/60)). Each logged
    # loss is a host sync — costly through relay-tunneled PJRT, so headless
    # sweeps set this to STEPS_PER_EPOCH (one sync per epoch).
    TRAIN_LOG_EVERY = 0
    # Matmul precision for eval ("default" | "high" | "highest"): TPU
    # "default" runs f32 dots as 1-pass bf16 (~0.8% relative output drift —
    # throughput mode); "high" = bf16x3 (~1e-5 relative, holds the 0.1 mm
    # MPJPE parity bar, the default); "highest" = full f32.
    EVAL_MATMUL_PRECISION = "high"
    # Eval compute path ("auto" | "full" | "spatial" | "none"): "full" runs
    # the fused Pallas spatial+temporal+strided kernels (the benchmark
    # configuration); "auto" picks "full" on accelerators, XLA on CPU.
    EVAL_FUSED = "auto"
    # Window-sparse strided eval: run the model only on keyframe-centered
    # windows (index % keyframe_stride == 0); all other windows' predictions
    # are interpolation-only in the strided protocol (reference
    # eval.py:209-222) so metrics are identical while ~1/stride of the
    # windows are computed. False = reference-style dense evaluation.
    EVAL_SKIP_INTERPOLATED_WINDOWS = True
    # Cross-window shared spatial stage for the window-sparse eval:
    # consecutive computed windows overlap in N-1 of their N frames (centers
    # and tokens both advance by SEQUENCE_STRIDE), and the spatial stage +
    # s2t Dense are frame-independent — so per-frame features are computed once
    # per unique masked frame (host dedup) and gathered into windows.
    # Bit-identical per frame (tests/test_bench_forward.py). "auto" enables
    # it whenever the window-sparse protocol is active and the fused eval
    # path runs; True forces it (incl. the XLA path); False disables.
    EVAL_SHARED_SPATIAL = "auto"
    # Static unique-frame capacity of the shared-spatial step, as extra rows
    # over the batch size (a contiguous run of B windows has B + N - 1
    # uniques; each extra sequence restart inside a batch adds ≤ N - 1).
    # Batches exceeding the capacity fall back to the dense step.
    EVAL_SHARED_UMAX_EXTRA = 1024
    # Batched flip-TTA: run the flipped test-time-augmentation pass inside
    # the SAME forward as the unflipped one (one concatenated 2B-window /
    # 2U-unique-frame batch) instead of a second full forward. Exact to
    # reassociation (tests/test_parallel.py::test_tta_batched_matches_two_call)
    # and measured throughput-neutral (TTA is pure incremental compute,
    # PERF_NOTES round-6) — kept on because one compiled graph halves the
    # eval compile count and per-step dispatches. NOTE: doubles the
    # per-forward activation footprint at unchanged BATCH_SIZE; on
    # memory-tight devices set False (two-call path) or halve BATCH_SIZE.
    EVAL_TTA_BATCHED = True
    # Pack the shared-spatial step's three per-flush host→device transfers
    # (unique frames f32, window indices i32, stride masks bool) into ONE
    # flat f32 upload, split/cast inside the jitted step. Exact: indices are
    # < 2^24 (f32-representable), masks are 0/1. Motivation: through the
    # PJRT relay each upload RPC has a large fixed cost — the round-9
    # full-scale attribution measured upload_dispatch ≈ 1.79 s/flush ≈ the
    # whole host budget; on direct-attached hosts this is one DMA instead
    # of three (harmless). Single-device path only (a mesh eval keeps
    # per-array shardings).
    EVAL_PACKED_UPLOAD = True
    # Device-resident train feed ("auto" | bool): upload the concatenated
    # pose store(s) to the device once and materialize window batches inside
    # the jitted train step from per-row plans (gather indices + masks +
    # flip flags, ~0.2 MB/step vs ~45 MB of materialized windows).
    # Bit-identical to the host feed (same epoch planner and RNG streams;
    # tests/test_device_feed.py). "auto" = on for accelerator runs; under
    # multi-host each process uploads the full store (replicated) and plans
    # only its host's batch rows (tests/test_multihost.py worker).
    TRAIN_DEVICE_FEED = "auto"
    # Temporal-kernel windows per grid tile for EVAL ("auto" | int). The
    # kernel lays wpt windows of s_pad = ceil(N/8)*8 padded frames on the
    # lane axis (R = wpt*s_pad); "auto" picks 8 when that makes R a multiple
    # of the 128-lane register width while wpt=4 does not (h36m_81: s_pad=48,
    # R=384 — measured +10% over wpt=4), else the flagship-optimal 4
    # (h36m_351: s_pad=72, neither aligns; wpt sweep in PERF_NOTES.md).
    EVAL_TEMPORAL_WPT = "auto"
    # Data-parallel devices to use (-1: all visible devices).
    DATA_PARALLEL_DEVICES = -1
