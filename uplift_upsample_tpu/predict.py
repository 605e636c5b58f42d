"""Inference CLI: 2D keypoint sequences → 3D pose sequences.

Takes normalized 2D keypoints ((T, 17, 2), VideoPose3D 17-point order or the
canonical order) and produces per-frame 3D poses using the eval protocol:
sliding windows at SEQUENCE_STRIDE, central-frame predictions at keyframes,
linear interpolation in between, optional flip-TTA.

    python -m uplift_upsample_tpu.predict --weights w.h5 --config h36m_351 \
        --input keypoints_2d.npz --output poses_3d.npz [--input_order vp3d]

Input npz: either a raw (T, 17, 2) array under 'positions_2d' (single
sequence) or a dict {name: (T, 17, 2)}.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax.numpy as jnp

from .config import UpliftUpsampleConfig
from .configs import resolve_config
from .data.generator import H36mSequenceGenerator
from .data.keypoint_order import H36MOrder17POriginalOrder
from .eval import make_test_step
from .models import build_uplift_upsample_transformer
from .utils.eval_protocol import interpolate_between_keyframes
from .utils.weights_h5 import load_keras_h5


def make_predict_step(model, variables, config: UpliftUpsampleConfig,
                      flip_tta: bool = True):
    """ONE compiled step for all sequences of a run (building it inside
    predict_sequence retraced per sequence). On TPU the fused eval pipeline
    (Pallas spatial + merged temporal/strided kernels at the parity rung)
    serves prediction too; elsewhere the XLA path (interpret-mode Pallas
    would crawl)."""
    from .utils.backend import is_tpu_backend

    fused = None
    if (is_tpu_backend() and model.spatial_depth > 0
            and model.temporal_depth > 0):
        fused = "full"
    return make_test_step(
        model, variables, flip_tta=flip_tta,
        flip_lr_indices=config.AUGM_FLIP_KEYPOINT_ORDER,
        fused=fused,
        precision=(getattr(config, "EVAL_MATMUL_PRECISION", "high") or "high"
                   if fused else None),
        fused_spatial=bool(getattr(config, "USE_PALLAS_SPATIAL", False)))


def predict_sequence(model, variables, config: UpliftUpsampleConfig,
                     keypoints_2d: np.ndarray, flip_tta: bool = True,
                     step=None) -> np.ndarray:
    """(T, K, 2) normalized 2D → (T, K, 3) root-relative 3D (meters).

    Window-sparse (round-9): when the strided protocol interpolates between
    keyframes (SEQUENCE_STRIDE > 1 + TEST_STRIDED_EVAL — the reference
    protocol of eval.py:209-222 / action_wise_eval.py:76-100), non-keyframe
    windows' predictions are completely overwritten by
    `interpolate_between_keyframes` (a pure function of the keyframe rows,
    and frame 0 is always a keyframe here), so only every stride-th window
    is computed — identical output, 1/stride of the compute. Batches are
    edge-padded to the static BATCH_SIZE (one compiled shape instead of a
    recompile per distinct tail size).
    """
    t, k, _ = keypoints_2d.shape
    dummy_3d = np.zeros((t, k, 3), dtype=np.float32)
    generator = H36mSequenceGenerator(
        [dummy_3d], [keypoints_2d.astype(np.float32)],
        camera_params=[np.zeros(11, np.float32)], subjects=[0], actions=[0],
        frame_rates=[50], split="predict", seq_len=config.SEQUENCE_LENGTH,
        subsample=1, stride=config.SEQUENCE_STRIDE, padding_type=config.PADDING_TYPE,
        mask_stride=config.MASK_STRIDE, stride_mask_align_global=True,
        rand_shift_stride_mask=False, flip_augment=False, shuffle=False,
        verbose=False)

    if step is None:
        step = make_predict_step(model, variables, config, flip_tta=flip_tta)

    # Materialize the window rows through the vectorized batcher (native
    # gather core; bit-identical to the per-item generator, central-only 3D
    # since the dummy 3D is never read) — the per-item python loop was the
    # host bottleneck at serving scale.
    from .data.fast_batcher import FastH36mBatcher

    n_rows = len(generator)
    fast = FastH36mBatcher(generator, batch_size=min(n_rows, 512),
                           central_3d_only=True)
    parts_2d, parts_sm, parts_idx = [], [], []
    have = 0
    for batch in fast.batches():
        _, seq2d_b, _, _, _, _, centers_b, sm_b = batch
        take = min(len(seq2d_b), n_rows - have)
        parts_2d.append(seq2d_b[:take])
        parts_sm.append(sm_b[:take])
        parts_idx.append(np.asarray(centers_b[:take]))
        have += take
        if have >= n_rows:
            break
    rows_2d = np.concatenate(parts_2d, axis=0)
    rows_sm = np.concatenate(parts_sm, axis=0)
    indices = np.concatenate(parts_idx, axis=0)

    interp = config.SEQUENCE_STRIDE > 1 and config.TEST_STRIDED_EVAL
    compute = (np.flatnonzero(indices % config.SEQUENCE_STRIDE == 0)
               if interp else np.arange(n_rows))

    pred = np.zeros((n_rows, k, 3), np.float64)
    bs = int(config.BATCH_SIZE)
    device_parts = []
    for lo in range(0, len(compute), bs):
        sel = compute[lo: lo + bs]
        x = rows_2d[sel]
        sm = rows_sm[sel]
        if len(sel) < bs:  # pad the tail to the one compiled shape
            rep = (0, bs - len(sel))
            x = np.pad(x, (rep, (0, 0), (0, 0), (0, 0)), mode="edge")
            sm = np.pad(sm, (rep, (0, 0)), mode="edge")
        _, central = step(jnp.asarray(x), jnp.asarray(sm))
        device_parts.append((central, sel))
    if device_parts:
        # one device→host transfer for the whole sequence
        all_central = np.asarray(jnp.concatenate(
            [c for c, _ in device_parts], axis=0))
        for i, (_, sel) in enumerate(device_parts):
            pred[sel] = all_central[i * bs: i * bs + len(sel)].astype(
                np.float64)

    if interp:
        strides = np.full(n_rows, config.SEQUENCE_STRIDE)
        pred, _ = interpolate_between_keyframes(pred, indices, strides)
    return pred.astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(description="2D→3D pose inference")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--config", required=False, default="h36m_351")
    parser.add_argument("--input", required=True, help="npz with 'positions_2d'")
    parser.add_argument("--output", required=True)
    parser.add_argument("--input_order", choices=["ours", "vp3d"], default="ours")
    parser.add_argument("--forced_mask_stride", type=int, default=None)
    parser.add_argument("--no_flip_tta", dest="flip_tta", action="store_false")
    parser.set_defaults(flip_tta=True)
    args = parser.parse_args(argv)

    config = resolve_config(args.config)
    if args.forced_mask_stride is not None:
        config.MASK_STRIDE = args.forced_mask_stride
    elif isinstance(config.MASK_STRIDE, list):
        config.MASK_STRIDE = config.MASK_STRIDE[0]

    model = build_uplift_upsample_transformer(config)
    variables = load_keras_h5(args.weights, model)
    # ONE compiled step shared by every sequence of the run
    step = make_predict_step(model, variables, config, flip_tta=args.flip_tta)

    data = np.load(args.input, allow_pickle=True)
    raw = data["positions_2d"]
    sequences = raw.item() if raw.dtype == object and raw.shape == () else {"sequence": raw}

    out = {}
    for name, kps in sequences.items():
        kps = np.asarray(kps, dtype=np.float32)
        assert kps.ndim == 3 and kps.shape[1:] == (17, 2), kps.shape
        if args.input_order == "vp3d":
            kps = kps[:, H36MOrder17POriginalOrder.to_our_17p_order()]
        out[name] = predict_sequence(model, variables, config, kps,
                                     flip_tta=args.flip_tta, step=step)
        print(f"{name}: {kps.shape[0]} frames -> 3D {out[name].shape}")
        sys.stdout.flush()

    np.savez_compressed(args.output, **out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
