"""Scalar logging: JSONL always; TensorBoard event files when available.

The reference logs train/val scalars to TensorBoard (`train.py:585-590,
679-687`). Here every scalar goes to `<out_dir>/scalars.jsonl` (one JSON per
line: {tag, value, step}), and mirrored to TensorBoard via tf.summary when
TensorFlow is importable (optional, off the hot path).
"""

from __future__ import annotations

import json
import os


class ScalarLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = False, run_name: str = "tb"):
        os.makedirs(out_dir, exist_ok=True)
        self._file = open(os.path.join(out_dir, "scalars.jsonl"), "a", buffering=1)
        self._tb_writer = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf
                self._tb_writer = tf.summary.create_file_writer(
                    os.path.join(out_dir, run_name))
            except ImportError:
                print("TensorBoard logging requested but tensorflow not available")

    def scalar(self, tag: str, value, step: int):
        self._file.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb_writer is not None:
            with self._tb_writer.as_default():
                self._tb.summary.scalar(tag, float(value), step=step)

    def close(self):
        self._file.close()
        if self._tb_writer is not None:
            self._tb_writer.close()
