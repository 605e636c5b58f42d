"""Checkpoint conversion CLI: Keras-legacy `.h5` ↔ Orbax / npz.

    python tools/convert_weights.py --config h36m_351 \
        --input models/h36m_351.h5 --output out/h36m_351.npz
    python tools/convert_weights.py --config h36m_351 \
        --input out/h36m_351.npz --output out/h36m_351.h5

Formats are inferred from extensions (.h5 / .npz). npz stores the flattened
params pytree keyed by '/'-joined paths.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uplift_upsample_tpu.configs import resolve_config  # noqa: E402
from uplift_upsample_tpu.models import build_uplift_upsample_transformer  # noqa: E402
from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5, save_keras_h5  # noqa: E402


def flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}{key}"
        if isinstance(value, dict):
            out.update(flatten(value, path + "/"))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="bundled name or JSON path")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    config = resolve_config(args.config)
    model = build_uplift_upsample_transformer(config)

    in_ext = os.path.splitext(args.input)[1]
    out_ext = os.path.splitext(args.output)[1]

    if in_ext == ".h5":
        variables = load_keras_h5(args.input, model)
    elif in_ext == ".npz":
        data = dict(np.load(args.input))
        variables = {"params": unflatten({k.split("||", 1)[1]: v for k, v in data.items()
                                          if k.startswith("params||")})}
        bs = {k.split("||", 1)[1]: v for k, v in data.items() if k.startswith("batch_stats||")}
        if bs:
            variables["batch_stats"] = unflatten(bs)
    else:
        raise ValueError(f"Unsupported input format {in_ext}")

    if out_ext == ".h5":
        save_keras_h5(args.output, variables, model)
    elif out_ext == ".npz":
        flat = {f"params||{k}": v for k, v in flatten(variables["params"]).items()}
        for k, v in flatten(variables.get("batch_stats", {})).items():
            flat[f"batch_stats||{k}"] = v
        np.savez(args.output, **flat)
    else:
        raise ValueError(f"Unsupported output format {out_ext}")

    n = sum(v.size for v in flatten(variables["params"]).values())
    print(f"converted {args.input} -> {args.output} ({n:,} params)")


if __name__ == "__main__":
    main()
