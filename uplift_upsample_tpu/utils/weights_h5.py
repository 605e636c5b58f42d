"""Keras-legacy `.h5` ↔ flax params conversion.

The released reference checkpoints are Keras "save_weights" HDF5 files:
a `layer_names` attribute lists top-level layer groups; each group's
`weight_names` attribute lists datasets in variable-creation order
(reference `weight_io.py:125-263` documents the loader).

Layout facts (verified against files produced by the reference model):
  keypoint_embedding            kernel, bias
  spatial_pe / temporal_pe /
  strided_temporal_pe_i         positional_encoding_weights
  strided_input_token_layer     learnable_masked_token
  learnable_masked_token_layer  learnable_masked_token        (optional)
  spatial_block_i /             ln1(γ,β), wq(k[,b]), wk, wv, proj(k,b),
  temporal_block_i              ln2(γ,β), fc1(k,b), fc2(k,b)
  strided_temporal_block_i      same, but fc1 = Conv1D(k=1), fc2 = Conv1D(k=3)
  spatial_norm                  γ, β
  spatial_to_temporal_fc /
  temporal_fc /
  strided_temporal_fc           kernel, bias
  temporal_norm /
  strided_temporal_norm         BatchNorm γ, β, moving_mean, moving_variance

Keras Dense kernels are (in, out) and Conv1D kernels (kw, in, out) — both
identical to flax's layout, so conversion is pure renaming (plus squeezing the
pointwise-conv kernel into a Dense kernel).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..models.uplift_upsample import UpliftUpsampleTransformer


def _decode(names) -> List[str]:
    return [n.decode("utf8") if isinstance(n, bytes) else n for n in names]


def _group_weights(h5_group) -> Dict[str, List[np.ndarray]]:
    """Split a layer group's weights by sublayer path, preserving order."""
    by_sublayer: Dict[str, List[np.ndarray]] = {}
    for wname in _decode(h5_group.attrs["weight_names"]):
        parts = wname.split("/")
        sublayer = parts[-2] if len(parts) >= 2 else ""
        by_sublayer.setdefault(sublayer, []).append(np.asarray(h5_group[wname]))
    return by_sublayer


def _dense(values: List[np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": values[0]}
    if len(values) > 1:
        out["bias"] = values[1]
    return out


def _ln(values: List[np.ndarray]) -> Dict[str, np.ndarray]:
    return {"scale": values[0], "bias": values[1]}


def _block_params(h5_group, strided: bool) -> Dict[str, Dict]:
    """Transformer block group → flax block params via ordered sublayers."""
    sublayers = list(_group_weights(h5_group).values())
    assert len(sublayers) == 8, f"expected 8 sublayers in block, got {len(sublayers)}"
    ln1, wq, wk, wv, proj, ln2, fc1, fc2 = sublayers
    if strided:
        # pointwise conv (1, in, hidden) → dense (in, hidden)
        fc1 = [fc1[0][0], *fc1[1:]]
    return {
        "norm1": _ln(ln1),
        "attn": {"wq": _dense(wq), "wk": _dense(wk), "wv": _dense(wv), "proj": _dense(proj)},
        "norm2": _ln(ln2),
        "mlp": {"fc1": _dense(fc1), "fc2": _dense(fc2)},
    }


def load_keras_h5(path: str, model: UpliftUpsampleTransformer,
                  transform=None) -> Dict:
    """Read a reference-format `.h5` checkpoint into flax variables.

    Returns `{"params": ..., "batch_stats": ...}` (batch_stats only when the
    model has output BatchNorm heads).

    `transform(path, value) -> value` is an optional per-weight hook applied
    to every loaded array, keyed by its flax path string — the counterpart of
    the reference's KerasWeightLoadingCallback (`weight_io.py:54-73`).
    """
    import h5py

    params: Dict = {}
    batch_stats: Dict = {}
    with h5py.File(path, "r") as f:
        if "layer_names" not in f.attrs and "model_weights" in f:
            f = f["model_weights"]
        groups = {name: f[name] for name in _decode(f.attrs["layer_names"])}

        def single(name):
            g = groups[name]
            return np.asarray(g[_decode(g.attrs["weight_names"])[0]])

        if model.spatial_depth > 0:
            params["keypoint_embedding"] = _dense(
                list(_group_weights(groups["keypoint_embedding"]).values())[0])
            params["spatial_pe"] = single("spatial_pe")
            for i in range(1, model.spatial_depth + 1):
                params[f"spatial_block_{i}"] = _block_params(
                    groups[f"spatial_block_{i}"], strided=False)
            params["spatial_norm"] = _ln(
                list(_group_weights(groups["spatial_norm"]).values())[0])

        params["temporal_pe"] = single("temporal_pe")
        params["spatial_to_temporal_fc"] = _dense(
            list(_group_weights(groups["spatial_to_temporal_fc"]).values())[0])

        if model.has_strided_input:
            params["strided_input_token"] = single("strided_input_token_layer")
        if model.token_mask_rate > 0 and model.learnable_masked_token:
            params["masked_token"] = single("learnable_masked_token_layer")

        for i in range(1, model.temporal_depth + 1):
            params[f"temporal_block_{i}"] = _block_params(
                groups[f"temporal_block_{i}"], strided=False)

        for i in range(1, len(model.strides) + 1):
            params[f"strided_temporal_pe_{i}"] = single(f"strided_temporal_pe_{i}")
            params[f"strided_temporal_block_{i}"] = _block_params(
                groups[f"strided_temporal_block_{i}"], strided=True)

        def read_bn(name):
            values = list(_group_weights(groups[name]).values())[0]
            gamma, beta, mean, var = values
            params[name] = {"scale": gamma, "bias": beta}
            batch_stats[name] = {"mean": mean, "var": var}

        if model.full_output and model.temporal_depth > 0:
            if model.output_bn:
                read_bn("temporal_norm")
            params["temporal_fc"] = _dense(
                list(_group_weights(groups["temporal_fc"]).values())[0])
        if model.output_bn:
            read_bn("strided_temporal_norm")
        params["strided_temporal_fc"] = _dense(
            list(_group_weights(groups["strided_temporal_fc"]).values())[0])

    params = _to_float32(params)
    if transform is not None:
        params = _apply_transform(params, transform, "")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = _to_float32(batch_stats)
    return variables


def _apply_transform(tree, transform, prefix):
    if isinstance(tree, dict):
        return {k: _apply_transform(v, transform, f"{prefix}{k}/") for k, v in tree.items()}
    return transform(prefix.rstrip("/"), tree)


def _to_float32(tree):
    if isinstance(tree, dict):
        return {k: _to_float32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)


# ---------------------------------------------------------------------------
# Export: flax params → Keras-legacy h5 (loadable by the reference tooling)
# ---------------------------------------------------------------------------

class _KerasNamer:
    """Reproduces Keras' global auto-naming counters (dense, dense_1, ...)."""

    def __init__(self):
        self.counts: Dict[str, int] = {}

    def __call__(self, base: str) -> str:
        n = self.counts.get(base, 0)
        self.counts[base] = n + 1
        return base if n == 0 else f"{base}_{n}"


def save_keras_h5(path: str, variables: Dict, model: UpliftUpsampleTransformer,
                  model_scope: str = "uplift_upsample_transformer") -> None:
    """Write flax variables as a Keras-legacy `.h5` weight file."""
    import h5py

    params = variables["params"] if "params" in variables else variables
    batch_stats = variables.get("batch_stats", {})
    namer = _KerasNamer()
    layers: List = []  # (layer_name, [(weight_name, array), ...])

    def dense_entries(scope, p):
        name = namer("dense") if "conv" not in scope else None
        entries = [(f"{scope}/kernel:0", p["kernel"])]
        if "bias" in p:
            entries.append((f"{scope}/bias:0", p["bias"]))
        return entries

    def add_fc(layer_name, p):
        layers.append((layer_name, [
            (f"{model_scope}/{layer_name}/kernel:0", np.asarray(p["kernel"])),
            (f"{model_scope}/{layer_name}/bias:0", np.asarray(p["bias"])),
        ]))

    def add_pe(layer_name, arr):
        layers.append((layer_name, [
            (f"{layer_name}/positional_encoding_weights:0", np.asarray(arr))]))

    def add_token(layer_name, arr):
        layers.append((layer_name, [
            (f"{layer_name}/learnable_masked_token:0", np.asarray(arr))]))

    def add_block(layer_name, p, strided):
        entries = []
        scope = f"{model_scope}/{layer_name}"
        mha_name = namer("mha")
        ln1 = namer("layer_normalization")
        entries += [(f"{scope}/{ln1}/gamma:0", p["norm1"]["scale"]),
                    (f"{scope}/{ln1}/beta:0", p["norm1"]["bias"])]
        for w in ("wq", "wk", "wv", "proj"):
            d = namer("dense")
            sub = p["attn"][w]
            entries.append((f"{scope}/{mha_name}/{d}/kernel:0", sub["kernel"]))
            if "bias" in sub:
                entries.append((f"{scope}/{mha_name}/{d}/bias:0", sub["bias"]))
        ln2 = namer("layer_normalization")
        entries += [(f"{scope}/{ln2}/gamma:0", p["norm2"]["scale"]),
                    (f"{scope}/{ln2}/beta:0", p["norm2"]["bias"])]
        mlp_name = namer("strided_mlp") if strided else namer("mlp")
        if strided:
            c1, c2 = namer("conv1d"), namer("conv1d")
            fc1_kernel = np.asarray(p["mlp"]["fc1"]["kernel"])[None]  # (in,h) → (1,in,h)
            entries += [(f"{scope}/{mlp_name}/{c1}/kernel:0", fc1_kernel),
                        (f"{scope}/{mlp_name}/{c1}/bias:0", p["mlp"]["fc1"]["bias"]),
                        (f"{scope}/{mlp_name}/{c2}/kernel:0", p["mlp"]["fc2"]["kernel"]),
                        (f"{scope}/{mlp_name}/{c2}/bias:0", p["mlp"]["fc2"]["bias"])]
        else:
            d1, d2 = namer("dense"), namer("dense")
            entries += [(f"{scope}/{mlp_name}/{d1}/kernel:0", p["mlp"]["fc1"]["kernel"]),
                        (f"{scope}/{mlp_name}/{d1}/bias:0", p["mlp"]["fc1"]["bias"]),
                        (f"{scope}/{mlp_name}/{d2}/kernel:0", p["mlp"]["fc2"]["kernel"]),
                        (f"{scope}/{mlp_name}/{d2}/bias:0", p["mlp"]["fc2"]["bias"])]
        layers.append((layer_name, entries))

    def add_bn(layer_name):
        p, bs = params[layer_name], batch_stats[layer_name]
        scope = f"{model_scope}/{layer_name}"
        layers.append((layer_name, [
            (f"{scope}/gamma:0", p["scale"]),
            (f"{scope}/beta:0", p["bias"]),
            (f"{scope}/moving_mean:0", bs["mean"]),
            (f"{scope}/moving_variance:0", bs["var"]),
        ]))

    if model.spatial_depth > 0:
        add_fc("keypoint_embedding", params["keypoint_embedding"])
        add_pe("spatial_pe", params["spatial_pe"])
    add_pe("temporal_pe", params["temporal_pe"])
    for i in range(1, len(model.strides) + 1):
        add_pe(f"strided_temporal_pe_{i}", params[f"strided_temporal_pe_{i}"])
    if model.token_mask_rate > 0 and model.learnable_masked_token:
        add_token("learnable_masked_token_layer", params["masked_token"])
    if model.has_strided_input:
        add_token("strided_input_token_layer", params["strided_input_token"])
    for i in range(1, model.spatial_depth + 1):
        add_block(f"spatial_block_{i}", params[f"spatial_block_{i}"], strided=False)
    if model.spatial_depth > 0:
        layers.append(("spatial_norm", [
            (f"{model_scope}/spatial_norm/gamma:0", params["spatial_norm"]["scale"]),
            (f"{model_scope}/spatial_norm/beta:0", params["spatial_norm"]["bias"])]))
    add_fc("spatial_to_temporal_fc", params["spatial_to_temporal_fc"])
    for i in range(1, model.temporal_depth + 1):
        add_block(f"temporal_block_{i}", params[f"temporal_block_{i}"], strided=False)
    for i in range(1, len(model.strides) + 1):
        add_block(f"strided_temporal_block_{i}", params[f"strided_temporal_block_{i}"],
                  strided=True)
    if model.full_output and model.temporal_depth > 0:
        if model.output_bn:
            add_bn("temporal_norm")
        add_fc("temporal_fc", params["temporal_fc"])
    if model.output_bn:
        add_bn("strided_temporal_norm")
    add_fc("strided_temporal_fc", params["strided_temporal_fc"])

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [name.encode("utf8") for name, _ in layers]
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.4.0"
        for layer_name, entries in layers:
            g = f.create_group(layer_name)
            g.attrs["weight_names"] = [w.encode("utf8") for w, _ in entries]
            for wname, arr in entries:
                g.create_dataset(wname, data=np.asarray(arr, dtype=np.float32))
