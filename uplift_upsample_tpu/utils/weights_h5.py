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

import dataclasses
from typing import Dict, List, Optional, Tuple

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


@dataclasses.dataclass
class WeightLoadReport:
    """Name-based loading diagnostics (reference `weight_io.py:240-263`).

    `unconsumed_*`: present in the .h5 file but not loaded into the model;
    `unassigned_*`: expected by the model but not found in the file;
    `mismatched`: (flax path, file shape, model shape) skipped shape clashes.
    """

    assigned: List[str] = dataclasses.field(default_factory=list)
    unconsumed_layers: List[str] = dataclasses.field(default_factory=list)
    unassigned_layers: List[str] = dataclasses.field(default_factory=list)
    unconsumed_weights: List[Tuple[str, tuple]] = dataclasses.field(default_factory=list)
    unassigned_weights: List[Tuple[str, tuple]] = dataclasses.field(default_factory=list)
    mismatched: List[Tuple[str, tuple, tuple]] = dataclasses.field(default_factory=list)

    @property
    def fully_matched(self) -> bool:
        return not (self.unconsumed_layers or self.unassigned_layers
                    or self.unconsumed_weights or self.unassigned_weights
                    or self.mismatched)

    def summary(self) -> str:
        lines = []
        if self.unconsumed_layers:
            lines.append("The following layers were not consumed from .h5 file:")
            lines += [f"- {n}" for n in self.unconsumed_layers]
        if self.unassigned_layers:
            lines.append("The following layers were not assigned any weights:")
            lines += [f"- {n}" for n in self.unassigned_layers]
        if self.unconsumed_weights:
            lines.append("The following weights were not consumed from .h5 file:")
            lines += [f"- {n} {s}" for n, s in self.unconsumed_weights]
        if self.unassigned_weights:
            lines.append("The following weights were not assigned any values:")
            lines += [f"- {n} {s}" for n, s in self.unassigned_weights]
        if self.mismatched:
            lines.append("The following weights were skipped (shape mismatch):")
            lines += [f"- {n} file{fs} vs model{ms}" for n, fs, ms in self.mismatched]
        return "\n".join(lines) if lines else "all weights matched"

    def log(self, print_fn=print) -> None:
        if not self.fully_matched:
            print_fn(self.summary())


def _read_group_tree(group, kind: str):
    """One h5 layer group → a flax params subtree (values float32)."""
    if kind in ("pe", "token"):
        names = _decode(group.attrs["weight_names"])
        return np.asarray(group[names[0]], dtype=np.float32)
    sub = _group_weights(group)
    if kind == "dense":
        return _to_float32(_dense(list(sub.values())[0]))
    if kind == "ln":
        return _to_float32(_ln(list(sub.values())[0]))
    if kind == "bn":
        gamma, beta, mean, var = list(sub.values())[0]
        return {"params": _to_float32({"scale": gamma, "bias": beta}),
                "batch_stats": _to_float32({"mean": mean, "var": var})}
    if kind in ("block", "strided_block"):
        return _to_float32(_block_params(group, strided=kind == "strided_block"))
    raise ValueError(f"unknown layer kind {kind!r}")


def _model_layer_plan(model: UpliftUpsampleTransformer):
    """Ordered (flax param key, h5 layer name, kind) for every model layer."""
    plan = []
    if model.spatial_depth > 0:
        plan.append(("keypoint_embedding", "keypoint_embedding", "dense"))
        plan.append(("spatial_pe", "spatial_pe", "pe"))
        for i in range(1, model.spatial_depth + 1):
            plan.append((f"spatial_block_{i}", f"spatial_block_{i}", "block"))
        plan.append(("spatial_norm", "spatial_norm", "ln"))
    plan.append(("temporal_pe", "temporal_pe", "pe"))
    plan.append(("spatial_to_temporal_fc", "spatial_to_temporal_fc", "dense"))
    if model.has_strided_input:
        plan.append(("strided_input_token", "strided_input_token_layer", "token"))
    if model.token_mask_rate > 0 and model.learnable_masked_token:
        plan.append(("masked_token", "learnable_masked_token_layer", "token"))
    for i in range(1, model.temporal_depth + 1):
        plan.append((f"temporal_block_{i}", f"temporal_block_{i}", "block"))
    for i in range(1, len(model.strides) + 1):
        plan.append((f"strided_temporal_pe_{i}", f"strided_temporal_pe_{i}", "pe"))
        plan.append((f"strided_temporal_block_{i}", f"strided_temporal_block_{i}",
                     "strided_block"))
    if model.full_output and model.temporal_depth > 0:
        if model.output_bn:
            plan.append(("temporal_norm", "temporal_norm", "bn"))
        plan.append(("temporal_fc", "temporal_fc", "dense"))
    if model.output_bn:
        plan.append(("strided_temporal_norm", "strided_temporal_norm", "bn"))
    plan.append(("strided_temporal_fc", "strided_temporal_fc", "dense"))
    return plan


def _merge_with_template(loaded, template, path, transform, report,
                         skip_mismatch):
    """Merge a loaded subtree into the template's structure, leaf by leaf."""
    if not isinstance(template, dict):
        tshape = tuple(np.shape(template))
        if isinstance(loaded, dict):
            report.unassigned_weights.append((path, tshape))
            for n, s in _leaf_items(loaded, path):
                report.unconsumed_weights.append((n, s))
            return template
        if tuple(loaded.shape) != tshape:
            if not skip_mismatch:
                raise ValueError(
                    f"Shape mismatch for weight {path}: file has "
                    f"{tuple(loaded.shape)}, model expects {tshape}. "
                    f"Pass skip_mismatch=True to skip it.")
            report.mismatched.append((path, tuple(loaded.shape), tshape))
            return template
        report.assigned.append(path)
        return transform(path, loaded) if transform is not None else loaded
    if not isinstance(loaded, dict):
        report.unconsumed_weights.append((path, tuple(np.shape(loaded))))
        for n, s in _leaf_items(template, path):
            report.unassigned_weights.append((n, s))
        return template
    out = {}
    for k, tv in template.items():
        child = f"{path}/{k}" if path else k
        if k in loaded:
            out[k] = _merge_with_template(loaded[k], tv, child, transform,
                                          report, skip_mismatch)
        else:
            out[k] = tv
            for n, s in _leaf_items(tv, child):
                report.unassigned_weights.append((n, s))
    for k, lv in loaded.items():
        if k not in template:
            for n, s in _leaf_items(lv, f"{path}/{k}" if path else k):
                report.unconsumed_weights.append((n, s))
    return out


def _leaf_items(tree, prefix):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_items(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tuple(np.shape(tree))


def load_keras_h5_by_name(path: str, model: UpliftUpsampleTransformer,
                          template: Optional[Dict] = None, transform=None,
                          skip_mismatch: bool = False,
                          verbose: bool = True) -> Tuple[Dict, WeightLoadReport]:
    """Name-based partial loading of a reference-format `.h5` checkpoint.

    The counterpart of the reference's `load_weights_with_callback`
    (`weight_io.py:76-263`): layers are matched by *name*; layers present in
    the file but not in the model (and vice versa) are tolerated and reported,
    as are individual missing/extra weights inside a matched layer. Shape
    clashes raise unless `skip_mismatch=True` (then they are skipped and
    reported) — Keras `load_weights_from_hdf5_group_by_name` semantics.

    `template`: flax variables dict (e.g. from `init_model_params`) providing
    the expected structure and the fallback values for unassigned weights.
    Without a template the load is structural-strict (every expected layer
    must parse), matching `load_keras_h5`.

    `transform(path, value) -> value` is applied per weight at load time
    (reference `KerasWeightLoadingCallback`, `weight_io.py:54-73`).

    Returns `(variables, report)`.
    """
    import h5py

    report = WeightLoadReport()
    plan = _model_layer_plan(model)
    loaded: Dict[str, object] = {}  # flax key → subtree (bn: both collections)
    with h5py.File(path, "r") as f:
        if "layer_names" not in f.attrs and "model_weights" in f:
            f = f["model_weights"]
        file_layers = _decode(f.attrs["layer_names"])
        groups = {name: f[name] for name in file_layers}
        consumed = {name: False for name in file_layers}

        for flax_key, layer_name, kind in plan:
            if layer_name not in groups:
                report.unassigned_layers.append(layer_name)
                continue
            try:
                loaded[flax_key] = _read_group_tree(groups[layer_name], kind)
            except Exception as e:  # malformed group → a mismatch, not a crash
                if not skip_mismatch:
                    raise ValueError(
                        f"Layer {layer_name!r} in {path} could not be parsed "
                        f"as kind {kind!r}: {e}. Pass skip_mismatch=True to "
                        f"skip it.") from e
                report.mismatched.append((layer_name, (), ()))
                continue
            consumed[layer_name] = True
        report.unconsumed_layers = [n for n, c in consumed.items() if not c]

    params_loaded = {k: (v["params"] if isinstance(v, dict) and "params" in v
                         and "batch_stats" in v else v)
                     for k, v in loaded.items()}
    bn_loaded = {k: v["batch_stats"] for k, v in loaded.items()
                 if isinstance(v, dict) and "batch_stats" in v}

    if template is None:
        # Structural-strict: everything in the plan must have loaded.
        missing = [ln for _, ln, _ in plan
                   if ln in report.unassigned_layers]
        if missing:
            raise KeyError(
                f"{path} is missing layers required by the model: {missing}. "
                f"Use load_keras_h5_by_name(..., template=init vars) for "
                f"partial loading.\n{report.summary()}")
        if transform is not None:
            params_loaded = _apply_transform(params_loaded, transform, "")
        report.assigned = [n for n, _ in _leaf_items(params_loaded, "")]
        variables = {"params": params_loaded}
        if bn_loaded:
            variables["batch_stats"] = bn_loaded
        if verbose:
            report.log()
        return variables, report

    tpl_params = template["params"] if "params" in template else template
    tpl_bn = template.get("batch_stats", {}) if "params" in template else {}
    params = _merge_with_template(params_loaded, tpl_params, "", transform,
                                  report, skip_mismatch)
    variables = {"params": params}
    if tpl_bn or bn_loaded:
        bn_report = WeightLoadReport()  # stats follow their params' fate
        variables["batch_stats"] = _merge_with_template(
            bn_loaded, tpl_bn, "", None, bn_report, skip_mismatch)
        report.mismatched += bn_report.mismatched
    if verbose:
        report.log()
    return variables, report


def load_keras_h5(path: str, model: UpliftUpsampleTransformer,
                  transform=None, validate: bool = True) -> Dict:
    """Strict read of a reference-format `.h5` checkpoint into flax variables.

    Returns `{"params": ..., "batch_stats": ...}` (batch_stats only when the
    model has output BatchNorm heads). Every layer the model expects must be
    present; a mismatch raises with the full diagnostic report (for tolerant
    partial loading use `load_keras_h5_by_name`).

    `transform(path, value) -> value` is an optional per-weight hook applied
    to every loaded array, keyed by its flax path string — the counterpart of
    the reference's KerasWeightLoadingCallback (`weight_io.py:54-73`).

    `validate` compares every loaded weight's shape against the model's
    expected init shapes (`jax.eval_shape` — no FLOPs). Without it, shapes
    come from the FILE, so a checkpoint from a different geometry (e.g.
    71-frame h36m_351 weights into a 27-frame default-config model) loads
    silently and fails much later with an obscure broadcast error inside the
    forward. The reference fails at load time instead (`weight_io.py`
    shape checks) — match that with an actionable error.
    """
    variables, _ = load_keras_h5_by_name(path, model, template=None,
                                         transform=transform, verbose=False)
    if validate:
        _validate_geometry(variables, model, path)
    return variables


def _validate_geometry(variables: Dict, model: UpliftUpsampleTransformer,
                       path: str) -> None:
    import jax

    from ..models.build import init_model_params

    try:
        expected = jax.eval_shape(lambda: init_model_params(model, seed=0))
    except Exception as e:
        raise ValueError(
            f"{path}: cannot validate the checkpoint against this model — "
            f"initializing the configured model fails "
            f"({type(e).__name__}: {e}). The active config does not describe "
            f"a buildable model; pass the config the checkpoint was trained "
            f"with (e.g. --config h36m_351).") from e
    mismatches = []

    def walk(loaded, exp, prefix):
        if isinstance(exp, dict):
            for k, v in exp.items():
                if isinstance(loaded, dict) and k in loaded:
                    walk(loaded[k], v, f"{prefix}{k}/")
            return
        if loaded is None:
            return
        ls, es = tuple(np.shape(loaded)), tuple(exp.shape)
        if ls != es:
            mismatches.append((prefix.rstrip("/"), ls, es))

    for coll in ("params", "batch_stats"):
        if coll in variables and coll in expected:
            walk(variables[coll], expected[coll], f"{coll}/")
    if mismatches:
        lines = "\n".join(f"- {n}: file {fs} vs model {ms}"
                          for n, fs, ms in mismatches[:20])
        raise ValueError(
            f"{path} does not match the model geometry "
            f"({len(mismatches)} weight shape clash(es)):\n{lines}\n"
            f"The checkpoint was trained with a different configuration — "
            f"pass the matching --config (e.g. h36m_351 for 71-frame "
            f"released weights).")


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
