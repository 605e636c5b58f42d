"""Parameter partition rules for tensor parallelism.

The flagship layout is pure data parallelism (params replicated), but the
attention/MLP widths shard cleanly for tensor-parallel execution over an
"mp" mesh axis: q/k/v projections and MLP fc1 split on the output (head /
hidden) dim, proj and fc2 split on the input dim — the classic Megatron
pairing, so XLA inserts a single all-reduce per branch.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: str, leaf, tp_axis: str = "mp") -> P:
    """PartitionSpec for one parameter, keyed on its flax path."""
    if "attn" in path:
        if path.endswith("wq/kernel") or path.endswith("wk/kernel") or path.endswith("wv/kernel"):
            return P(None, tp_axis)
        if path.endswith("wq/bias") or path.endswith("wk/bias") or path.endswith("wv/bias"):
            return P(tp_axis)
        if path.endswith("proj/kernel"):
            return P(tp_axis, None)
        return P()
    if "mlp" in path:
        if path.endswith("fc1/kernel"):
            return P(None, tp_axis)
        if path.endswith("fc1/bias"):
            return P(tp_axis)
        if path.endswith("fc2/kernel"):
            # Dense (in, out) or temporal Conv1D (kw, in, out): shard the input dim
            return P(None, tp_axis, None) if leaf.ndim == 3 else P(tp_axis, None)
        return P()
    return P()


def tp_param_shardings(params, mesh: Mesh, tp_axis: str = "mp"):
    """Pytree of NamedShardings implementing tensor parallelism over `tp_axis`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    specs = {path_str(kp): param_spec(path_str(kp), leaf, tp_axis) for kp, leaf in flat}

    def shard(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(shard, params)


def shard_params_tp(params, mesh: Mesh, tp_axis: str = "mp"):
    """device_put params with tensor-parallel shardings."""
    shardings = tp_param_shardings(params, mesh, tp_axis)
    return jax.tree.map(jax.device_put, params, shardings)
