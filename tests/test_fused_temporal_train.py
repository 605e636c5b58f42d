"""Temporal train block (Pallas fwd + hand-written bwd) vs jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.models.primitives import TransformerBlock
from uplift_upsample_tpu.ops.pallas_temporal_bwd import fused_temporal_block_train


def _reference(params, x, key_mask, dp_scales, num_heads):
    """jnp replica of the block with explicit droppath scales."""
    c = x.shape[-1]
    depth = c // num_heads

    def ln(t, p, eps):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
        return (t - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]

    y = ln(x, params["norm1"], 1e-5)
    b, s, _ = x.shape
    split = lambda t: t.reshape(b, s, num_heads, depth).transpose(0, 2, 1, 3)
    q = split(y @ params["attn"]["wq"]["kernel"] + params["attn"]["wq"]["bias"])
    k = split(y @ params["attn"]["wk"]["kernel"] + params["attn"]["wk"]["bias"])
    v = split(y @ params["attn"]["wv"]["kernel"] + params["attn"]["wv"]["bias"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(depth)
    if key_mask is not None:
        logits = logits + key_mask[:, None, None, :] * -1e9
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, c)
    proj = ctx @ params["attn"]["proj"]["kernel"] + params["attn"]["proj"]["bias"]
    x = x + proj * dp_scales[0][:, None, None]
    z = ln(x, params["norm2"], 1e-5)
    h = jax.nn.relu(z @ params["mlp"]["fc1"]["kernel"] + params["mlp"]["fc1"]["bias"])
    z2 = h @ params["mlp"]["fc2"]["kernel"] + params["mlp"]["fc2"]["bias"]
    return x + z2 * dp_scales[1][:, None, None]


@pytest.mark.parametrize("masked", [False, True])
def test_fused_temporal_block_train_grads(masked):
    b, s, c, heads = 8, 71, 384, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)
    key_mask = (jnp.asarray(rng.uniform(size=(b, s)) < 0.4).astype(jnp.float32)
                if masked else None)
    keep = (rng.uniform(size=(2, b)) > 0.25).astype(np.float32) / 0.75
    dp = jnp.asarray(keep)

    block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                             qkv_bias=True, activation=jax.nn.relu)
    params = block.init(jax.random.PRNGKey(0), x)["params"]

    cot = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))

    def ref_loss(params, x, dp):
        return jnp.sum(_reference(params, x, key_mask, dp, heads) * cot)

    ref_val, ref_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(
        params, x, dp)

    def fused_loss(params, x, dp):
        km = key_mask if key_mask is not None else jnp.zeros((b, s), jnp.float32)
        out = fused_temporal_block_train(x, params, km, dp, heads, 4,
                                         jnp.float32)
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        got_val, got_grads = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(
            params, x, dp)

    assert np.isclose(float(got_val), float(ref_val), rtol=1e-5), \
        (float(got_val), float(ref_val))
    flat_ref = {"/".join(str(kk) for kk in kp): vv for kp, vv in
                jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    for kp, gv in jax.tree_util.tree_flatten_with_path(got_grads)[0]:
        key = "/".join(str(kk) for kk in kp)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(flat_ref[key]),
                                   atol=3e-4, rtol=2e-3, err_msg=key)


@pytest.mark.parametrize("fmb", [0, 1])
def test_fused_temporal_stack_train_grads(fmb, wpt=4):
    """Multi-block grouped train kernels vs the chained jnp reference."""
    from uplift_upsample_tpu.ops.pallas_temporal_bwd import (
        fused_temporal_stack_train)

    b, s, c, heads, blocks = 8, 71, 384, 8, 3  # odd count: groups of 2 + 1
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)
    key_mask = jnp.asarray(rng.uniform(size=(b, s)) < 0.4).astype(jnp.float32)
    keep = (rng.uniform(size=(blocks, 2, b)) > 0.25).astype(np.float32) / 0.75
    dp_all = jnp.asarray(keep)

    params_tuple = []
    for i in range(blocks):
        block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                                 qkv_bias=True, activation=jax.nn.relu)
        params_tuple.append(block.init(jax.random.PRNGKey(20 + i), x)["params"])
    params_tuple = tuple(params_tuple)

    cot = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))

    def ref_loss(params_tuple, x, dp_all):
        y = x
        for i in range(blocks):
            km = key_mask if i < fmb else None
            y = _reference(params_tuple[i], y, km, dp_all[i], heads)
        return jnp.sum(y * cot)

    ref_val, ref_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(
        params_tuple, x, dp_all)

    def fused_loss(params_tuple, x, dp_all):
        out = fused_temporal_stack_train(x, params_tuple, key_mask, dp_all,
                                         heads, wpt, jnp.float32, fmb, 2)
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        got_val, got_grads = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(
            params_tuple, x, dp_all)

    assert np.isclose(float(got_val), float(ref_val), rtol=1e-5), \
        (float(got_val), float(ref_val))
    flat_ref = {"/".join(str(kk) for kk in kp): vv for kp, vv in
                jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    for kp, gv in jax.tree_util.tree_flatten_with_path(got_grads)[0]:
        key = "/".join(str(kk) for kk in kp)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(flat_ref[key]),
                                   atol=3e-4, rtol=2e-3, err_msg=key)


@pytest.mark.slow
def test_fused_temporal_train_step_matches_flax():
    """Full loss grads with TRAIN_FUSED_SPATIAL+TEMPORAL vs the flax path
    (stochastic depth off for exactness)."""
    from tests.test_fused_spatial_train import _batch, _config
    from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                            init_model_params)
    from uplift_upsample_tpu.parallel.train_step import make_loss_fn

    def run(**over):
        config = _config(**over)
        model = build_uplift_upsample_transformer(config)
        params = init_model_params(model, seed=0)["params"]
        loss_fn = make_loss_fn(model, config)
        batch = tuple(jnp.asarray(a) for a in _batch(config))
        rngs = {name: jax.random.PRNGKey(i) for i, name in
                enumerate(("dropout", "droppath", "token_mask"))}
        return jax.value_and_grad(loss_fn)(params, batch, rngs)

    with pltpu.force_tpu_interpret_mode():
        loss_f, grads_f = run(TRAIN_FUSED_SPATIAL=True,
                              TRAIN_FUSED_TEMPORAL=True)
    loss_x, grads_x = run(TRAIN_FUSED_SPATIAL=False)

    assert np.isclose(float(loss_f), float(loss_x), atol=1e-5)
    flat_x = {"/".join(str(kk) for kk in kp): vv for kp, vv in
              jax.tree_util.tree_flatten_with_path(grads_x)[0]}
    for kp, gf in jax.tree_util.tree_flatten_with_path(grads_f)[0]:
        key = "/".join(str(kk) for kk in kp)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(flat_x[key]),
                                   atol=1e-4, rtol=2e-3, err_msg=key)


@pytest.mark.slow
def test_fused_temporal_stack_train_grads_wpt8():
    """The shipped TRAIN_TEMPORAL_WPT=8 tiling (R=576): grads must match the
    reference exactly like wpt=4 — the tiling is math-independent."""
    test_fused_temporal_stack_train_grads(fmb=1, wpt=8)
