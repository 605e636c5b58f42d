"""Fused temporal-block kernel vs the flax TransformerBlock (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.models.primitives import TransformerBlock
from uplift_upsample_tpu.ops.pallas_temporal import fused_temporal_block


@pytest.mark.parametrize("mask", [False, True])
def test_fused_temporal_block_matches_flax(mask):
    b, s, c, heads = 8, 71, 384, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)

    block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0, qkv_bias=True,
                             activation=jax.nn.relu)
    variables = block.init(jax.random.PRNGKey(0), x)

    key_mask = None
    mask4 = None
    if mask:
        key_mask = jnp.asarray(rng.uniform(size=(b, s)) < 0.5)
        mask4 = key_mask.astype(jnp.float32)[:, None, None, :]

    ref, _ = block.apply(variables, x, mask=mask4, deterministic=True)
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_block(x, variables["params"], key_mask,
                                   num_heads=heads, windows_per_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("fmb", [0, 1])
def test_fused_temporal_stack_v2_matches_flax(fmb):
    """v2 stack kernel (fused qkv, per-block pallas_call) vs 2 flax blocks."""
    from uplift_upsample_tpu.ops.pallas_temporal import (fused_temporal_stack,
                                                         stack_temporal_params)

    b, s, c, heads, blocks = 8, 71, 384, 8, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)
    key_mask = jnp.asarray(rng.uniform(size=(b, s)) < 0.5)

    params = {}
    ref = x
    for i in range(blocks):
        block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                                 qkv_bias=True, activation=jax.nn.relu)
        variables = block.init(jax.random.PRNGKey(i), ref)
        params[f"temporal_block_{i + 1}"] = variables["params"]
        mask4 = (key_mask.astype(jnp.float32)[:, None, None, :]
                 if i < fmb else None)
        ref, _ = block.apply(variables, ref, mask=mask4, deterministic=True)

    stacked = stack_temporal_params(params, blocks)
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_stack(x, stacked, key_mask, num_blocks=blocks,
                                   num_heads=heads, first_masked_blocks=fmb,
                                   windows_per_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("fmb", [0, 1])
@pytest.mark.parametrize("attn_mode", ["full", "banded"])
def test_fused_temporal_stack_v3_matches_flax(fmb, attn_mode):
    """v3 transposed-layout stack kernel vs 2 flax blocks.

    Weights kept f32 in the test: the production bf16 weight cast is a
    precision choice (equivalent to DEFAULT dots), not a correctness one.
    attn_mode "banded" must be numerically equivalent to "full" (the band
    softmax sees exactly the unmasked window logits).
    """
    from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
    from uplift_upsample_tpu.ops.pallas_temporal_v3 import fused_temporal_stack_v3

    b, s, c, heads, blocks = 8, 71, 384, 8, 2
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)
    key_mask = jnp.asarray(rng.uniform(size=(b, s)) < 0.5)

    params = {}
    ref = x
    for i in range(blocks):
        block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                                 qkv_bias=True, activation=jax.nn.relu)
        variables = block.init(jax.random.PRNGKey(10 + i), ref)
        params[f"temporal_block_{i + 1}"] = variables["params"]
        mask4 = (key_mask.astype(jnp.float32)[:, None, None, :]
                 if i < fmb else None)
        ref, _ = block.apply(variables, ref, mask=mask4, deterministic=True)

    stacked = stack_temporal_params(params, blocks)
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_stack_v3(x, stacked, key_mask, num_blocks=blocks,
                                      num_heads=heads, first_masked_blocks=fmb,
                                      windows_per_tile=4,
                                      weights_dtype=jnp.float32,
                                      attn_mode=attn_mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_temporal_stack_v3_high3_presplit_matches_flax():
    """HIGH3 rung with host-pre-split bf16 hi/lo weight planes vs flax f32.

    bf16x3 keeps ~2^-16 relative accuracy; through 2 blocks the output must
    sit well inside 1e-3 absolute of the f32 reference (drift at this scale
    measured ~1e-4 on chip for the full 4-block stack).
    """
    from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
    from uplift_upsample_tpu.ops.pallas_temporal_v3 import (HIGH3,
                                                            fused_temporal_stack_v3)

    b, s, c, heads, blocks = 4, 71, 384, 8, 2
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32) * 0.5)

    params = {}
    ref = x
    for i in range(blocks):
        block = TransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                                 qkv_bias=True, activation=jax.nn.relu)
        variables = block.init(jax.random.PRNGKey(20 + i), ref)
        params[f"temporal_block_{i + 1}"] = variables["params"]
        ref, _ = block.apply(variables, ref, deterministic=True)

    stacked = stack_temporal_params(params, blocks)
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_stack_v3(x, stacked, None, num_blocks=blocks,
                                      num_heads=heads, windows_per_tile=4,
                                      weights_dtype=jnp.float32,
                                      precision=HIGH3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
    # and it must be much tighter than a 1-pass bf16 rounding of the inputs
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(ref))))
    assert err < 1e-3, err
