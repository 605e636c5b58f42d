"""Fused first strided block vs the flax StridedTransformerBlock."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.models.primitives import StridedTransformerBlock
from uplift_upsample_tpu.ops.pallas_strided import (fused_strided_block1,
                                                    stack_strided_block1_params)


@pytest.mark.parametrize("n,stride", [(71, 3), (27, 3), (23, 10)])
def test_fused_strided_block1_matches_flax(n, stride):
    b, c, heads = 8, 384, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32) * 0.5)
    pe = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32) * 0.1)

    block = StridedTransformerBlock(
        dim=c, num_heads=heads, mlp_ratio=2.0, qkv_bias=True,
        activation=jax.nn.relu, kernel_size=3, stride=stride, padding=(0, 0))
    variables = block.init(jax.random.PRNGKey(0), x, pos_encoding=pe)

    ref, _ = block.apply(variables, x, pos_encoding=pe, deterministic=True)

    params = {"strided_temporal_block_1": variables["params"],
              "strided_temporal_pe_1": pe}
    ops = stack_strided_block1_params(params, n, weights_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_strided_block1(x, ops, num_heads=heads,
                                   weights_dtype=jnp.float32)
    n_out = (n - 3) // stride + 1
    got = out[:, : (n_out - 1) * stride + 1: stride]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
