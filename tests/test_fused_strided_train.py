"""Strided-block-1 train kernels (Pallas fwd + hand-written bwd) vs flax."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.models.primitives import StridedTransformerBlock
from uplift_upsample_tpu.ops.pallas_strided_bwd import fused_strided_block1_train


def _setup(b=4, n=27, c=128, heads=8, stride=3, seed=5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32) * 0.5)
    pe = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32) * 0.1)
    block = StridedTransformerBlock(dim=c, num_heads=heads, mlp_ratio=2.0,
                                    qkv_bias=True, activation=jax.nn.relu,
                                    kernel_size=3, stride=stride,
                                    padding=(0, 0))
    variables = block.init(jax.random.PRNGKey(seed), x, pos_encoding=pe)
    return block, variables["params"], x, pe, stride


def test_fused_strided_train_forward_matches_flax():
    block, params, x, pe, stride = _setup()
    n = x.shape[1]
    n_out = (n - 3) // stride + 1

    ref, _ = block.apply({"params": params}, x, pos_encoding=pe,
                         deterministic=True)
    with pltpu.force_tpu_interpret_mode():
        pre = fused_strided_block1_train(x, (params, pe), 8, 4, n)
    got = pre[:, : (n_out - 1) * stride + 1: stride]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_strided_train_grads_match_flax():
    block, params, x, pe, stride = _setup()
    n = x.shape[1]
    n_out = (n - 3) // stride + 1
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(x.shape[0], n_out,
                                       x.shape[2])).astype(np.float32))

    def ref_loss(params, x, pe):
        out, _ = block.apply({"params": params}, x, pos_encoding=pe,
                             deterministic=True)
        return jnp.sum(out * cot)

    def fused_loss(params, x, pe):
        pre = fused_strided_block1_train(x, (params, pe), 8, 4, n)
        out = pre[:, : (n_out - 1) * stride + 1: stride]
        return jnp.sum(out * cot)

    ref_val, ref_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(
        params, x, pe)
    with pltpu.force_tpu_interpret_mode():
        got_val, got_grads = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(
            params, x, pe)

    assert np.isclose(float(got_val), float(ref_val), rtol=1e-5), \
        (float(got_val), float(ref_val))
    # fused grads come back as (params_tree, (x,), pe) vs ref (params, x, pe)
    gp_ref, gx_ref, gpe_ref = ref_grads
    gp_got, gx_got, gpe_got = got_grads
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               atol=5e-5, rtol=1e-3, err_msg="dx")
    np.testing.assert_allclose(np.asarray(gpe_got), np.asarray(gpe_ref),
                               atol=5e-5, rtol=1e-3, err_msg="dpe")
    flat_ref = {"/".join(str(k) for k in kp): v for kp, v in
                jax.tree_util.tree_flatten_with_path(gp_ref)[0]}
    for kp, gv in jax.tree_util.tree_flatten_with_path(gp_got)[0]:
        key = "/".join(str(k) for k in kp)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(flat_ref[key]),
                                   atol=5e-5, rtol=1e-3, err_msg=key)


@pytest.mark.slow
def test_fused_train_step_with_strided_matches_flax():
    """End-to-end loss_fn grads: fully-fused path (spatial + temporal +
    strided-b1 kernels, head1 inline) vs the plain flax path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_spatial_train import _config, _run_steps

    with pltpu.force_tpu_interpret_mode():
        loss_f, grads_f = _run_steps(_config(
            TRAIN_FUSED_SPATIAL=True, TRAIN_FUSED_TEMPORAL=True,
            TRAIN_FUSED_STRIDED=True))
    loss_x, grads_x = _run_steps(_config(TRAIN_FUSED_SPATIAL=False))

    assert np.isclose(loss_f, loss_x, atol=1e-4), (loss_f, loss_x)
    flat_x = {"/".join(str(k) for k in kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(grads_x)[0]}
    for kp, gf in jax.tree_util.tree_flatten_with_path(grads_f)[0]:
        key = "/".join(str(k) for k in kp)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(flat_x[key]),
                                   atol=1e-4, rtol=2e-3, err_msg=key)
