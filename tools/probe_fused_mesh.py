"""On-chip probe: fused="full" eval step UNDER a mesh (VERDICT r3 item 7).

The production eval runs either unfused (CPU dryruns) or unmeshed (single
chip), so the in_shardings path of eval.make_test_step (eval.py mesh branch)
never met the Pallas kernels. This builds a 1-device Mesh on the real TPU and
runs the fused+mesh shared-spatial step, asserting equality with the unmeshed
fused step — pinning the in_shardings plumbing with Mosaic kernels in-path.

    sh tools/tpu_queue.sh "python tools/probe_fused_mesh.py"
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from uplift_upsample_tpu.configs import get_config
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    from uplift_upsample_tpu.eval import make_test_step
    from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                            init_model_params)
    from uplift_upsample_tpu.parallel.mesh import make_mesh

    assert jax.devices()[0].platform in ("tpu",), jax.devices()
    config = get_config("h36m_351")
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)

    b, n, k = 256, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    rng = np.random.default_rng(0)
    uniq = rng.normal(size=(b + n - 1, k, 2)).astype(np.float32) * 0.3
    u_max = -(-(b + n - 1) // 8) * 8
    uq = np.zeros((u_max, k, 2), np.float32)
    uq[: b + n - 1] = uniq
    win_idx = (np.arange(b)[:, None] + np.arange(n)).astype(np.int32)
    sm = np.ones((b, n), bool)

    mesh = make_mesh(num_devices=1)
    kws = dict(flip_tta=True, flip_lr_indices=H36MOrder17P.flip_lr_indices(),
               fused="full", precision="high", shared_spatial=True,
               assume_dense_mask=True)
    step_mesh = make_test_step(model, variables, mesh=mesh, **kws)
    step_plain = make_test_step(model, variables, mesh=None, **kws)

    _, central_mesh = step_mesh(jnp.asarray(uq), jnp.asarray(win_idx),
                                jnp.asarray(sm))
    _, central_plain = step_plain(jnp.asarray(uq), jnp.asarray(win_idx),
                                  jnp.asarray(sm))
    cm = np.asarray(jax.device_get(central_mesh))
    cp = np.asarray(jax.device_get(central_plain))
    assert cm.shape == (b, k, 3), cm.shape
    np.testing.assert_allclose(cm, cp, atol=1e-5, rtol=1e-5)
    print(f"fused+mesh(1-device) == fused+unmeshed: max|diff| = "
          f"{np.abs(cm - cp).max():.2e} over {cm.size} values — OK")


if __name__ == "__main__":
    main()
