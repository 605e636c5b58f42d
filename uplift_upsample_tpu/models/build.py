"""Config → model factory (parity with reference
`uplift_upsample_transformer_constructor.py:14-50`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import UpliftUpsampleConfig
from .uplift_upsample import UpliftUpsampleTransformer


def config_has_strided_input(config: UpliftUpsampleConfig) -> bool:
    ms = config.MASK_STRIDE
    if ms is None:
        return False
    if isinstance(ms, int) and ms == 1:
        return False
    if isinstance(ms, list) and ms[0] == 1:
        return False
    return True


def build_uplift_upsample_transformer(config: UpliftUpsampleConfig,
                                      **overrides) -> UpliftUpsampleTransformer:
    dtype = jnp.dtype(getattr(config, "COMPUTE_DTYPE", "float32"))
    kwargs = dict(
        full_output=not config.USE_REFINE,
        num_frames=config.SEQUENCE_LENGTH,
        num_keypoints=config.NUM_KEYPOINTS,
        spatial_d_model=config.SPATIAL_EMBED_DIM,
        temporal_d_model=config.TEMPORAL_EMBED_DIM,
        spatial_depth=config.SPATIAL_TRANSFORMER_BLOCKS,
        temporal_depth=config.TEMPORAL_TRANSFORMER_BLOCKS,
        strides=tuple(config.STRIDES),
        paddings=None if config.PADDINGS is None else tuple(map(tuple, config.PADDINGS)),
        num_heads=config.NUM_HEADS,
        mlp_ratio=config.MLP_RATIO,
        qkv_bias=config.QKV_BIAS,
        attn_drop_rate=config.ATTENTION_DROP_RATE,
        drop_rate=config.DROP_RATE,
        drop_path_rate=(tuple(config.DROP_PATH_RATE)
                        if isinstance(config.DROP_PATH_RATE, list) else config.DROP_PATH_RATE),
        output_bn=config.OUTPUT_BN,
        has_strided_input=config_has_strided_input(config),
        first_strided_token_attention_layer=config.FIRST_STRIDED_TOKEN_ATTENTION_LAYER,
        token_mask_rate=config.TOKEN_MASK_RATE,
        learnable_masked_token=config.LEARNABLE_MASKED_TOKEN,
        dtype=dtype,
        spatial_dtype=(jnp.dtype(config.SPATIAL_COMPUTE_DTYPE)
                       if getattr(config, "SPATIAL_COMPUTE_DTYPE", None) else None),
        use_pallas=bool(getattr(config, "USE_PALLAS_ATTENTION", False)),
    )
    kwargs.update(overrides)
    return UpliftUpsampleTransformer(**kwargs)


def init_model_params(model: UpliftUpsampleTransformer, seed: int = 0, batch_size: int = 2):
    """Initialize variables with dummy inputs; returns the variables dict."""
    x = jnp.zeros((batch_size, model.num_frames, model.num_keypoints, 2), jnp.float32)
    sm = jnp.ones((batch_size, model.num_frames), jnp.bool_)
    return model.init({"params": jax.random.PRNGKey(seed)}, x,
                      stride_mask=sm if model.has_strided_input else None,
                      training=False)
