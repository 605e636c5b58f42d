"""Model family: UpliftUpsampleTransformer (flax.linen) and its primitives."""

from .uplift_upsample import UpliftUpsampleTransformer  # noqa: F401
from .build import build_uplift_upsample_transformer, init_model_params  # noqa: F401
