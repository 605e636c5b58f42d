"""Device-mesh parallelism: sharding helpers and pjit step builders."""

from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch  # noqa: F401
from .train_step import TrainState, make_optimizer, make_train_step, make_val_step  # noqa: F401
