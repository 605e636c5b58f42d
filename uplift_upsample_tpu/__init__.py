"""uplift_upsample_tpu — TPU-native JAX framework for 2D→3D human pose uplifting.

A from-scratch reimplementation of the capabilities of the WACV'23
"Uplift and Upsample" reference (goldbricklemon/uplift-upsample-3dhpe),
designed TPU-first: flax/linen model with fused XLA/Pallas attention paths,
device-side camera/projection pipeline, pjit/shard_map data parallelism,
and an h5-compatible weight converter for the released checkpoints.

Layout:
  config         — layered config system (defaults + JSON overlay + CLI), reference-compatible keys
  models/        — UpliftUpsampleTransformer and transformer primitives (flax.linen)
  ops/           — compute kernels: attention (XLA + Pallas), batched camera projection
  data/          — Human3.6M / AMASS datasets, sequence window generators, device feed
  parallel/      — jax.sharding Mesh helpers, pjit train/eval step builders
  utils/         — metrics (numpy float64), eval protocol, schedules, weight IO, logging
"""

__version__ = "0.1.0"
