"""Probe the persistent-compilation-cache key stability across processes.

Run twice; if the printed key differs between runs for the identical tiny
program, the cache can never hit across processes — diff the debug hash
breakdown to find the unstable component.

    python tools/probe_cache_key.py
"""

import logging
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

import jax.numpy as jnp  # noqa: E402

logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

import numpy as np  # noqa: E402
from jax._src import cache_key as ck  # noqa: E402
from jax._src import compiler  # noqa: E402


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)

    fn = jax.jit(lambda a, b: a @ b + 1.0)
    x = jnp.zeros((128, 128), jnp.float32)
    lowered = fn.lower(x, x)
    comp = lowered.compiler_ir("hlo")
    backend = jax.lib.xla_bridge.get_backend()
    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    key = ck.get(comp, jax.devices()[:1], opts, backend)
    print("CACHE_KEY:", key)
    # Also show what the debug hash breakdown says (logged at DEBUG above).


if __name__ == "__main__":
    main()
