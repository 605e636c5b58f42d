"""Backend capability probes for 'auto' kernel gating.

The fused Pallas kernels lower through Mosaic, which exists only for TPU.
Gating on `platform != 'cpu'` (the round-1 rule) would mis-enable them on a
GPU backend; gating on `platform == 'tpu'` alone would miss relay-tunneled
TPU platforms (this environment's 'axon' relay exposes a real v5e whose
`platform` is not the literal string 'tpu'). Check both the platform name
and the device kind.
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True iff the default JAX backend can lower Mosaic (pltpu) kernels."""
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    if d.platform == "tpu":
        return True
    # Relay/proxy platforms (e.g. 'axon') expose the real device kind.
    return "tpu" in getattr(d, "device_kind", "").lower()
