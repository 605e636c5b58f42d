"""Fast exact row deduplication for the shared-spatial eval path.

`np.unique(axis=0)` on the (B·N, 34) float32 frame matrix costs ~2 s at
B=2048 (memcmp-sorting 136-byte void keys) — far below the device rate. This
module dedups via a vectorized 64-bit mixing hash over the row bytes, then
VERIFIES the grouping with an exact bytewise compare against each group's
representative; on any mismatch (a hash collision, ~2^-64 per batch, or
adversarial input) it falls back to the exact `np.unique(axis=0)`. The result
is therefore always exact.

Bytewise (not float) equality semantics: -0.0 and 0.0 hash differently and
stay distinct rows (conservative — merely less dedup), and NaN payloads
compare reliably. The caller treats equal-byte rows as identical inputs,
which is exactly the precondition for sharing their computed features.
"""

from __future__ import annotations

import numpy as np

# Per-column odd multipliers (splitmix64-style constants) so that permuted
# rows mix to different hashes; wraparound multiply is the intended mixing.
_MIX = np.uint64(0x9E3779B97F4A7C15)
_FINAL_A = np.uint64(0xBF58476D1CE4E5B9)
_FINAL_B = np.uint64(0x94D049BB133111EB)


def _column_constants(ncols: int) -> np.ndarray:
    # Deterministic odd constants per column
    c = (np.arange(1, ncols + 1, dtype=np.uint64) * _MIX) | np.uint64(1)
    return c


def dedup_rows(flat: np.ndarray):
    """Exact row dedup. flat: (R, D) array whose row byte-length is a
    multiple of 8. Returns (uniq (U, D), inverse (R,)) with
    uniq[inverse] bytewise-equal to flat. uniq rows appear in hash order
    (NOT lexicographic — callers must not rely on ordering)."""
    flat = np.ascontiguousarray(flat)
    r, d = flat.shape
    assert (d * flat.dtype.itemsize) % 8 == 0, "row bytes must be 8-aligned"
    with np.errstate(over="ignore"):
        b = flat.view(np.uint64).reshape(r, -1)
        h = (b * _column_constants(b.shape[1])).sum(axis=1, dtype=np.uint64)
        # splitmix64-style finalizer: break up linear structure
        h ^= h >> np.uint64(30)
        h *= _FINAL_A
        h ^= h >> np.uint64(27)
        h *= _FINAL_B
        h ^= h >> np.uint64(31)
    _, first_idx, inv = np.unique(h, return_index=True, return_inverse=True)
    bu = b[first_idx]
    if (b == bu[inv]).all():
        return flat[first_idx], inv
    # Hash collision: exact (slow) fallback
    return np.unique(flat, axis=0, return_inverse=True)
