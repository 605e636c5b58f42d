"""Multi-host input feed: per-host generator sharding + global array assembly.

A real TPU slice has one process per host, each seeing only its local chips.
The reference is strictly single-process (`/root/reference/train.py:341-342`
asserts one GPU); here every process runs the *same* deterministic epoch plan
(identical seeds → identical shuffles, mask-stride draws, flips) and
materializes only its row range of each global batch, so the concatenation
over hosts is bit-identical to the single-process feed. All RNG is consumed
at epoch-plan time (see fast_batcher._epoch_plan), which is what makes
row-skipping safe.

`globalize_batch` then lifts the host-local rows into jax global arrays via
`jax.make_array_from_process_local_data`, sharded batch-major over the mesh's
data-parallel axis.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_row_slice(batch_size: int, process_index: int = None,
                   process_count: int = None) -> slice:
    """This host's row range [start, stop) of every global batch."""
    process_index = jax.process_index() if process_index is None else process_index
    process_count = jax.process_count() if process_count is None else process_count
    assert batch_size % process_count == 0, (
        f"global batch {batch_size} must divide over {process_count} hosts")
    per = batch_size // process_count
    return slice(process_index * per, (process_index + 1) * per)


class HostShardedBatcher:
    """Wrap a Fast*Batcher to produce only this host's rows of each batch.

    Every host constructs the identical underlying batcher (same data, same
    seeds) and this wrapper slices the global batch deterministically; no
    cross-host communication is needed for the feed itself.
    """

    def __init__(self, batcher, process_index: int = None,
                 process_count: int = None):
        self.batcher = batcher
        self.rows = host_row_slice(batcher.batch_size, process_index,
                                   process_count)

    def __len__(self):
        return len(self.batcher)

    @property
    def batch_size(self) -> int:  # local batch size
        return self.rows.stop - self.rows.start

    def batches(self) -> Iterator[tuple]:
        return self.batcher.batches(rows=self.rows)


def globalize_batch(mesh: Mesh, local_batch: Tuple[np.ndarray, ...],
                    batch_axis: str = "dp") -> Tuple[jax.Array, ...]:
    """Host-local batch rows → global jax arrays sharded over `batch_axis`.

    Each returned array has global shape (global_batch, ...) with this
    process contributing its local rows; jax places shards on the process's
    addressable devices along the mesh data axis.
    """
    sharding = NamedSharding(mesh, P(batch_axis))
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_batch)
