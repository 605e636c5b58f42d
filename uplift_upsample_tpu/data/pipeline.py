"""Host→device input pipeline: batching, epoch repetition, device prefetch.

The reference feeds batches through tf.data (generator → repeat → batch →
prefetch, `train.py:102-120`). Here the host side is a plain numpy batcher
(backed by a background thread) and the device side is a double-buffered
`jax.device_put` with an explicit sharding, so the batch for step k+1 is
already on device (sharded over the data-parallel mesh axis) while step k
computes.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax


def batch_tuples(items: Sequence[tuple]) -> tuple:
    """Stack a list of example tuples into a tuple of batched arrays."""
    return tuple(np.stack([it[i] for it in items], axis=0)
                 for i in range(len(items[0])))


def batched(iterator: Iterator[tuple], batch_size: int,
            drop_remainder: bool = False) -> Iterator[tuple]:
    """Group an example iterator into batched tuples."""
    batch = []
    for item in iterator:
        batch.append(item)
        if len(batch) == batch_size:
            yield batch_tuples(batch)
            batch = []
    if batch and not drop_remainder:
        yield batch_tuples(batch)


def repeat_epochs(epoch_iterator_fn: Callable[[], Iterator], count: Optional[int] = None):
    """Chain epoch iterators `count` times (None = forever)."""
    counter = itertools.count() if count is None else range(count)
    for _ in counter:
        yield from epoch_iterator_fn()


def eval_batches(epoch_iterator_fn: Callable[[], Iterator], num_examples: int,
                 batch_size: int) -> Iterator[tuple]:
    """Reference eval batching: repeat the (deterministic) epoch twice, batch,
    and take ceil(n/B) batches so the trailing fractional batch is padded with
    examples wrapped from the start (`eval.py:131-134`). Batches keep dataset
    order, which the keyframe-interpolation pass depends on.
    """
    num_batches = int(np.ceil(num_examples / batch_size))
    it = batched(repeat_epochs(epoch_iterator_fn, count=2), batch_size, drop_remainder=True)
    return itertools.islice(it, num_batches)


def train_batches(epoch_iterator_fn: Callable[[], Iterator], batch_size: int,
                  prefetch: int = 4) -> Iterator[tuple]:
    """Infinite shuffled batches, produced by a background host thread."""
    return _threaded(batched(repeat_epochs(epoch_iterator_fn), batch_size,
                             drop_remainder=True), depth=prefetch)


def _threaded(iterator: Iterator, depth: int) -> Iterator:
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def device_prefetch(iterator: Iterator, sharding=None, depth: int = 2) -> Iterator:
    """Move batches to device ahead of consumption (double buffering).

    `sharding` may be a single jax.sharding.Sharding applied to every array,
    or a tuple matching the batch tuple structure.
    """
    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if isinstance(sharding, tuple):
            return tuple(jax.device_put(a, s) for a, s in zip(batch, sharding))
        return tuple(jax.device_put(a, sharding) for a in batch)

    buf = []
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.pop(0)
    yield from buf
