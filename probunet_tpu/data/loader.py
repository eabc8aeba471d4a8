"""Batch iteration and async host->device prefetch.

Replaces the reference's single-process ``DataLoader(num_workers=0)``
(reference src/main.py:77-100) with:

- :class:`Batches` — epoch index batching with optional shuffling from an
  explicit numpy Generator (deterministic, no global seed state);
- :func:`prefetch_to_device` — double-buffered host->HBM transfer so the
  next batch's DMA overlaps with the current step's compute (the standard
  TPU input-pipeline pattern; the reference transfers synchronously inside
  the hot loop at src/train_prob_unet_model.py:123-125).
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator

import jax
import numpy as np


class Batches:
    """Iterate index batches over a dataset length.

    drop_last defaults True for static batch shapes (XLA recompiles on any
    shape change; the reference tolerated a ragged final batch).
    """

    def __init__(
        self,
        n: int,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.n = int(n)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (self.n // self.batch_size) * self.batch_size if self.drop_last else self.n
        for s in range(0, stop, self.batch_size):
            yield idx[s : s + self.batch_size]


def prefetch_to_device(
    iterable: Iterable,
    size: int = 2,
    sharding: jax.sharding.Sharding | None = None,
) -> Iterator:
    """Double-buffered transfer of host batches (pytrees of np arrays) to device.

    ``jax.device_put`` is async: enqueueing `size` batches ahead lets the
    transfer engine overlap with compute. With a ``sharding``, arrays land
    directly in their sharded layout (DP input pipeline).

    Multi-process meshes: when ``sharding`` spans non-addressable devices
    (a real jax.distributed run), the iterator must yield the FULL global
    batch on every process (deterministic Batches seeding guarantees all
    processes see the same one); each process then contributes only its
    contiguous slab of the leading (batch) axis via
    ``jax.make_array_from_process_local_data``. This trades per-host IO for
    simplicity — for true per-host slab loading (each host reads only its
    rows from disk, SURVEY.md §2.5 P5) drive the step directly with
    ``parallel.multihost.process_local_indices`` + ``global_batch`` as
    ``tests/mp_worker.py`` does.
    """

    queue: collections.deque = collections.deque()
    it = iter(iterable)

    def put_global(x):
        import numpy as np

        n, i = jax.process_count(), jax.process_index()
        if x.shape[0] % n:
            raise ValueError(
                f"global batch of {x.shape[0]} rows does not divide over "
                f"{n} processes — rows would be silently dropped; make "
                f"batch_size a multiple of the process count"
            )
        per = x.shape[0] // n
        local = np.asarray(x[i * per:(i + 1) * per])
        return jax.make_array_from_process_local_data(sharding, local)

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if not sharding.is_fully_addressable:
            return jax.tree.map(put_global, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    for batch in itertools.islice(it, size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
