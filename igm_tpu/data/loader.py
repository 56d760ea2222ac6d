"""Host batch iteration + double-buffered device prefetch.

Replaces the reference's torch DataLoader (fork workers, implicit pinning —
`/root/reference/src/datamodules/base.py:14-27`) with the TPU-shaped
pipeline: the epoch is one deterministic permutation, batches are gathered
into contiguous uint8 buffers by the threaded C++ batcher (native.py), and
``DevicePrefetcher`` device-puts the NEXT batch (sharded along the ``data``
mesh axis) while the current step runs, so input never serialises with
compute.

Prefetch-worker exceptions propagate to the training loop — a dying worker
must fail the epoch loudly, not truncate it silently.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional, Sequence, Tuple

import numpy as np

from . import native


def epoch_batches(arrays: Sequence[np.ndarray], batch_size: int,
                  rng: Optional[np.random.Generator] = None,
                  shuffle: bool = False, limit: Optional[int] = None,
                  divisor: int = 1) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield host batch tuples of exactly ``batch_size`` rows (remainder
    dropped, batch size rounded down to a multiple of ``divisor`` so every
    batch shards evenly over the device mesh)."""
    n = len(arrays[0])
    bs = int(batch_size)
    if divisor > 1:
        bs = max((bs // divisor) * divisor, divisor)
    bs = min(bs, n)
    if divisor > 1:
        bs -= bs % divisor
    if bs <= 0:
        # dataset smaller than the device mesh: an empty epoch would train
        # zero steps with no error — fail loudly instead (advisor r2 finding)
        raise ValueError(
            f"dataset of {n} rows cannot form a single batch divisible by "
            f"the {divisor}-device mesh; reduce device count or grow data")
    if shuffle:
        order = (rng.permutation(n) if rng is not None
                 else native.shuffle_perm(n)).astype(np.int64)
    else:
        order = np.arange(n, dtype=np.int64)
    n_batches = n // bs
    if limit is not None:
        n_batches = min(n_batches, int(limit))
    for i in range(n_batches):
        idx = order[i * bs:(i + 1) * bs]
        yield tuple(native.gather_rows(a, idx) for a in arrays)


def chunk_batches(batches: Iterable, k: int) -> Iterator[Tuple[np.ndarray, ...]]:
    """Stack K consecutive batches into one [k, B, ...] chunk for chained
    execution (Trainer ``steps_per_execution``).  A shorter tail chunk is
    yielded as-is (one extra jit specialisation per distinct tail length)."""
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield tuple(np.stack([bb[j] for bb in buf])
                        for j in range(len(buf[0])))
            buf = []
    if buf:
        yield tuple(np.stack([bb[j] for bb in buf])
                    for j in range(len(buf[0])))


class DevicePrefetcher:
    """Iterate device-resident batches; transfer overlaps the current step.

    A worker thread pulls host batches and ``device_put``s them with the
    batch sharding (leading axis over the ``data`` mesh axis), keeping up to
    ``depth`` batches in flight.  Worker exceptions are re-raised at the
    consuming ``__next__`` call.
    """

    _SENTINEL = object()

    def __init__(self, batches: Iterable, mesh, depth: int = 2,
                 sharding=None):
        from ..parallel import mesh as mesh_lib
        self._mesh = mesh
        self._sharding = sharding
        self._shard = (mesh_lib.shard_batch if sharding is None
                       else self._shard_with)
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(1, depth))
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(batches),), daemon=True)
        self._thread.start()

    def _shard_with(self, mesh, batch):
        import jax
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), self._sharding), batch)

    def _worker(self, it) -> None:
        try:
            for batch in it:
                self._q.put(self._shard(self._mesh, batch))
        except BaseException as exc:  # propagate, never truncate the epoch
            self._exc = exc
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            self._thread.join()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
