"""Host-side batching loader with background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` (train.py:147-164 —
used there with no workers and default settings). TPU-first differences:

- a background thread materializes the next batches while the device is
  busy (host→HBM overlap; the north-star "≥80% input-pipeline duty cycle"
  starts here);
- deterministic shuffling from a seed (reference relies on torch's global
  RNG);
- optional static-shape collation (``pad_batch_static``) so every batch
  compiles once.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable

import numpy as np

from weed_instance_segmentation_tpu.datasets.dataset_utils import collate_fn


class DataLoader:
    """Iterates ``dataset`` in batches. drop_last=False like torch's default
    (the reference keeps partial final batches)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        collate: Callable = collate_fn,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``process_count > 1`` enables per-host input sharding (SURVEY.md
        §5.8): every host computes the same seed-deterministic global batch
        order, then loads only its contiguous 1/process_count slice of each
        global batch — rows [k·L, (k+1)·L) for host k, L = batch_size /
        process_count, matching the row→device order of the 1-D data mesh
        built from ``jax.devices()``. Short final batches are padded with
        repeats of their last index so every host always yields L samples;
        the true count is reported as ``num_valid`` in the batch dict (the
        engine masks padding out of the loss via ``sample_valid``)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate = collate
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f'batch_size {batch_size} not divisible by process_count {process_count}'
            )
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Align the shuffle sequence with a resumed run: the next __iter__
        draws epoch ``epoch``'s deterministic order (seed + epoch), so a
        process that restarts at epoch k sees the same batches the
        uninterrupted run would have."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _materialize(self, idxs):
        """Load + collate one batch; in multi-process mode, only this host's
        slice of the global index batch."""
        if self.process_count <= 1:
            return self.collate([self.dataset[int(i)] for i in idxs])
        n = len(idxs)
        local_bs = self.batch_size // self.process_count
        padded = np.concatenate([idxs, np.repeat(idxs[-1], self.batch_size - n)])
        lo = self.process_index * local_bs
        local = padded[lo : lo + local_bs]
        batch = self.collate([self.dataset[int(i)] for i in local])
        batch['num_valid'] = int(np.clip(n - lo, 0, local_bs))
        return batch

    def __iter__(self):
        batches = self._index_batches()
        self._epoch += 1
        if self.prefetch <= 0:
            for idxs in batches:
                yield self._materialize(idxs)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    q.put(self._materialize(idxs))
            except Exception as e:  # surface loader errors in the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_iterator(it, depth: int = 2):
    """Run ``it`` in a background thread, keeping up to ``depth`` items
    ready ahead of the consumer.

    The second half of the host→HBM overlap: DataLoader's prefetch hides
    sample loading/decoding, but the engine still does static-pad collation
    (tens of MB of memcpy per batch) and the device transfer on the
    consumer thread. Wrapping the *device-batch* generator in this moves
    that work into the step's device-compute window — numpy copies and
    ``device_put`` release the GIL, so even one host core overlaps them
    with the dispatched step. Exceptions in ``it`` re-raise in the
    consumer; abandoning the iterator stops the thread."""
    if depth <= 0:
        yield from it
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in it:
                if not _put(item):
                    return
        except Exception as e:  # re-raised in the consumer
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
