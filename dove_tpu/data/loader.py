"""Threaded prefetching data loader (host-side).

Replaces the reference's torch ``DataLoader(num_workers=8, pin_memory=...)``
(reference: finetune/trainer.py:299-306) with a dependency-free executor:
worker threads run ``dataset[i]`` concurrently (the heavy work — cv2 decode,
degradation filtering, codec round-trips — releases the GIL inside OpenCV) and
a bounded queue keeps a few batches ahead of the accelerator.

Collation stacks same-shaped NumPy arrays along a new batch axis; string and
None fields become lists. The iterator yields dicts of NumPy arrays ready for
``jax.device_put`` onto a data-parallel sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Sequence

import numpy as np


def collate(samples: Sequence[dict[str, Any]]) -> dict[str, Any]:
    """Stack a list of sample dicts into one batch dict."""
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(first, dict):
            out[key] = collate(vals)
        else:
            out[key] = vals
    return out


class PrefetchLoader:
    """Iterate batches of `dataset` with worker-thread prefetch.

    Args:
      dataset: indexable with __len__ and __getitem__.
      batch_size: samples per batch (sampler overrides this).
      shuffle: reshuffle indices each epoch (ignored with sampler).
      sampler: optional batch sampler yielding lists of indices
        (e.g. datasets.BucketSampler).
      num_workers: prefetch threads; 0 = synchronous in-loop loading.
      prefetch: max ready batches buffered ahead.
      drop_last: drop the trailing partial batch.
      process_shard: (process_index, process_count) for multi-host training —
        every process builds the SAME global batch order (shared seed) and
        keeps only its slice of each batch, the DistributedSampler analog
        (reference: torch DistributedSampler via accelerate). Requires the
        batch size to divide evenly.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        *,
        shuffle: bool = True,
        sampler=None,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        process_shard: tuple[int, int] = (0, 1),
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.process_shard = process_shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            # per-item RNG streams key on (seed, epoch, index)
            self.dataset.set_epoch(epoch)

    def _batches(self) -> list[list[int]]:
        if self.sampler is not None:
            batches = [list(b) for b in self.sampler]
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.default_rng((self.seed, self._epoch)).shuffle(order)
            batches = [
                [int(i) for i in order[s : s + self.batch_size]]
                for s in range(0, len(order), self.batch_size)
            ]
            if (
                self.drop_last and batches
                and len(batches[-1]) < self.batch_size
            ):
                batches.pop()
        pid, nproc = self.process_shard
        if nproc > 1:
            local = []
            for b in batches:
                if len(b) % nproc:
                    raise ValueError(
                        f"batch of {len(b)} not divisible by "
                        f"process_count {nproc}"
                    )
                k = len(b) // nproc
                local.append(b[pid * k : (pid + 1) * k])
            return local
        return batches

    def __len__(self) -> int:
        return len(self._batches())

    def __iter__(self) -> Iterator[dict[str, Any]]:
        batches = self._batches()
        if self.num_workers <= 0:
            for idxs in batches:
                yield collate([self.dataset[i] for i in idxs])
            return

        todo: queue.Queue = queue.Queue()
        for pos, idxs in enumerate(batches):
            todo.put((pos, idxs))
        done: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # In-order delivery: workers park finished batches here until their turn
        ready: dict[int, Any] = {}
        ready_lock = threading.Lock()
        ready_cv = threading.Condition(ready_lock)
        next_pos = [0]

        def worker():
            while not stop.is_set():
                try:
                    pos, idxs = todo.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = collate([self.dataset[i] for i in idxs])
                    err = None
                except Exception as e:  # surfaced on the consumer side
                    batch, err = None, e
                with ready_cv:
                    while (
                        pos - next_pos[0] >= self.prefetch and not stop.is_set()
                    ):
                        ready_cv.wait(timeout=0.5)
                    ready[pos] = (batch, err)
                    ready_cv.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_workers, len(batches)) or 1)
        ]
        for t in threads:
            t.start()
        try:
            for pos in range(len(batches)):
                with ready_cv:
                    while pos not in ready:
                        ready_cv.wait(timeout=0.5)
                        if not any(t.is_alive() for t in threads) and pos not in ready:
                            raise RuntimeError("data loader workers died")
                    batch, err = ready.pop(pos)
                    next_pos[0] = pos + 1
                    ready_cv.notify_all()
                if err is not None:
                    raise err
                yield batch
        finally:
            stop.set()
            with ready_cv:
                ready_cv.notify_all()
            for t in threads:
                t.join(timeout=2)
