"""Batching data loader (torch-free) with resumable iteration.

Role parity: torch DataLoader + the reference's `skip_first_batches`
mid-epoch-resume helper (src/util/data_loader.py:54-140). The host is the
bottleneck-free side on TPU (single Python process feeding one chip over a
queue); a background thread prefetches while the device computes.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterable, Optional, Sequence

import numpy as np


_WORKER_DATASET_COLLATE = None  # set before fork; inherited by workers


def _assemble_batch_worker(args):
    batch_idx, seed = args
    # deterministic augmentations: forked children are reseeded from OS
    # entropy by CPython's at-fork hook, so restore a per-batch seed
    # derived from the loader's rng (the torch-DataLoader worker-seeding
    # role)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    dataset, collate_fn = _WORKER_DATASET_COLLATE
    return collate_fn([dataset[i] for i in batch_idx])


def default_collate(samples: Sequence[dict]) -> dict:
    """Stack numpy leaves along a new batch dim; pass through non-arrays as
    lists."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[k] = np.stack(vals, 0)
        elif isinstance(first, (int, float, np.integer, np.floating, bool)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        batch_sampler=None,
        drop_last: bool = False,
        seed: Optional[int] = None,
        collate_fn=default_collate,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        """num_workers > 0 assembles batches in forked worker processes
        (reference DataLoader num_workers, config train_*.yaml) — decode +
        augmentation scale with host cores; 0 keeps the single background
        prefetch thread."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.batch_sampler = batch_sampler
        self.drop_last = drop_last
        self.rng = random.Random(seed)
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.num_workers = int(num_workers)
        self._skip = 0

    def _batches(self) -> Iterable[list]:
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            batch = idx[s : s + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def skip_first_batches(self, n: int) -> "DataLoader":
        """Resume mid-epoch: the next iteration skips its first n batches
        (contract of reference skip_first_batches, data_loader.py:54-97)."""
        self._skip = n
        return self

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        skip = self._skip
        self._skip = 0
        batch_lists = [b for bi, b in enumerate(self._batches()) if bi >= skip]

        if self.num_workers > 0:
            yield from self._iter_workers(batch_lists)
            return

        def produce(q: queue.Queue):
            try:
                for batch_idx in batch_lists:
                    samples = [self.dataset[i] for i in batch_idx]
                    q.put(("item", self.collate_fn(samples)))
            except Exception as e:  # propagate to consumer
                q.put(("error", e))
            finally:
                q.put(("end", None))

        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            kind, payload = q.get()
            if kind == "item":
                yield payload
            elif kind == "error":
                raise payload
            else:
                return

    def _iter_workers(self, batch_lists):
        """Forked worker pool assembling whole batches in order, with a
        bounded submission window (num_workers + prefetch outstanding) so
        finished batches cannot pile up in host RAM when the consumer
        pauses (e.g. during a multi-minute validation pass).

        Each batch carries a seed drawn from the loader's rng, restored in
        the worker before assembly, so seeded runs reproduce their
        augmentations (forked children are otherwise reseeded from OS
        entropy). Caveat (shared with torch's fork-based workers): fork
        after accelerator-runtime initialization can inherit locks held by
        runtime threads; the training CLI iterates the loader only from
        the host thread between device steps, which is the supported
        pattern."""
        import itertools
        import multiprocessing as mp
        from collections import deque

        ctx = mp.get_context("fork")
        seeds = [self.rng.randrange(2**31) for _ in batch_lists]
        global _WORKER_DATASET_COLLATE
        _WORKER_DATASET_COLLATE = (self.dataset, self.collate_fn)
        window = self.num_workers + max(self.prefetch, 1)
        with ctx.Pool(self.num_workers) as pool:
            work = iter(zip(batch_lists, seeds))
            pending = deque(
                pool.apply_async(_assemble_batch_worker, (a,))
                for a in itertools.islice(work, window)
            )
            while pending:
                batch = pending.popleft().get()
                nxt = next(work, None)
                if nxt is not None:
                    pending.append(
                        pool.apply_async(_assemble_batch_worker, (nxt,))
                    )
                yield batch
