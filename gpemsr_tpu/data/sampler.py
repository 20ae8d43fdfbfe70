"""Epoch-seeded, host-sharded sampling + a threaded prefetching loader.

Replicates DistIterSampler semantics (data/data_sampler.py:7-60): permute
ratio*len(dataset) indices with the epoch as seed, take every host_count-th
starting at host_id — identical across hosts, so shards are disjoint. The
loader assembles global batches per host shard and prefetches on threads
(the reference's worker processes; threads suffice since decoding is
numpy/PIL releasing the GIL)."""

from __future__ import annotations

import threading
from typing import Iterator

import numpy as np


class EpochShardSampler:
    def __init__(self, dataset_len: int, host_id: int = 0, host_count: int = 1,
                 ratio: int = 200, base_seed: int = 0):
        self.n = dataset_len
        self.host_id = host_id
        self.host_count = host_count
        self.ratio = ratio
        self.base_seed = base_seed
        self.num_samples = int(np.ceil(self.n * ratio / host_count))
        self.total = self.num_samples * host_count

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.base_seed + epoch)
        idx = rng.permutation(self.total) % self.n
        return idx[self.host_id:self.total:self.host_count]


class Loader:
    """Threaded prefetching batch loader over an indexable dataset whose
    __getitem__ takes (index, seed)."""

    def __init__(self, dataset, batch_size: int, sampler: EpochShardSampler,
                 num_workers: int = 4, prefetch: int = 4, collate=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate = collate or _default_collate

    def epoch(self, epoch: int) -> Iterator:
        """Ordered batch stream for one epoch. Condition-variable hand-off so
        workers always terminate: if the consumer abandons the generator
        (break / exception), the `finally` closes the epoch and every worker
        exits instead of blocking on a full queue forever. Worker exceptions
        are re-raised in the consumer rather than hanging it."""
        indices = self.sampler.epoch_indices(epoch)
        n_batches = len(indices) // self.batch_size  # drop_last=True
        window = self.prefetch + self.num_workers    # max batches in flight

        cond = threading.Condition()
        results: dict = {}
        state = {"next_job": 0, "next_emit": 0, "closed": False}

        class _Failure:
            def __init__(self, exc):
                self.exc = exc

        def make_batch(b: int):
            batch_idx = indices[b * self.batch_size:(b + 1) * self.batch_size]
            # augmentation seed keyed to the GLOBAL permutation position, so
            # a sample draws the same crop/flip regardless of how the epoch
            # is sharded across hosts (host_count=1 reduces to the local
            # position) — required for single- vs multi-process loss parity
            hid, hc = self.sampler.host_id, self.sampler.host_count
            samples = [self.dataset[(int(i), (epoch << 32)
                                     ^ ((b * self.batch_size + j) * hc + hid))]
                       for j, i in enumerate(batch_idx)]
            return self.collate(samples)

        def worker():
            while True:
                with cond:
                    while (not state["closed"] and state["next_job"] < n_batches
                           and state["next_job"] - state["next_emit"] >= window):
                        cond.wait()
                    if state["closed"] or state["next_job"] >= n_batches:
                        return
                    b = state["next_job"]
                    state["next_job"] += 1
                try:
                    batch = make_batch(b)
                except BaseException as e:   # surfaced to the consumer
                    batch = _Failure(e)
                with cond:
                    results[b] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for i in range(n_batches):
                with cond:
                    while i not in results:
                        cond.wait()
                    batch = results.pop(i)
                    state["next_emit"] = i + 1
                    cond.notify_all()
                if isinstance(batch, _Failure):
                    raise batch.exc
                yield batch
        finally:
            with cond:
                state["closed"] = True
                results.clear()
                cond.notify_all()
            for t in threads:
                t.join(timeout=5.0)


def _default_collate(samples):
    if isinstance(samples[0], dict):
        return {k: np.stack([s[k] for s in samples], 0) for k in samples[0]}
    if isinstance(samples[0], tuple):
        return tuple(np.stack([s[i] for s in samples], 0)
                     for i in range(len(samples[0])))
    return np.stack(samples, 0)
