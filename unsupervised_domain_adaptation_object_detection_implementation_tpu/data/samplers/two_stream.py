"""Two-stream (source/target) batch index scheduling.

Equivalent of the reference `BatchSchedulerSampler`
(`mmdet/datasets/samplers/batch_sampler.py:10`) redesigned as first-class,
shard-friendly batch construction (SURVEY.md §2.7 note): every batch is
[s, t, s, t, ...] interleaved so that any contiguous split across data-parallel
shards gives each chip an equal number of source and target rows — the
reference's guarantee only held for single-GPU batch-size-2 training.

The shorter stream is reshuffled and recycled, mirroring the reference's
cycle behavior (`batch_sampler.py:51-58`).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np


class TwoStreamBatchSampler:
    def __init__(self, source_size: int, target_size: int,
                 samples_per_batch: int, seed: int = 0,
                 steps_per_epoch: int = None):
        assert samples_per_batch % 2 == 0, \
            'two-stream batches need an even batch size'
        self.source_size = source_size
        self.target_size = target_size
        self.per_stream = samples_per_batch // 2
        self.rng = np.random.RandomState(seed)
        if steps_per_epoch is None:
            steps_per_epoch = (source_size + target_size) // samples_per_batch
        self.steps_per_epoch = max(steps_per_epoch, 1)
        self._src_pool: List[int] = []
        self._tgt_pool: List[int] = []

    def _draw(self, pool: List[int], size: int, n: int) -> List[int]:
        out = []
        while len(out) < n:
            if not pool:
                pool.extend(self.rng.permutation(size).tolist())
            out.append(pool.pop())
        return out

    def __iter__(self) -> Iterator[List[int]]:
        """Yield batches of global indices into ConcatDataset([src, tgt]):
        source indices in [0, source_size), target offset by source_size."""
        for _ in range(self.steps_per_epoch):
            src = self._draw(self._src_pool, self.source_size, self.per_stream)
            tgt = self._draw(self._tgt_pool, self.target_size, self.per_stream)
            batch = []
            for s, t in zip(src, tgt):
                batch.append(s)
                batch.append(self.source_size + t)
            yield batch

    def __len__(self):
        return self.steps_per_epoch


class GroupBatchSampler:
    """Plain shuffled batch sampler (replaces `GroupSampler` — aspect-ratio
    grouping is unnecessary here because the static canvas makes every
    padded image the same shape)."""

    def __init__(self, dataset_size: int, samples_per_batch: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.dataset_size = dataset_size
        self.samples_per_batch = samples_per_batch
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __iter__(self):
        idx = np.arange(self.dataset_size)
        if self.shuffle:
            self.rng.shuffle(idx)
        n_full = self.dataset_size // self.samples_per_batch
        for b in range(n_full):
            yield idx[b * self.samples_per_batch:(b + 1) *
                      self.samples_per_batch].tolist()
        rem = self.dataset_size % self.samples_per_batch
        if rem and not self.drop_last:
            # pad final batch by wrapping (keeps shapes static)
            tail = idx[-rem:].tolist()
            tail += idx[:self.samples_per_batch - rem].tolist()
            yield tail

    def __len__(self):
        n_full = self.dataset_size // self.samples_per_batch
        if not self.drop_last and self.dataset_size % self.samples_per_batch:
            return n_full + 1
        return n_full
