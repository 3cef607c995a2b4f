"""Dataset/dataloader construction (reference `mmdet/datasets/builder.py:86,167`).

`build_dataloader` returns a python iterator of stacked numpy batch dicts with
background-thread prefetch — the host side of the input pipeline. Device
placement/sharding happens in `parallel.sharding.put_batch`.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils.registry import DATASETS
from .datasets.wrappers import ConcatDataset
from .samplers.two_stream import GroupBatchSampler, TwoStreamBatchSampler


def build_dataset(cfg) -> object:
    """Registry-driven dataset construction with wrapper handling."""
    return DATASETS.build(dict(cfg))


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack a list of PackDetInputs outputs into a batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class _Prefetcher:
    """Background-thread batch producer (replaces dataloader worker procs)."""

    def __init__(self, gen_fn, depth: int = 2):
        self.gen_fn = gen_fn
        self.depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            try:
                for item in self.gen_fn():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class DataLoader:
    """Epoch-iterable loader.

    For a `ConcatDataset` of exactly two domain-tagged sub-datasets the
    two-stream interleaved sampler is used automatically — the equivalent of
    the fork's `BatchSchedulerSampler` wiring (`datasets/builder.py:167`).
    """

    def __init__(self,
                 dataset,
                 samples_per_batch: int,
                 shuffle: bool = True,
                 seed: int = 0,
                 two_stream: Optional[bool] = None,
                 steps_per_epoch: Optional[int] = None,
                 prefetch: int = 2,
                 drop_last: bool = True):
        self.dataset = dataset
        self.samples_per_batch = samples_per_batch
        if two_stream is None:
            two_stream = isinstance(dataset, ConcatDataset) and \
                len(dataset.datasets) == 2 and \
                getattr(dataset.datasets[0], 'domain', 0) !=  \
                getattr(dataset.datasets[1], 'domain', 0)
        self.two_stream = two_stream
        if two_stream:
            self.sampler = TwoStreamBatchSampler(
                len(dataset.datasets[0]), len(dataset.datasets[1]),
                samples_per_batch, seed, steps_per_epoch)
        else:
            self.sampler = GroupBatchSampler(
                len(dataset), samples_per_batch, shuffle, seed, drop_last)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.sampler)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            for batch_idx in self.sampler:
                yield collate([self.dataset[i] for i in batch_idx])

        if self.prefetch:
            return iter(_Prefetcher(gen, self.prefetch))
        return gen()


def build_dataloader(dataset, samples_per_gpu: int, num_shards: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     **kwargs) -> DataLoader:
    """Global-batch loader: `samples_per_gpu * num_shards` rows per step."""
    return DataLoader(dataset, samples_per_gpu * num_shards, shuffle, seed,
                      **kwargs)
