"""Dataset wrappers (reference `mmdet/datasets/dataset_wrappers.py`)."""

from __future__ import annotations

import bisect
from typing import List

import numpy as np

from ...utils.registry import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation preserving sub-dataset boundaries — the DA train set is
    `ConcatDataset([source, target])` (`da_configs/_base_/datasets/c2foggy.py:51`)."""

    def __init__(self, datasets: List):
        from ..builder import build_dataset
        self.datasets = [
            d if not isinstance(d, dict) else build_dataset(d)
            for d in datasets
        ]
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets]).tolist()
        self.CLASSES = self.datasets[0].CLASSES

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx: int):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        base = 0 if ds_idx == 0 else self.cumulative_sizes[ds_idx - 1]
        return ds_idx, idx - base

    def __getitem__(self, idx: int):
        ds_idx, local = self._locate(idx)
        return self.datasets[ds_idx][local]

    def get_ann_info(self, idx: int):
        ds_idx, local = self._locate(idx)
        return self.datasets[ds_idx].get_ann_info(local)


@DATASETS.register_module()
class RepeatDataset:
    """Epoch-lengthening repeat (reference `RepeatDataset`)."""

    def __init__(self, dataset, times: int):
        from ..builder import build_dataset
        self.dataset = dataset if not isinstance(dataset, dict) else \
            build_dataset(dataset)
        self.times = times
        self.CLASSES = self.dataset.CLASSES

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx % len(self.dataset))


@DATASETS.register_module()
class ClassBalancedDataset:
    """Repeat-factor sampling by class rarity (reference
    `ClassBalancedDataset`, simplified to label frequencies)."""

    def __init__(self, dataset, oversample_thr: float):
        from ..builder import build_dataset
        self.dataset = dataset if not isinstance(dataset, dict) else \
            build_dataset(dataset)
        self.CLASSES = self.dataset.CLASSES
        freqs = np.zeros(len(self.CLASSES))
        per_img_labels = []
        for i in range(len(self.dataset)):
            labels = set(self.dataset.get_ann_info(i)['labels'].tolist())
            per_img_labels.append(labels)
            for l in labels:
                freqs[l] += 1
        freqs = freqs / max(len(self.dataset), 1)
        cat_repeat = np.maximum(
            1.0, np.sqrt(oversample_thr / np.maximum(freqs, 1e-12)))
        self.indices = []
        for i, labels in enumerate(per_img_labels):
            r = max((cat_repeat[l] for l in labels), default=1.0)
            self.indices.extend([i] * int(np.ceil(r)))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(self.indices[idx])


@DATASETS.register_module()
class MultiImageMixDataset:
    """Wrapper feeding multi-image transforms (reference
    `dataset_wrappers.py:MultiImageMixDataset`): the base dataset runs its
    own (loading) pipeline; this wrapper attaches `num_mix` extra random
    samples as `mix_results` and runs the mix pipeline (Mosaic/MixUp + the
    terminal formatting stages)."""

    def __init__(self, dataset, pipeline, num_mix: int = 3, seed: int = 0):
        from ..builder import build_dataset
        from ..pipelines.transforms import Compose
        self.dataset = dataset if not isinstance(dataset, dict) else \
            build_dataset(dataset)
        self.pipeline = Compose(pipeline)
        self.num_mix = num_mix
        self.CLASSES = self.dataset.CLASSES
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.dataset)

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx)

    def disable_mix(self):
        """YOLOX mode switch (reference `core/hook/yolox_mode_switch_hook.py`):
        drop Mosaic/MixUp/RandomAffine for the final no-aug epochs; the
        terminal formatting stages keep running."""
        skip = {'Mosaic', 'MixUp', 'RandomAffine'}
        from ..pipelines.transforms import Compose
        kept = [t for t in self.pipeline.transforms
                if type(t).__name__ not in skip]
        self.pipeline = Compose.__new__(Compose)
        self.pipeline.transforms = kept
        self.num_mix = 0

    def __getitem__(self, idx):
        results = self.dataset[idx]
        mixes = [self.dataset[int(self._rng.randint(len(self.dataset)))]
                 for _ in range(self.num_mix)]
        results['mix_results'] = mixes
        results['_rng'] = self._rng
        return self.pipeline(results)
