"""Samplers: ratio-based batch mixing across combined datasets.

Parity target: reference ``mmpose/datasets/samplers.py:15``
(MultiSourceSampler): every batch draws a fixed quota from each sub-dataset
of a CombinedDataset, cycling each source infinitely with its own shuffled
stream. NumPy RNG replaces the torch generator; rank/world slicing supports
multi-host sharded loading.
"""

from __future__ import annotations

import itertools
import math
from typing import Iterator, List, Optional, Union

import numpy as np


class MultiSourceSampler:
    def __init__(
        self,
        dataset,
        batch_size: int,
        source_ratio: List[Union[int, float]],
        shuffle: bool = True,
        round_up: bool = True,
        seed: Optional[int] = None,
        rank: int = 0,
        world_size: int = 1,
    ):
        lens = getattr(dataset, "_lens", None)
        assert lens is not None, "MultiSourceSampler requires a CombinedDataset"
        assert isinstance(batch_size, int) and batch_size > 0
        assert len(source_ratio) == len(lens)

        self.rank = rank
        self.world_size = world_size
        self.dataset = dataset
        self.cumulative_sizes = [0] + list(itertools.accumulate(lens))
        self.batch_size = batch_size
        self.source_ratio = source_ratio
        self.num_samples = int(math.ceil(len(dataset) / world_size))
        self.num_per_source = [int(batch_size * sr / sum(source_ratio)) for sr in source_ratio]
        self.num_per_source[0] = batch_size - sum(self.num_per_source[1:])
        assert sum(self.num_per_source) == batch_size
        self.seed = 0 if seed is None else seed
        self.shuffle = shuffle
        self.round_up = round_up
        self.source2inds = {
            source: self._indices_of_rank(n) for source, n in enumerate(lens)
        }

    def _infinite_indices(self, sample_size: int) -> Iterator[int]:
        rng = np.random.RandomState(self.seed)
        while True:
            if self.shuffle:
                yield from rng.permutation(sample_size).tolist()
            else:
                yield from range(sample_size)

    def _indices_of_rank(self, sample_size: int) -> Iterator[int]:
        yield from itertools.islice(self._infinite_indices(sample_size), self.rank, None, self.world_size)

    def __iter__(self) -> Iterator[int]:
        num_iters = self.num_samples // self.batch_size
        for _ in range(num_iters):
            for source, num in enumerate(self.num_per_source):
                for idx in itertools.islice(self.source2inds[source], num):
                    yield idx + self.cumulative_sizes[source]

    def __len__(self) -> int:
        return self.num_samples // self.batch_size * self.batch_size
