"""MultiSourceSampler ratio mixing (reference ``datasets/samplers.py:15``)."""

import numpy as np


class _FakeCombined:
    def __init__(self, lens):
        self._lens = list(lens)

    def __len__(self):
        return sum(self._lens)


def test_ratio_mixing_per_batch():
    from probpose_code_tpu.datasets.samplers import MultiSourceSampler

    ds = _FakeCombined([40, 20])
    s = MultiSourceSampler(ds, batch_size=6, source_ratio=[2, 1], seed=3)
    idx = list(iter(s))
    assert len(idx) == len(s)
    assert len(idx) % 6 == 0
    for b in range(len(idx) // 6):
        batch = idx[b * 6:(b + 1) * 6]
        n_src0 = sum(1 for i in batch if i < 40)
        assert n_src0 == 4 and len(batch) - n_src0 == 2  # 2:1 ratio of batch 6


def test_deterministic_given_seed_and_rank_split():
    from probpose_code_tpu.datasets.samplers import MultiSourceSampler

    ds = _FakeCombined([30, 30])
    a = list(iter(MultiSourceSampler(ds, 4, [1, 1], seed=7)))
    b = list(iter(MultiSourceSampler(ds, 4, [1, 1], seed=7)))
    assert a == b

    r0 = list(iter(MultiSourceSampler(ds, 4, [1, 1], seed=7, rank=0, world_size=2)))
    r1 = list(iter(MultiSourceSampler(ds, 4, [1, 1], seed=7, rank=1, world_size=2)))
    # ranks draw disjoint index streams from the same permutation
    assert r0 != r1
