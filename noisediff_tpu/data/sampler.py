"""Deterministic per-process data sharding.

Parity target: DistIterSampler (reference dataloader/data_sampler.py:12-62):
epoch-seeded shuffle identical across hosts, indices taken modulo the dataset
size, disjoint strided shards per rank, with an optional dataset enlargement
ratio. This replaces torch DistributedSampler semantics with a
process_index-driven shard for jax multi-host runs (SURVEY.md §5).
"""
from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np


class StridedShardSampler:
    """Unshuffled strided shard: process `rank` handles indices
    rank, rank+world, ... — used by multi-host bulk generation so each host
    writes a disjoint set of npy patches."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0):
        self.indices_list = list(range(rank, dataset_len, num_replicas))

    def set_epoch(self, epoch: int) -> None:
        pass

    def __iter__(self) -> Iterator[int]:
        return iter(self.indices_list)

    def __len__(self) -> int:
        return len(self.indices_list)


class ShardedIterSampler:
    def __init__(
        self,
        dataset_len: int,
        num_replicas: int = 1,
        rank: int = 0,
        ratio: float = 1.0,
        seed: int = 0,
    ):
        if not (0 <= rank < num_replicas):
            raise ValueError(f"rank {rank} out of range for {num_replicas} replicas")
        self.dataset_len = int(dataset_len)
        self.num_replicas = int(num_replicas)
        self.rank = int(rank)
        self.epoch = 0
        self.seed = seed
        self.num_samples = int(math.ceil(dataset_len * ratio / num_replicas))
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def indices(self) -> List[int]:
        # same-seed permutation on every host; each rank takes a strided shard
        rng = np.random.default_rng(self.seed + self.epoch)
        indices = rng.permutation(self.total_size) % self.dataset_len
        shard = indices[self.rank : self.total_size : self.num_replicas]
        assert len(shard) == self.num_samples
        return shard.tolist()

    def __iter__(self) -> Iterator[int]:
        return iter(self.indices())

    def __len__(self) -> int:
        return self.num_samples
