"""Rank-sharded, epoch-seeded, enlarge-ratio sampler.

Behavioral rebuild of reference basicsr/data/data_sampler.py:6-48: the
dataset is virtually enlarged by ``ratio`` so iteration-based training
does not restart loader workers every epoch; each host process takes a
strided shard; the shuffle is deterministic per epoch.
"""
import math

import numpy as np


class EnlargedSampler:

    def __init__(self, dataset, num_replicas, rank, ratio=1):
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(
            len(dataset) * ratio / self.num_replicas)
        self.total_size = self.num_samples * self.num_replicas

    def __iter__(self):
        # deterministically shuffle based on epoch
        rng = np.random.default_rng(self.epoch)
        indices = rng.permutation(self.total_size).tolist()

        dataset_size = len(self.dataset)
        indices = [v % dataset_size for v in indices]

        # subsample per rank
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices)

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch):
        self.epoch = epoch
