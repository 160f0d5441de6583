"""Batching data loader with background prefetch + multi-host sharding.

TPU-native replacement for the reference's torch DataLoader usage
(projects/TemporalStereo/TemporalStereo.py:49-70): a thread-pool loader
producing time-major numpy batches; under multi-host each process loads only
its shard (deterministic host slicing, SURVEY §7 hard-part 6).  The native
C++ decode path (native/) plugs into StereoDataset transparently when built.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into batch-major arrays; time-major keys get
    [T, B, ...] layout."""
    from .datasets.base import StereoDataset  # noqa: F401 (doc only)

    out = {}
    keys = samples[0].keys()
    for k in keys:
        stacked = np.stack([s[k] for s in samples])
        if k in ("left", "right", "disp_gt", "disp_gt_right", "T_cam",
                 "inv_T"):
            stacked = np.swapaxes(stacked, 0, 1)  # [B, T, ...] -> [T, B, ...]
        out[k] = np.ascontiguousarray(stacked)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 43, num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = -(-len(self.dataset) // self.num_shards)  # padded shard size
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # deterministic per-host shard: strided slice so every host sees a
        # disjoint subset of samples (windows stay intact)
        idx = idx[self.shard_index::self.num_shards]
        if self.num_shards > 1:
            # pad by wrapping so every host runs the SAME number of batches —
            # a one-batch difference would desync the SPMD collectives and
            # hang the mesh (torch DistributedSampler pads identically)
            target = -(-len(self.dataset) // self.num_shards)
            if len(idx) < target and len(idx) > 0:
                pad = np.resize(idx, target - len(idx))
                idx = np.concatenate([idx, pad])
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        self.epoch += 1
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            batch_idx))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
