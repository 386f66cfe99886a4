"""Host-side data loader: shuffling, collation, background prefetch.

Replaces torch.utils.data.DataLoader (reference train.py:641-645). Decode
happens on worker threads (cv2 releases the GIL inside C++ decode) while the
TPU runs the previous step; batches are numpy trees ready for device_put.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def default_collate(items):
    """Stack numpy leaves; pass through non-arrays as lists (the reference
    batch carries 'text_prompt'/'dataset' strings)."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True,
                 collate_fn=default_collate, prefetch: int = 2,
                 pad_last: bool = False, num_shards: int = 1,
                 shard_index: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        # pad_last: wrap-around-pad every batch to full size (torch
        # DistributedSampler semantics) so a fixed global batch can always
        # be sharded over the 'dp' mesh axis without recompilation
        self.pad_last = pad_last
        self.drop_last = drop_last and not pad_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        # multi-host: batch_size is the GLOBAL batch; every host draws the
        # same seeded index permutation and loads only its contiguous
        # 1/num_shards slice of each global batch (the host-local data that
        # jax.make_array_from_process_local_data assembles into one global
        # array over DCN)
        assert batch_size % max(num_shards, 1) == 0, (
            f"global batch {batch_size} not divisible by {num_shards} hosts")
        self.num_shards = max(num_shards, 1)
        self.shard_index = shard_index
        self._epoch = 0
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        n = (len(indices) // self.batch_size * self.batch_size
             if self.drop_last else len(indices))
        local = self.batch_size // self.num_shards
        for i in range(0, n, self.batch_size):
            batch = indices[i:i + self.batch_size]
            if self.pad_last and len(batch) < self.batch_size:
                reps = -(-self.batch_size // len(indices))  # ceil
                pool = np.concatenate([indices] * (reps + 1))
                batch = np.concatenate(
                    [batch, pool[:self.batch_size - len(batch)]])
            if self.num_shards > 1:
                batch = batch[self.shard_index * local:
                              (self.shard_index + 1) * local]
            yield batch

    def __iter__(self) -> Iterator:
        self._epoch += 1
        if self.num_workers == 0:
            for batch_idx in self._batches():
                yield self.collate_fn([self.dataset[int(i)]
                                       for i in batch_idx])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batch_list = list(self._batches())
        stop = threading.Event()

        def worker():
            try:
                for batch_idx in batch_list:
                    if stop.is_set():
                        break
                    items = [self.dataset[int(i)] for i in batch_idx]
                    out_q.put(self.collate_fn(items))
            except Exception as e:  # surface errors on the consumer side
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
