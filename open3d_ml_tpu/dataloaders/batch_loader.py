"""Prefetching batch iterator: host transforms overlapped with device steps.

Replaces the reference's torch DataLoader worker processes
(/root/reference/ml3d/torch/pipelines/semantic_segmentation.py:352-361) with a
thread-pool pipeline: sample indices come from the split sampler, per-sample
transforms run in worker threads (numpy/scipy release the GIL in the heavy
parts), collated batches are queued ahead of consumption. Device transfer is
left to the consumer (pipelines call jax.device_put with sharding).
"""

import queue
import threading

import numpy as np


class BatchLoader:
    """Iterable over collated batches with background prefetch.

    Args:
        dataloader: a PointCloudDataloader.
        batch_size: samples per batch.
        batcher: object with collate_fn(list_of_samples).
        num_workers: transform threads (0 = synchronous).
        prefetch: number of batches to stage ahead.
        sampler: optional cloud sampler (uses get_cloud_sampler() order);
            falls back to sequential order.
        seed: base RNG seed for per-sample transform rngs.
    """

    def __init__(self,
                 dataloader,
                 batch_size,
                 batcher,
                 num_workers=2,
                 prefetch=2,
                 sampler=None,
                 drop_last=False,
                 seed=None):
        self.dataloader = dataloader
        self.batch_size = batch_size
        self.batcher = batcher
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.sampler = sampler
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataloader)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_iter(self):
        n = len(self.dataloader)
        if self.sampler is not None and hasattr(self.sampler,
                                                "get_cloud_sampler"):
            it = self.sampler.get_cloud_sampler()
            count = 0
            for idx in it:
                yield idx
                count += 1
                if count >= n:
                    break
        else:
            yield from range(n)

    def _batches_of_indices(self):
        batch = []
        for idx in self._index_iter():
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self):
        if self.num_workers <= 0:
            for idxs in self._batches_of_indices():
                yield self.batcher.collate_fn(
                    [self.dataloader[i] for i in idxs])
            return

        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        def producer():
            try:
                for idxs in self._batches_of_indices():
                    samples = [self.dataloader[i] for i in idxs]
                    q.put(self.batcher.collate_fn(samples))
            except BaseException as e:  # surfaced in the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]
