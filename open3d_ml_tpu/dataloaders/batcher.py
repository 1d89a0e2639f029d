"""Batchers: collate per-sample dicts into fixed-shape batched numpy arrays.

The reference's DefaultBatcher (torch default_collate,
/root/reference/ml3d/torch/dataloaders/default_batcher.py:38-94) stacks
fixed-size tensors; its ConcatBatcher builds ragged concat batches. Here
everything must leave the batcher with a static shape, so DefaultBatcher
stacks (models emit fixed-size patches) and ConcatBatcher pads to per-batch
caps declared by the model.
"""

import numpy as np


class DefaultBatcher:
    """Stacks same-shaped numpy arrays along a new leading batch axis.

    Lists of per-layer arrays (e.g. host-precomputed KNN pyramids) are
    stacked per layer. Non-array entries are collected into lists.
    """

    def collate_fn(self, batch):
        if len(batch) == 0:
            return {}
        elem = batch[0]
        if isinstance(elem, dict):
            return {
                key: self.collate_fn([b[key] for b in batch]) for key in elem
            }
        if isinstance(elem, (list, tuple)):
            # per-layer lists of arrays (e.g. host KNN pyramids): collate
            # positionally when lengths agree and entries are arrays;
            # otherwise (e.g. variable-length lists of box objects) keep one
            # entry per sample.
            if (len(elem) > 0 and isinstance(elem[0], np.ndarray) and
                    all(len(b) == len(elem) for b in batch)):
                return [
                    self.collate_fn([b[i] for b in batch])
                    for i in range(len(elem))
                ]
            return list(batch)
        if isinstance(elem, np.ndarray):
            return np.stack(batch, axis=0)
        if isinstance(elem, (int, np.integer)):
            return np.asarray(batch, np.int64)
        if isinstance(elem, (float, np.floating)):
            return np.asarray(batch, np.float64)
        return list(batch)


class ConcatBatcher:
    """Pads per-sample variable-size arrays to model-declared caps and stacks.

    TPU-native replacement for the reference ConcatBatcher
    (/root/reference/ml3d/torch/dataloaders/concat_batcher.py:556-599): rather
    than concatenating ragged samples with row_splits, every sample is padded
    to the model's static caps so the stacked batch has one fixed shape per
    field. The model declares caps via ``model.batch_pad_spec()`` returning
    {field: (max_len, pad_value)}; fields not listed are collated by stacking
    (DefaultBatcher rules). A companion '<field>_count' int array carries the
    true lengths.
    """

    def __init__(self, model_name=None, pad_spec=None):
        self.model_name = model_name
        self.pad_spec = pad_spec or {}
        self._default = DefaultBatcher()

    def _pad(self, arr, max_len, pad_value):
        arr = np.asarray(arr)
        n = arr.shape[0]
        if n >= max_len:
            return arr[:max_len], min(n, max_len)
        pad_width = [(0, max_len - n)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=pad_value), n

    def collate_fn(self, batch):
        if len(batch) == 0:
            return {}
        out = {}
        elem = batch[0]
        assert isinstance(elem, dict), "ConcatBatcher expects dict samples"
        for key in elem:
            vals = [b[key] for b in batch]
            if key in self.pad_spec:
                max_len, pad_value = self.pad_spec[key]
                padded, counts = zip(
                    *[self._pad(v, max_len, pad_value) for v in vals])
                out[key] = np.stack(padded, axis=0)
                out[key + "_count"] = np.asarray(counts, np.int32)
            else:
                out[key] = self._default.collate_fn(vals)
        return out
