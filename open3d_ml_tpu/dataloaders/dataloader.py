"""Dataset-split wrapper: preprocess (+disk cache) -> transform -> sample.

Rebuild of /root/reference/ml3d/torch/dataloaders/torch_dataloader.py:18-97
without the torch dependency: a plain indexable that the BatchLoader (and
tests) drive directly. The cache warm-up loop at init matches the reference.
"""

import logging

from ..utils import Cache, get_hash

log = logging.getLogger(__name__)


class PointCloudDataloader:
    """Wraps a BaseDatasetSplit with the owning model's data pipeline.

    Args:
        dataset: a BaseDatasetSplit.
        preprocess: model.preprocess or None.
        transform: model.transform or None.
        sampler: split sampler (used for steps_per_epoch semantics).
        use_cache: cache preprocess outputs on disk.
        steps_per_epoch: override for len().
    """

    def __init__(self,
                 dataset=None,
                 preprocess=None,
                 transform=None,
                 sampler=None,
                 use_cache=True,
                 steps_per_epoch=None,
                 **kwargs):
        self.dataset = dataset
        self.preprocess = preprocess
        self.transform = transform
        self.sampler = sampler
        self.steps_per_epoch = steps_per_epoch

        if preprocess is not None and use_cache:
            cache_dir = getattr(dataset.cfg, "cache_dir", "./logs/cache")
            assert cache_dir is not None, "cache directory is not given"
            self.cache_convert = Cache(preprocess,
                                       cache_dir=cache_dir,
                                       cache_key=get_hash(repr(preprocess)))
            uncached = [
                idx for idx in range(len(dataset))
                if dataset.get_attr(idx)["name"] not in
                self.cache_convert.cached_ids
            ]
            if len(uncached) > 0:
                for idx in range(len(dataset)):
                    attr = dataset.get_attr(idx)
                    name = attr["name"]
                    if name in self.cache_convert.cached_ids:
                        continue
                    data = dataset.get_data(idx)
                    # inputs are written to cache as a side effect
                    self.cache_convert(name, data, attr)
        else:
            self.cache_convert = None

    def __getitem__(self, index):
        """Returns {'data': transformed sample, 'attr': attributes}."""
        dataset = self.dataset
        index = index % len(dataset)
        attr = dataset.get_attr(index)
        if self.cache_convert:
            data = self.cache_convert(attr["name"])
        elif self.preprocess:
            data = self.preprocess(dataset.get_data(index), attr)
        else:
            data = dataset.get_data(index)
        if self.transform is not None:
            data = self.transform(data, attr)
        return {"data": data, "attr": attr}

    def __len__(self):
        if self.steps_per_epoch is not None:
            return self.steps_per_epoch
        return len(self.dataset)
