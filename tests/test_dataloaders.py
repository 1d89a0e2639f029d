"""Dataloader layer tests: prefetching BatchLoader, batchers, disk cache
(reference torch_dataloader.py / default_batcher.py / concat_batcher.py)."""

import numpy as np


class _Split:

    def __init__(self, n=10, points=64):
        rng = np.random.default_rng(0)
        self.clouds = [
            {"point": rng.uniform(0, 5, (points, 3)).astype(np.float32),
             "label": rng.integers(0, 4, points).astype(np.int32)}
            for _ in range(n)
        ]
        self.split = "training"

        class _Cfg:
            cache_dir = None

        self.cfg = _Cfg()

    def __len__(self):
        return len(self.clouds)

    def get_data(self, idx):
        return self.clouds[idx]

    def get_attr(self, idx):
        return {"name": f"c{idx}", "split": self.split, "idx": idx}


class TestBatchLoader:

    def _loader(self, num_workers, batch_size=4, n=10):
        from open3d_ml_tpu.dataloaders import (BatchLoader, DefaultBatcher,
                                               PointCloudDataloader)
        pcl = PointCloudDataloader(dataset=_Split(n), preprocess=None,
                                   transform=None, sampler=None,
                                   use_cache=False)
        return BatchLoader(pcl, batch_size, DefaultBatcher(),
                           num_workers=num_workers, seed=0)

    def test_sync_and_threaded_agree_on_shapes(self):
        for workers in (0, 2):
            batches = list(self._loader(workers))
            assert len(batches) == 3  # 10 samples / 4 -> 3 batches
            assert batches[0]["data"]["point"].shape == (4, 64, 3)
            # last partial batch keeps remaining samples
            assert batches[-1]["data"]["point"].shape[0] == 2

    def test_drop_last(self):
        from open3d_ml_tpu.dataloaders import (BatchLoader, DefaultBatcher,
                                               PointCloudDataloader)
        pcl = PointCloudDataloader(dataset=_Split(10), use_cache=False)
        loader = BatchLoader(pcl, 4, DefaultBatcher(), num_workers=0,
                             drop_last=True)
        assert all(b["data"]["point"].shape[0] == 4 for b in loader)

    def test_all_samples_visited(self):
        seen = set()
        for b in self._loader(2):
            attrs = b["attr"]
            names = attrs["name"] if isinstance(attrs, dict) else \
                [a["name"] for a in attrs]
            seen.update(names)
        assert seen == {f"c{i}" for i in range(10)}


class TestCache:

    def test_preprocess_cached_to_disk(self, tmp_path):
        from open3d_ml_tpu.dataloaders import PointCloudDataloader

        split = _Split(3)
        split.cfg.cache_dir = str(tmp_path)
        calls = []

        def preprocess(data, attr):
            calls.append(attr["name"])
            return {"point": data["point"] * 2.0}

        p1 = PointCloudDataloader(dataset=split, preprocess=preprocess,
                                  use_cache=True)
        assert sorted(calls) == ["c0", "c1", "c2"]  # warm-up fills cache
        first = p1[0]["data"]["point"].copy()

        calls.clear()
        p2 = PointCloudDataloader(dataset=split, preprocess=preprocess,
                                  use_cache=True)
        assert calls == []  # second loader reuses the disk cache
        np.testing.assert_allclose(p2[0]["data"]["point"], first)
