"""Disk cache for expensive per-cloud preprocessing.

Rebuild of /root/reference/ml3d/utils/dataset_helper.py:9-69: a cache keyed by
a hash of the preprocess function's repr, storing one .npy (pickled dict) per
cloud. Non-array objects in the dict (e.g. KD-trees) are pickled transparently
by numpy's object serialization.
"""

import hashlib
import os
from pathlib import Path

import numpy as np


def make_dir(folder_name):
    """Create a directory (and parents) if it does not exist."""
    Path(folder_name).mkdir(parents=True, exist_ok=True)


def get_hash(x: str):
    """Deterministic 64-bit int hash of a string (md5-based)."""
    h = hashlib.md5(x.encode())
    return int(h.hexdigest(), 16) & ((1 << 64) - 1)


class Cache:
    """Cache converter outputs on disk, keyed by sample name.

    Args:
        func: the preprocess callable whose outputs are cached.
        cache_dir: root directory for the cache.
        cache_key: subdirectory name (typically a hash of func's repr).
    """

    def __init__(self, func, cache_dir, cache_key):
        self.func = func
        self.cache_dir = os.path.join(cache_dir, str(cache_key))
        make_dir(self.cache_dir)
        self.cached_ids = [
            p.stem for p in Path(self.cache_dir).glob("*.npy")
        ]

    def __call__(self, unique_id, *data):
        """Return cached output for unique_id, computing+saving on miss."""
        fpath = os.path.join(self.cache_dir, f"{unique_id}.npy")
        if unique_id not in self.cached_ids or not os.path.exists(fpath):
            output = self.func(*data)
            self._write(output, fpath)
            self.cached_ids.append(unique_id)
        else:
            output = self._read(fpath)
        return output

    @staticmethod
    def _write(x, fpath):
        np.save(fpath, np.array(x, dtype=object), allow_pickle=True)

    @staticmethod
    def _read(fpath):
        return np.load(fpath, allow_pickle=True).item()
