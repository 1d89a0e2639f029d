"""Base pipeline: device/mesh resolution, log dirs, summary config.

Rebuild of /root/reference/ml3d/torch/pipelines/base_pipeline.py:12-96. The
reference blocks distributed semseg and CPU-distributed runs; here every
pipeline is mesh-native — a single program over however many chips
jax.devices() reports (1 on a dev box, N on a pod slice).
"""

import logging
from abc import ABC, abstractmethod
from os.path import join

import numpy as np

from ..parallel import make_mesh
from ..utils import Config, make_dir

log = logging.getLogger(__name__)


def _enable_compile_cache():
    """Point JAX at a persistent compilation cache (once per process).

    Full-size train-step compiles run minutes cold; with the cache a
    re-run of the same program is seconds. Opt out / relocate with
    OPEN3D_ML_TPU_COMPILE_CACHE=0 / =/path. The same cache directory is
    shared by bench.py and parallel/dryrun.py.
    """
    import os
    loc = os.environ.get("OPEN3D_ML_TPU_COMPILE_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "open3d_ml_tpu", "jax_cache")
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", loc)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


class BasePipeline(ABC):
    """Base for SemanticSegmentation / ObjectDetection pipelines."""

    def __init__(self, model, dataset=None, device="tpu", distributed=False,
                 **kwargs):
        if kwargs.get("name") is None:
            raise KeyError("Provide pipeline name to initialize it")

        self.cfg = Config(kwargs)
        self.name = self.cfg.name
        self.model = model
        self.dataset = dataset
        self.rng = np.random.default_rng(kwargs.get("seed", None))
        _enable_compile_cache()

        # "distributed" is implicit: the mesh spans all visible devices.
        self.mesh = make_mesh(
            model_parallel=int(self.cfg.get("model_parallel", 1)))
        self.num_devices = int(np.prod(self.mesh.devices.shape))
        self.device = device

        dataset_name = dataset.name if dataset is not None else ""
        self.cfg.logs_dir = join(
            self.cfg.main_log_dir,
            model.__class__.__name__ + "_" + dataset_name + "_jax")
        make_dir(self.cfg.main_log_dir)
        make_dir(self.cfg.logs_dir)

        self.summary = {}
        if "summary" not in self.cfg:
            self.cfg.cfg_dict["summary"] = {}

    def _shard_arrays(self, arrays):
        """Device-put a dict of host arrays: batch-sharded over the mesh
        data axis when the leading dim divides evenly, replicated otherwise
        (e.g. tiny test batches). jit picks shardings up from placement."""
        import jax
        from ..parallel import batch_sharding, replicated_sharding
        dp = self.mesh.devices.shape[0]

        def put(x):
            if (hasattr(x, "shape") and x.ndim > 0 and
                    x.shape[0] % dp == 0):
                return jax.device_put(x, batch_sharding(self.mesh))
            return jax.device_put(x, replicated_sharding(self.mesh))

        return jax.tree.map(put, arrays)

    @abstractmethod
    def run_inference(self, data):
        """Run inference on one datum."""

    @abstractmethod
    def run_test(self):
        """Run testing on the test split."""

    @abstractmethod
    def run_train(self):
        """Run training on the train split."""
