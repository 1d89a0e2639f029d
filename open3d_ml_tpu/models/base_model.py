"""Base model contracts for semantic segmentation and object detection.

Rebuild of /root/reference/ml3d/torch/models/base_model.py:10-113 and
base_model_objdet.py:11-94 for JAX: a model owns

* its host-side data pipeline — ``preprocess(data, attr)`` (expensive,
  cacheable) and ``transform(data, attr)`` (per-sample; must emit
  fixed-shape numpy arrays for XLA),
* a flax ``nn.Module`` network (``get_net()``), applied functionally by the
  pipelines inside jitted step functions,
* loss construction (``get_loss``) and optimizer wiring (``get_optimizer``
  returning an optax GradientTransformation + schedule).

Unlike the torch reference, parameters/optimizer state live outside the model
object (pytrees threaded through jit) — the model is pure configuration +
host logic.
"""

from abc import ABC, abstractmethod

import numpy as np

from ..utils import Config


class BaseModel(ABC):
    """Base for semantic segmentation models."""

    def __init__(self, **kwargs):
        self.cfg = Config(kwargs)
        self.name = self.cfg.name
        self.rng = np.random.default_rng(self.cfg.get("seed", None))
        # set by the dataloader: callable giving (pc, idxs, center) patches
        self.trans_point_sampler = None

    @abstractmethod
    def get_net(self):
        """Return the flax nn.Module implementing the network."""

    @abstractmethod
    def preprocess(self, data, attr):
        """Expensive per-cloud host preprocessing (cached on disk)."""

    @abstractmethod
    def transform(self, data, attr):
        """Per-sample host transform -> dict of fixed-shape numpy arrays."""

    @abstractmethod
    def get_loss(self, Loss, results, inputs):
        """Compute (loss, labels, scores) from network output + batch."""

    @abstractmethod
    def get_optimizer(self, cfg_pipeline):
        """Return (optax_tx, lr_schedule_or_None)."""

    def get_eval_net(self):
        """Network used by ``run_test``/``run_inference``.

        Models whose training/bench net takes approximate shortcuts
        (e.g. RandLA-Net's fused bucket-KNN) override this to return an
        exact-path net sharing the same parameter tree, so that reported
        accuracy is never silently measured through an approximation
        (reference eval protocol: ml3d/torch/pipelines/
        semantic_segmentation.py:189-269). Default: the training net.
        """
        return self.get_net()

    def regularizer_loss(self, aux_collections):
        """Extra loss from auxiliary variable collections returned by the
        train-step apply (e.g. KPConv's sown "p2p_reg" terms). Default 0."""
        return 0.0

    def init_variables(self, rng_key, sample_batch, training=False):
        """Initialize flax variables ({params, batch_stats?}) from a batch."""
        import jax
        net = self.get_net()
        return net.init(
            {"params": rng_key, "dropout": jax.random.fold_in(rng_key, 1)},
            sample_batch, training=training)

    def inference_begin(self, data):
        raise NotImplementedError

    def inference_preprocess(self):
        raise NotImplementedError

    def inference_end(self, inputs, results):
        raise NotImplementedError
