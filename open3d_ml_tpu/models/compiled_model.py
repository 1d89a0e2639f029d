"""AOT-compiled inference wrapper — the TPU-native analog of the
reference's OpenVINO backend (/root/reference/ml3d/torch/models/
openvino_model.py:17-143).

The reference wraps a trained torch model, exports its graph to ONNX on
first use, and routes subsequent forwards through the OpenVINO engine while
delegating everything else (preprocess/transform/inference_end/cfg) to the
wrapped model. On TPU the compiled-engine role is played by XLA ahead-of-
time compilation: `CompiledModel` lowers the jitted forward once per input
shape signature with `jax.jit(...).lower(...).compile()`, caches the
executable, and can serialize the lowered StableHLO for deployment without
Python model code (see open3d_ml_tpu/export.py).
"""

import logging

import jax
import numpy as np

log = logging.getLogger(__name__)


def _shape_key(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return tuple((tuple(np.shape(x)), np.asarray(x).dtype.str)
                 for x in leaves)


class CompiledModel:
    """Wraps a model + trained variables behind AOT-compiled forwards.

    Usage::

        wrapped = CompiledModel(model, variables)
        out = wrapped(batch)              # compiles once per shape signature
        wrapped.export("/path/model")     # StableHLO for the last signature

    Everything not defined here (preprocess, transform, inference_end, cfg,
    ...) is delegated to the wrapped model, mirroring the reference wrapper's
    passthrough behavior (openvino_model.py:133-143).
    """

    def __init__(self, base_model, variables, donate_variables=False):
        self.base_model = base_model
        self.variables = variables
        self._compiled = {}
        self._last_batch = None

        net = base_model.get_net()

        def fwd(variables, batch):
            return net.apply(variables, batch, training=False)

        self._jit_fwd = jax.jit(fwd)

    def __call__(self, batch):
        key = _shape_key(batch)
        exe = self._compiled.get(key)
        if exe is None:
            log.info("CompiledModel: AOT-compiling forward for signature "
                     f"{key[:2]}... ({len(self._compiled)} cached)")
            exe = self._jit_fwd.lower(self.variables, batch).compile()
            self._compiled[key] = exe
        self._last_batch = batch
        return exe(self.variables, batch)

    # reference parity: model(inputs) and model.forward(inputs)
    forward = __call__

    def export(self, out_dir, formats=("stablehlo",)):
        """Serialize the forward for the most recent input signature (see
        export.py for the format details)."""
        if self._last_batch is None:
            raise RuntimeError("run at least one batch before export() so "
                               "the input signature is known")
        from ..export import export_model
        return export_model(self.base_model, self.variables,
                            self._last_batch, out_dir, formats=formats)

    def __getattr__(self, name):
        # only called for attributes not found on self
        return getattr(self.base_model, name)
