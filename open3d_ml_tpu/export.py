"""Model export: StableHLO and TensorFlow SavedModel.

The reference's deployment path is OpenVINO ONNX export
(/root/reference/ml3d/torch/models/openvino_model.py:17-143, CPU/GPU/VPU
inference). The TPU-native analog exports the jitted forward:

* ``export_stablehlo`` — portable StableHLO via jax.export (runs anywhere an
  XLA/PJRT runtime exists, including IREE and TF),
* ``export_savedmodel`` — TensorFlow SavedModel via jax2tf for serving
  stacks.
"""

import logging
from pathlib import Path

log = logging.getLogger(__name__)


def export_stablehlo(fn, example_args, path):
    """Serialize a jittable fn to StableHLO bytes (portable artifact).

    Args:
        fn: jittable callable.
        example_args: tuple of example inputs (shapes/dtypes define the
            exported signature).
        path: output file (.stablehlo).

    Returns the jax.export.Exported object.
    """
    import jax
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    Path(path).write_bytes(data)
    log.info(f"Exported StableHLO ({len(data)} bytes) to {path}")
    return exported


def load_stablehlo(path):
    """Deserialize an exported artifact; call via ``.call(*args)``."""
    from jax import export as jexport
    return jexport.deserialize(Path(path).read_bytes())


def export_savedmodel(fn, example_args, path):
    """Export a jittable fn as a TF SavedModel (serving deployment)."""
    import tensorflow as tf
    from jax.experimental import jax2tf
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec(a.shape, tf.as_dtype(a.dtype.name))
            for a in example_args
        ])
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, str(path))
    log.info(f"Exported SavedModel to {path}")
    return path


def export_model(model, variables, batch, out_dir, formats=("stablehlo",)):
    """Export a framework model's inference forward.

    Args:
        model: a BaseModel with get_net().
        variables: flax variables for the net.
        batch: example input batch (pytree of arrays).
        out_dir: output directory.
        formats: subset of {"stablehlo", "savedmodel"}.
    """
    import jax
    net = model.get_net()

    def fwd(batch):
        return net.apply(variables, batch, training=False)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = {}
    flat, treedef = jax.tree.flatten(batch)

    def flat_fwd(*leaves):
        return fwd(jax.tree.unflatten(treedef, list(leaves)))

    if "stablehlo" in formats:
        results["stablehlo"] = export_stablehlo(
            flat_fwd, tuple(flat), out_dir / f"{model.name}.stablehlo")
    if "savedmodel" in formats:
        results["savedmodel"] = export_savedmodel(
            flat_fwd, tuple(flat), out_dir / f"{model.name}_savedmodel")
    return results
