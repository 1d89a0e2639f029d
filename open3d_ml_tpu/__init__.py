"""open3d_ml_tpu: a TPU-native (JAX/XLA/Pallas) 3D perception framework.

A from-scratch rebuild of the capabilities of isl-org/Open3D-ML — semantic
segmentation and 3D object detection over point clouds — designed TPU-first:

* one JAX backend instead of torch/tf twins,
* fixed-shape padded/bucketed batches instead of ragged collate pyramids,
* all per-step device work in single jitted step functions,
* Pallas kernels + XLA compositions replacing the reference's external
  C++/CUDA ops (neighbor search, voxelization, sparse conv, NMS, ...),
* scaling via jax.sharding Mesh + shard_map (DP and beyond) instead of DDP.
"""

__version__ = "0.1.0"

from . import utils

__all__ = ["utils", "__version__"]
