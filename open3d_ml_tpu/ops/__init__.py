"""TPU-native compute ops: Pallas kernels + XLA compositions.

Device-side replacements for every external C++/CUDA op the reference imports
from the Open3D core wheel (SURVEY.md section 2.3), plus host-side preprocess
ops (grid subsampling).
"""

from .interpolation import (inverse_distance_weights, three_interpolate,
                            three_nn, trilinear_devoxelize,
                            trilinear_voxelize_coords)
from .iou import iou_3d, iou_aligned, iou_bev
from .neighbors import (ball_query, build_knn_pyramid, knn_grid, knn_search,
                        nearest_neighbor, radius_search)
from .nms import multiclass_nms, nms_bev
from .ragged import (RaggedArray, dense_to_ragged_mask, masked_max,
                     masked_mean, ragged_to_dense, reduce_subarrays_sum,
                     row_splits_to_segment_ids, segment_ids_to_row_splits,
                     segment_max, segment_mean, segment_sum)
from .sampling import (furthest_point_sampling, furthest_point_sampling_batch,
                       random_sampling)
from .subsample import grid_subsampling, grid_subsampling_batch
from .voxelize import (VoxelData, gather_voxel_points, voxel_feature_mean,
                       voxelize)

__all__ = [
    "inverse_distance_weights", "three_interpolate", "three_nn",
    "trilinear_devoxelize", "trilinear_voxelize_coords", "iou_3d",
    "iou_aligned", "iou_bev", "ball_query", "build_knn_pyramid", "knn_grid",
    "knn_search",
    "nearest_neighbor", "radius_search", "multiclass_nms", "nms_bev",
    "RaggedArray", "dense_to_ragged_mask", "masked_max", "masked_mean",
    "ragged_to_dense", "reduce_subarrays_sum", "row_splits_to_segment_ids",
    "segment_ids_to_row_splits", "segment_max", "segment_mean", "segment_sum",
    "furthest_point_sampling", "furthest_point_sampling_batch",
    "random_sampling", "grid_subsampling", "grid_subsampling_batch",
    "VoxelData", "gather_voxel_points", "voxel_feature_mean", "voxelize",
]
