"""Ragged/padding substrate: the keystone of the TPU-first design.

The reference flows ragged (values, row_splits) tensors through external C++
ops (`ragged_to_dense` at /root/reference/ml3d/torch/models/kpconv.py:2030,
`reduce_subarrays_sum` at sparseconvnet.py:320). XLA needs static shapes, so
here ragged data lives as (values, row_splits) pairs with *static* total
lengths, and every consumer converts to dense padded form with masks. All ops
are pure jnp compositions (scatter/gather) that XLA fuses and tiles well.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RaggedArray(NamedTuple):
    """A batch of variable-length rows: values[T, ...], row_splits[R+1].

    ``values`` has a static leading dim T (padded); entries at positions
    >= row_splits[-1] are padding. row_splits is int32, monotonically
    non-decreasing, row_splits[0] == 0.
    """
    values: jax.Array
    row_splits: jax.Array

    @property
    def num_rows(self):
        return self.row_splits.shape[0] - 1

    def row_lengths(self):
        return self.row_splits[1:] - self.row_splits[:-1]


def row_splits_to_segment_ids(row_splits, total):
    """Map each of ``total`` flat positions to its row id.

    Positions beyond row_splits[-1] (padding) get id == num_rows (one past the
    last row) so they can be dropped by segment ops with num_segments=R.
    """
    pos = jnp.arange(total, dtype=row_splits.dtype)
    return jnp.searchsorted(row_splits, pos, side="right").astype(jnp.int32) - 1


def segment_ids_to_row_splits(segment_ids, num_rows):
    """Inverse of row_splits_to_segment_ids: count per-row then cumsum."""
    counts = jnp.bincount(segment_ids, length=num_rows)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts).astype(jnp.int32)])


def ragged_to_dense(values, row_splits, num_rows, num_cols, default_value=0):
    """Pack ragged values into a dense [num_rows, num_cols, ...] tensor.

    TPU-native equivalent of the reference's `ragged_to_dense` op
    (/root/reference/ml3d/torch/models/point_pillars.py:366): rows longer than
    num_cols are truncated; shorter rows are padded with default_value.
    Entirely scatter-based; static output shape.
    """
    total = values.shape[0]
    seg = row_splits_to_segment_ids(row_splits, total)
    col = jnp.arange(total, dtype=jnp.int32) - row_splits[seg]
    valid = (seg >= 0) & (seg < num_rows) & (col < num_cols)
    # Out-of-bounds rows/cols are dropped by scatter mode='drop'.
    seg_c = jnp.where(valid, seg, num_rows)
    col_c = jnp.where(valid, col, num_cols)
    tail = values.shape[1:]
    out = jnp.full((num_rows, num_cols) + tail, default_value, values.dtype)
    return out.at[seg_c, col_c].set(values, mode="drop")


def dense_to_ragged_mask(row_lengths, num_cols):
    """Boolean mask [R, num_cols] marking valid entries per row."""
    col = jnp.arange(num_cols, dtype=jnp.int32)[None, :]
    return col < row_lengths[:, None]


def reduce_subarrays_sum(values, row_splits):
    """Segment-sum over row_splits (reference `reduce_subarrays_sum`,
    /root/reference/ml3d/torch/models/sparseconvnet.py:320-326)."""
    total = values.shape[0]
    num_rows = row_splits.shape[0] - 1
    seg = row_splits_to_segment_ids(row_splits, total)
    return jax.ops.segment_sum(values, seg, num_segments=num_rows)


def segment_sum(values, segment_ids, num_segments):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_mean(values, segment_ids, num_segments):
    s = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    ones = jnp.ones((values.shape[0],) + (1,) * (values.ndim - 1),
                    values.dtype)
    n = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return s / jnp.maximum(n, 1)


def segment_max(values, segment_ids, num_segments, initial=None):
    return jax.ops.segment_max(values, segment_ids,
                               num_segments=num_segments)


def masked_max(values, mask, axis, initial=-jnp.inf):
    """Max over ``axis`` counting only mask==True entries."""
    neg = jnp.asarray(initial, values.dtype)
    return jnp.max(jnp.where(mask, values, neg), axis=axis)


def masked_mean(values, mask, axis):
    mask_f = mask.astype(values.dtype)
    s = jnp.sum(values * mask_f, axis=axis)
    n = jnp.maximum(jnp.sum(mask_f, axis=axis), 1)
    return s / n
