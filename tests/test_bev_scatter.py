"""Sorted-cell BEV canvas construction (ops/bev.py): the searchsorted +
gather formulation vs a plain scatter reference, including sentinel
handling and duplicate-free semantics. Replaces the reference's
PointPillarsScatter (/root/reference/ml3d/torch/models/point_pillars.py:
558-617)."""

import numpy as np

import jax.numpy as jnp


def _mk(b=2, v=300, c=16, cells_max=1000, seed=0):
    rng = np.random.default_rng(seed)
    pf = rng.standard_normal((b, v, c)).astype(np.float32)
    nvalid = rng.integers(v // 2, v, b)
    cells = np.zeros((b, v), np.int32)
    for i in range(b):
        cc = np.sort(rng.choice(cells_max, nvalid[i], replace=False))
        cells[i, :nvalid[i]] = cc
        cells[i, nvalid[i]:] = cells_max + np.arange(v - nvalid[i])
    return jnp.asarray(pf), jnp.asarray(cells), nvalid


def _reference(pf, cells, num_cells):
    out = np.zeros((pf.shape[0], num_cells, pf.shape[2]), np.float32)
    for i in range(pf.shape[0]):
        for j in range(pf.shape[1]):
            cl = int(cells[i, j])
            if cl < num_cells:
                out[i, cl] = pf[i, j]
    return out


class TestBevScatterSorted:

    def test_matches_scatter_reference(self):
        from open3d_ml_tpu.ops.bev import bev_scatter_sorted
        pf, cells, _ = _mk()
        out = bev_scatter_sorted(pf, cells, 1000)
        np.testing.assert_allclose(np.asarray(out),
                                   _reference(np.asarray(pf),
                                              np.asarray(cells), 1000),
                                   atol=1e-6)

    def test_dense_and_empty_extremes(self):
        from open3d_ml_tpu.ops.bev import bev_scatter_sorted
        # fully dense: every cell occupied
        pf, _, _ = _mk(b=1, v=64, c=4, cells_max=64, seed=1)
        cells = jnp.arange(64, dtype=jnp.int32)[None, :]
        out = bev_scatter_sorted(pf, cells, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pf),
                                   atol=1e-6)
        # fully empty: all sentinels
        cells = 64 + jnp.arange(64, dtype=jnp.int32)[None, :]
        out = bev_scatter_sorted(pf, cells, 64)
        assert float(jnp.abs(out).max()) == 0.0
