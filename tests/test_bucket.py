"""Segment-bucket neighbor ops: recall vs scipy, gather correctness, the
Pallas kernels' XLA-twin equivalence, and the fused RandLA-Net path.

Covers ops/bucket.py + ops/pallas/bucket.py — the execution backbone of the
fused flagship model (see those modules' docstrings for the design and the
reference machinery being replaced: /root/reference/ml3d/torch/models/
randlanet.py:215-232 host KD-trees, open3d.ml CUDA knn/gather ops).
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax
import jax.numpy as jnp


def _lidar_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(2, 50, n)
    th = rng.uniform(0, 2 * np.pi, n)
    return np.stack([r * np.cos(th), r * np.sin(th),
                     rng.uniform(-2, 1, n)], 1).astype(np.float32)


@pytest.mark.slow
class TestBucketKnnXLA:

    def test_recall_uniform(self):
        from open3d_ml_tpu.ops.bucket import (morton_sort, bucket_knn,
                                              global_indices)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-25, 25, (8192, 3)).astype(np.float32)
        _, sp = morton_sort(jnp.asarray(pts))
        sids, rel, d2 = bucket_knn(sp, sp, 16, seg=128, qblock=128,
                                   num_segs=16)
        g = np.asarray(global_indices(sids, rel, seg=128, qblock=128))
        _, ti = cKDTree(np.asarray(sp)).query(np.asarray(sp), k=16)
        recall = (g[:, :, None] == ti[:, None, :]).any(2).mean()
        assert recall > 0.93, recall
        # distances ascending
        dd = np.asarray(d2)
        assert (np.diff(dd, axis=1) >= -1e-6).all()

    def test_recall_lidar_density(self):
        """1/r radial density — the hard case for shared per-block tables.
        Measured 0.799 at S=16 / 0.919 at S=24 with sub-block ranking
        (whole-block ranking measured 0.737 / 0.825); thresholds sit just
        under the measured values to catch selection regressions."""
        from open3d_ml_tpu.ops.bucket import (morton_sort, bucket_knn,
                                              global_indices)
        pts = _lidar_cloud(8192)
        _, sp = morton_sort(jnp.asarray(pts))
        _, ti = cKDTree(np.asarray(sp)).query(np.asarray(sp), k=16)
        for num_segs, floor in ((16, 0.75), (24, 0.88)):
            sids, rel, _ = bucket_knn(sp, sp, 16, seg=128, qblock=128,
                                      num_segs=num_segs)
            g = np.asarray(global_indices(sids, rel, seg=128, qblock=128))
            recall = (g[:, :, None] == ti[:, None, :]).any(2).mean()
            assert recall > floor, (num_segs, recall)

    def test_score_merge_close_to_rank_merge(self):
        """merge='score' (min-over-sub-blocks, no scatter) should track the
        rank merge's segment recall closely — it trades a little recall
        for a cheaper selection stage (see _rank_segments docstring)."""
        from open3d_ml_tpu.ops.bucket import morton_sort, select_segments
        pts = _lidar_cloud(8192)
        _, sp = morton_sort(jnp.asarray(pts))
        _, ti = cKDTree(np.asarray(sp)).query(np.asarray(sp), k=16)
        seg, qb, s = 128, 128, 32
        true_seg = ti // seg                       # [Q, 16]
        qb_ids = np.arange(sp.shape[0]) // qb      # [Q]
        recalls = {}
        for merge in ("rank", "score"):
            sids = np.asarray(select_segments(
                sp[None], sp[None], seg=seg, qblock=qb, num_segs=s,
                merge=merge))[0]                   # [nqb, S]
            table = sids[qb_ids]                   # [Q, S]
            hit = (true_seg[:, :, None] == table[:, None, :]).any(2)
            recalls[merge] = hit.mean()
        assert recalls["score"] > recalls["rank"] - 0.03, recalls
        assert recalls["score"] > 0.85, recalls

    def test_gather_matches_indices(self):
        from open3d_ml_tpu.ops.bucket import (morton_sort, bucket_knn,
                                              gather_bucket,
                                              gather_bucket_max,
                                              global_indices)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-10, 10, (2048, 3)).astype(np.float32)
        _, sp = morton_sort(jnp.asarray(pts))
        sids, rel, _ = bucket_knn(sp, sp, 8, seg=128, qblock=128, num_segs=4)
        vals = jnp.asarray(rng.standard_normal((2048, 8)), jnp.float32)
        out = gather_bucket(vals, sids, rel, seg=128, qblock=128)
        g = np.asarray(global_indices(sids, rel, seg=128, qblock=128))
        np.testing.assert_allclose(np.asarray(out), np.asarray(vals)[g],
                                   atol=1e-6)
        outm = gather_bucket_max(vals, sids, rel, seg=128, qblock=128)
        np.testing.assert_allclose(np.asarray(outm),
                                   np.asarray(vals)[g].max(1), atol=1e-6)

    def test_upsample_cross_level(self):
        """1-NN of fine points among a stride-4 (sub) level is near-exact."""
        from open3d_ml_tpu.ops.bucket import (morton_sort, bucket_knn,
                                              global_indices)
        rng = np.random.default_rng(2)
        pts = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
        _, sp = morton_sort(jnp.asarray(pts))
        sub = sp[::4]
        sids, rel, _ = bucket_knn(sub, sp, 1, seg=128, qblock=128,
                                  num_segs=8)
        g = np.asarray(global_indices(sids, rel, seg=128, qblock=128))[:, 0]
        _, ti = cKDTree(np.asarray(sub)).query(np.asarray(sp), k=1)
        assert (g == ti).mean() > 0.97


class TestPallasKernels:
    """Kernel vs XLA-twin equivalence (interpret=True dispatches to the XLA
    twin; the Mosaic path runs on real TPU only and is exercised by
    bench.py)."""

    def _setup(self, b=2, n=1024, k=8, seg=128, qb=128, s=4):
        from open3d_ml_tpu.ops.bucket import morton_sort, select_segments
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)), jnp.float32)
        sp = jax.vmap(lambda p: morton_sort(p)[1])(pts)
        sids = select_segments(sp, sp, seg=seg, qblock=qb, num_segs=s)
        return rng, sp, sids

    def test_knn_xla_twin_matches_bruteforce(self):
        from open3d_ml_tpu.ops.pallas.bucket import knn_pallas
        rng, sp, sids = self._setup()
        rel, d2 = knn_pallas(sp, sp, sids, 8, seg=128, qblock=128,
                             interpret=True)
        assert rel.shape == (2, 1024, 8)
        # gathered distances match the returned d2 (self-consistency) and
        # include self; d2[:,0] is computed as q2+t2-2qt so f32 cancellation
        # leaves ~1e-4 residue at coord scale 10 (not exactly 0)
        np.testing.assert_allclose(np.asarray(d2)[:, :, 0], 0.0, atol=1e-3)

    def test_gather_xla_twin_roundtrip(self):
        from open3d_ml_tpu.ops.pallas.bucket import knn_pallas, gather_pallas
        from open3d_ml_tpu.ops.bucket import global_indices
        rng, sp, sids = self._setup()
        rel, _ = knn_pallas(sp, sp, sids, 8, seg=128, qblock=128,
                            interpret=True)
        vals = jnp.asarray(rng.standard_normal((2, 1024, 16)), jnp.float32)
        out = gather_pallas(vals, sids, rel, 128, 128, jnp.float32, True)
        g = np.asarray(jax.vmap(
            lambda s, r: global_indices(s, r, seg=128, qblock=128))(sids,
                                                                    rel))
        ref = np.stack([np.asarray(vals)[i][g[i]] for i in range(2)])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_gather_grad_scatter_add(self):
        """The custom VJP backward scatters cotangents into value rows."""
        from open3d_ml_tpu.ops.pallas.bucket import knn_pallas, gather_pallas
        rng, sp, sids = self._setup()
        rel, _ = knn_pallas(sp, sp, sids, 4, seg=128, qblock=128,
                            interpret=True)
        vals = jnp.asarray(rng.standard_normal((2, 1024, 4)), jnp.float32)

        def f(v):
            return jnp.sum(gather_pallas(v, sids, rel, 128, 128,
                                         jnp.float32, True) ** 2)

        g = jax.grad(f)(vals)
        assert g.shape == vals.shape
        assert np.isfinite(np.asarray(g)).all()
        # numeric check on one entry: central difference (exact for this
        # quadratic f) with a LARGE eps — f itself is ~8192, so one f32 ULP
        # of f is ~5e-4 and a tiny-eps forward difference would be pure
        # rounding noise
        eps = 0.25
        vp = vals.at[0, 100, 2].add(eps)
        vm = vals.at[0, 100, 2].add(-eps)
        fd = (f(vp) - f(vm)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 100, 2]), float(fd), rtol=5e-2,
                                   atol=5e-2)

    def test_gather_kernel_reblocked_nonmultiple_q(self, monkeypatch):
        """Regression: after compact_tables re-blocking (gather_qblock),
        the table row count nqb exceeds ceil(Q/qblock) whenever Q is not a
        multiple of the SEARCH qblock. The kernel's query padding must be
        derived from nqb, or the extra grid steps index rel/out blocks out
        of bounds (and the backward scatter-adds the duplicated partials
        into dv). Runs the REAL kernels via the Mosaic interpreter."""
        from open3d_ml_tpu.ops.bucket import (morton_sort, select_segments,
                                              compact_tables)
        from open3d_ml_tpu.ops.pallas import bucket as pb
        rng = np.random.default_rng(5)
        n, seg, qb, gq, k, c = 96, 32, 64, 16, 4, 8
        pts = jnp.asarray(rng.uniform(-5, 5, (1, n, 3)), jnp.float32)
        sp = jax.vmap(lambda p: morton_sort(p)[1])(pts)
        sids = select_segments(sp, sp, seg=seg, qblock=qb, num_segs=2)
        rel, _ = pb.knn_pallas(sp, sp, sids, k, seg=seg, qblock=qb,
                               interpret=True)
        gsids, grel = compact_tables(sids, rel, 2, seg=seg, qblock=qb,
                                     out_qblock=gq)
        # nqb = ceil(96/64)*(64/16) = 8 table rows, but ceil(96/16) = 6
        assert gsids.shape[1] * gq > n
        vals = jnp.asarray(rng.standard_normal((1, n, c)), jnp.float32)

        def f(v, interp_kernel):
            # the flag is read at trace time and is not part of JAX's trace
            # cache key — drop caches so each setting really retraces
            monkeypatch.setattr(pb, "_INTERPRET_KERNEL", interp_kernel)
            jax.clear_caches()
            return pb.gather_pallas(v, gsids, grel, seg, gq,
                                    jnp.float32, True)

        out_twin = f(vals, False)
        out_kern = f(vals, True)
        np.testing.assert_allclose(np.asarray(out_kern),
                                   np.asarray(out_twin), atol=1e-5)

        def loss(v, interp_kernel):
            return jnp.sum(f(v, interp_kernel) ** 2)

        g_twin = jax.grad(lambda v: loss(v, False))(vals)
        g_kern = jax.grad(lambda v: loss(v, True))(vals)
        np.testing.assert_allclose(np.asarray(g_kern), np.asarray(g_twin),
                                   atol=1e-4)

    def test_mosaic_kernel_interpret_mode_tiny(self):
        """True Mosaic interpreter on a tiny shape: kernel == XLA twin."""
        from jax.experimental import pallas as pl  # noqa: F401
        from open3d_ml_tpu.ops.bucket import morton_sort, select_segments
        from open3d_ml_tpu.ops.pallas import bucket as pb
        rng = np.random.default_rng(4)
        pts = jnp.asarray(rng.uniform(-5, 5, (1, 256, 3)), jnp.float32)
        sp = jax.vmap(lambda p: morton_sort(p)[1])(pts)
        sids = select_segments(sp, sp, seg=128, qblock=128, num_segs=2)
        rel_x, d2_x = pb._knn_xla(sp, sp, sids, 4, 128, 128)
        # run the real kernel in Mosaic interpret mode by calling pallas_call
        # directly through knn_pallas's kernel path
        import functools
        from jax.experimental.pallas import tpu as pltpu
        kern = functools.partial(pb._knn_kernel, k=4, s=2, table=256)
        rel_k, d2_k = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, 2),
                in_specs=[pl.BlockSpec((1, 128, 4),
                                       lambda ib, iq, sref: (ib, iq, 0),
                                       memory_space=pltpu.VMEM)] +
                pb._seg_specs(2, 128, 4),
                out_specs=(
                    pl.BlockSpec((1, 128, 4),
                                 lambda ib, iq, sref: (ib, iq, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128, 4),
                                 lambda ib, iq, sref: (ib, iq, 0),
                                 memory_space=pltpu.VMEM),
                )),
            out_shape=(
                jax.ShapeDtypeStruct((1, 256, 4), jnp.int32),
                jax.ShapeDtypeStruct((1, 256, 4), jnp.float32),
            ),
            interpret=True,
        )(sids.reshape(1, -1),  # flattened [B, nqb*S] prefetch layout
          jnp.pad(sp, ((0, 0), (0, 0), (0, 1))),
          *([jnp.pad(sp, ((0, 0), (0, 0), (0, 1)))] * 2))
        # same neighbor SETS (tie order may differ between implementations).
        # The kernel packs lane position into the low `shift` mantissa bits
        # of d2 (see _knn_kernel), truncating them — a documented relative
        # error < 2^-12, so compare at rtol 1e-3.
        np.testing.assert_allclose(np.sort(np.asarray(d2_k), axis=-1),
                                   np.sort(np.asarray(d2_x), axis=-1),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
class TestFusedRandLANet:

    def test_fused_forward_close_to_exact(self):
        """Fused (Morton-bucket) logits correlate strongly with the exact
        path under shared parameters — the pyramids differ only in the
        subsample choice and ~5% neighbor recall."""
        from open3d_ml_tpu.models import RandLANet
        B, N = 2, 2048
        kw = dict(num_points=N, num_classes=8, ignored_label_inds=[0],
                  in_channels=3, dim_features=8, num_layers=2,
                  dim_output=[16, 32], sub_sampling_ratio=[4, 4])
        fused = RandLANet(knn_method="fused", seg=128, block=128,
                          num_segs=8, compute_dtype="float32", **kw)
        exact = RandLANet(knn_method="exact", **kw)
        netf, nete = fused.get_net(), exact.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "coords": jnp.asarray(rng.uniform(-10, 10, (B, N, 3)),
                                  jnp.float32),
            "features": jnp.asarray(rng.uniform(-1, 1, (B, N, 3)),
                                    jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        v = netf.init({"params": key, "dropout": key}, batch,
                      training=False)
        outf = netf.apply(v, batch, training=False)
        oute = nete.apply(v, batch, training=False)
        c = np.corrcoef(np.asarray(outf).ravel(),
                        np.asarray(oute).ravel())[0, 1]
        assert c > 0.8, c

        # compacted + re-blocked gather tables (the shipped fast config's
        # shape): same parameter tree, still tracks the exact path
        comp = RandLANet(knn_method="fused", seg=64, block=128,
                         num_segs=16, gather_segs=8, gather_qblock=32,
                         up_segs=8, compute_dtype="float32", **kw)
        outc = comp.get_net().apply(v, batch, training=False)
        cc = np.corrcoef(np.asarray(outc).ravel(),
                         np.asarray(oute).ravel())[0, 1]
        assert cc > 0.8, cc
        agree = (np.asarray(outf).argmax(-1) ==
                 np.asarray(oute).argmax(-1)).mean()
        assert agree > 0.7, agree

        # derived (searchless) upsample: same parameter tree, still tracks
        # the exact path
        drv = RandLANet(knn_method="fused", seg=64, block=128,
                        num_segs=16, gather_segs=8, up_mode="derive",
                        compute_dtype="float32", **kw)
        outd = drv.get_net().apply(v, batch, training=False)
        cd = np.corrcoef(np.asarray(outd).ravel(),
                         np.asarray(oute).ravel())[0, 1]
        assert cd > 0.8, cd


class TestHilbertCurve:
    """hilbert_codes must be a true Hilbert ordering: bijective over the
    grid and unit-step between consecutive cells (the property that gives
    the measured ~20% narrower candidate tables vs Morton)."""

    @pytest.mark.parametrize("bits", [2, 3])
    def test_bijection_and_unit_steps(self, bits):
        from open3d_ml_tpu.ops.morton import hilbert_codes
        n = 1 << bits
        g = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                 indexing="ij"), -1).reshape(-1, 3)
        # feed cell centers so _quantize recovers the exact grid coords
        pts = (g + 0.5).astype(np.float32) / n
        h = np.asarray(hilbert_codes(jnp.asarray(pts), bits=bits))
        assert len(np.unique(h)) == n ** 3  # bijection
        cells = g[np.argsort(h)]
        steps = np.abs(np.diff(cells, axis=0)).sum(1)
        assert (steps == 1).all()  # Hilbert adjacency

    def test_invalid_points_sort_last(self):
        from open3d_ml_tpu.ops.morton import hilbert_codes
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
        valid = jnp.asarray(np.arange(64) < 48)
        h = np.asarray(hilbert_codes(pts, valid))
        assert (h[48:] == np.int32(0x7FFFFFFF)).all()
        assert (h[:48] < np.int32(0x7FFFFFFF)).all()

    def test_derive_up_tables_matches_true_sub_1nn(self):
        """derive_up_tables: the derived entry must (a) always address a
        VALID sub point, (b) equal the true nearest sub point whenever
        that point is among the query's k fine neighbors (the exactness
        condition), and (c) recover the true sub-1NN for ~all queries on
        lidar density at the shipped budget."""
        from open3d_ml_tpu.ops.bucket import (bucket_knn, derive_up_tables,
                                              morton_sort)
        seg, qblock, S, k, ratio = 64, 128, 32, 16, 4
        pts = _lidar_cloud(8192)
        _, sp = morton_sort(jnp.asarray(pts))
        sids, rel, _ = bucket_knn(sp, sp, k, seg=seg, qblock=qblock,
                                  num_segs=S)
        usids, urel = derive_up_tables(sids[None], rel[None], ratio,
                                       seg=seg)
        usids, urel = np.asarray(usids[0]), np.asarray(urel[0])
        n = sp.shape[0]
        n_sub = n // ratio
        sub = np.asarray(sp)[::ratio][:n_sub]
        blk = np.arange(n)[:, None] // qblock
        g_sub = (usids[blk[:, 0], urel[:, 0] // seg] * seg +
                 urel[:, 0] % seg)
        assert (g_sub >= 0).all() and (g_sub < n_sub).all()
        # ground truth
        _, t_sub = cKDTree(sub).query(np.asarray(sp), k=1)
        gfine = np.asarray(sids)[blk, np.asarray(rel) // seg] * seg + \
            np.asarray(rel) % seg
        # exactness conditions: the true nearest sub point is among the k
        # fine NN, AND its sub segment survived the S' table cap
        cond = (gfine == t_sub[:, None] * ratio).any(1)
        kept = (usids[np.arange(n) // qblock] ==
                (t_sub // seg)[:, None]).any(1)
        assert cond.mean() > 0.95, cond.mean()
        exact = cond & kept
        assert exact.mean() > 0.95, exact.mean()
        assert (g_sub[exact] == t_sub[exact]).all()
        # overall recall incl. fallbacks
        assert (g_sub == t_sub).mean() > 0.95
        # fallback rows still give a NEARBY sub point (not garbage)
        bad = g_sub != t_sub
        if bad.any():
            d_got = np.linalg.norm(sub[g_sub[bad]] - np.asarray(sp)[bad],
                                   axis=1)
            d_true = np.linalg.norm(sub[t_sub[bad]] - np.asarray(sp)[bad],
                                    axis=1)
            assert np.median(d_got / np.maximum(d_true, 1e-6)) < 3.0

    def test_compact_tables_preserves_kept_neighbors(self):
        """compact_tables: every neighbor whose slot survives must map to
        the SAME global point; dropped ones duplicate the query's nearest
        KEPT neighbor."""
        from open3d_ml_tpu.ops.bucket import compact_tables
        rng = np.random.default_rng(1)
        B, nqb, S, seg, qblock, k = 2, 4, 16, 32, 64, 8
        Q = nqb * qblock
        seg_ids = np.stack([rng.choice(64, (nqb, S), replace=False)
                            for _ in range(B)]).astype(np.int32)
        slots = rng.choice(S, (B, Q, k),
                           p=np.r_[np.full(4, 0.22),
                                   np.full(S - 4, 0.12 / (S - 4))])
        rel = (slots * seg +
               rng.integers(0, seg, (B, Q, k))).astype(np.int32)
        G = 6
        nsids, nrel = compact_tables(jnp.asarray(seg_ids),
                                     jnp.asarray(rel), G,
                                     seg=seg, qblock=qblock)
        nsids, nrel = np.asarray(nsids), np.asarray(nrel)
        assert nsids.shape == (B, nqb, G)
        blk = np.arange(Q)[:, None] // qblock
        for b in range(B):
            gold = seg_ids[b][blk, rel[b] // seg] * seg + rel[b] % seg
            gnew = nsids[b][blk, nrel[b] // seg] * seg + nrel[b] % seg
            same = gnew == gold
            assert same.mean() > 0.5  # most survive at G=6/16 skewed hits
            # every replaced entry duplicates one of that query's
            # PRESERVED neighbors (its nearest kept one)
            for i in range(Q):
                for j in range(k):
                    if not same[i, j]:
                        assert gnew[i, j] in gnew[i][same[i]], (i, j)

    def test_compact_tables_reblocked(self):
        """out_qblock re-blocks the tables at finer query granularity:
        same preserved-or-duplicate contract against the ORIGINAL global
        ids, and a finer block keeps MORE of its own hits at equal G
        (its hit union is smaller)."""
        from open3d_ml_tpu.ops.bucket import compact_tables
        rng = np.random.default_rng(2)
        B, nqb, S, seg, qblock, k = 2, 4, 16, 32, 64, 8
        gq = 16
        Q = nqb * qblock
        seg_ids = np.stack([rng.choice(64, (nqb, S), replace=False)
                            for _ in range(B)]).astype(np.int32)
        # per-SUB-BLOCK skew: each 16-query group concentrates on a few
        # slots of its own (mimics spatial locality within a block)
        slots = np.empty((B, Q, k), np.int64)
        for b in range(B):
            for g in range(Q // gq):
                fav = rng.choice(S, 3, replace=False)
                p = np.full(S, 0.3 / (S - 3))
                p[fav] = 0.7 / 3
                slots[b, g * gq:(g + 1) * gq] = rng.choice(
                    S, (gq, k), p=p)
        rel = (slots * seg +
               rng.integers(0, seg, (B, Q, k))).astype(np.int32)
        G = 6
        keep_rates = {}
        for oq in (0, gq):
            nsids, nrel = compact_tables(jnp.asarray(seg_ids),
                                         jnp.asarray(rel), G, seg=seg,
                                         qblock=qblock, out_qblock=oq)
            nsids, nrel = np.asarray(nsids), np.asarray(nrel)
            eff_qb = oq or qblock
            assert nsids.shape == (B, Q // eff_qb, G)
            blk0 = np.arange(Q)[:, None] // qblock
            blk1 = np.arange(Q)[:, None] // eff_qb
            same_all = []
            for b in range(B):
                gold = (seg_ids[b][blk0, rel[b] // seg] * seg +
                        rel[b] % seg)
                gnew = (nsids[b][blk1, nrel[b] // seg] * seg +
                        nrel[b] % seg)
                same = gnew == gold
                same_all.append(same)
                for i in range(Q):
                    bad = ~same[i]
                    if bad.any() and same[i].any():
                        kept = gnew[i][same[i]]
                        assert np.isin(gnew[i][bad], kept).all(), (b, i)
                    elif bad.all():
                        # adversarial synthetic only (real self-KNN always
                        # keeps the query's own segment): the guard must
                        # still emit VALID rows of the block's kept table
                        tbl = (nsids[b][i // eff_qb][:, None] * seg +
                               np.arange(seg)).ravel()
                        assert np.isin(gnew[i], tbl).all(), (b, i)
            keep_rates[oq] = np.mean(same_all)
        assert keep_rates[gq] > keep_rates[0], keep_rates


class TestStencilConv:
    """The fused stencil-conv kernel (ops/pallas/stencil.py) vs the
    match_stencil + gather_taps + GEMM composition it replaces."""

    def _scene(self, b=2, cap=256, box=24, seed=0):
        from open3d_ml_tpu.ops.sparse_bucket import sort_sites
        rng = np.random.default_rng(seed)
        coords = np.zeros((b, cap, 3), np.int32)
        mask = np.zeros((b, cap), bool)
        for i in range(b):
            c = np.unique(rng.integers(0, box, (cap * 2, 3)), axis=0)
            rng.shuffle(c)
            n = min(len(c), cap - 7 + i)  # uneven valid counts
            coords[i, :n] = c[:n]
            mask[i, :n] = True
        return sort_sites(jnp.asarray(coords), jnp.asarray(mask))

    def _tables(self, coords, mask, seg, qblock, stencil_reach=1.74):
        from open3d_ml_tpu.ops.sparse_bucket import (rank_site_segments,
                                                     support_points)
        nv = jnp.sum(mask, axis=1).astype(jnp.int32)
        sup = support_points(coords, mask, seg)
        sites_q = jnp.where(mask[..., None], coords.astype(jnp.float32),
                            2e9)
        nseg = sup.shape[1] // seg
        seg_ids, ovf = rank_site_segments(sup, nv, sites_q, nv, seg=seg,
                                          qblock=qblock, num_segs=nseg,
                                          reach=stencil_reach)
        assert int(jnp.sum(ovf)) == 0  # tables provably exact
        return sup, sites_q, seg_ids, nv

    def test_match_equals_distance_rulebook(self):
        from open3d_ml_tpu.models.sparseconvunet import kernel_offsets
        from open3d_ml_tpu.ops.pallas.stencil import stencil_match_pallas
        from open3d_ml_tpu.ops.sparse_bucket import (match_stencil,
                                                     stencil_query_keys)
        seg, qblock = 32, 16
        coords, mask, mkey, _ = self._scene()
        sup, sites_q, seg_ids, _ = self._tables(coords, mask, seg, qblock)
        offs = kernel_offsets(3, centered=True)
        rel_d, fnd_d = match_stencil(sup, sites_q, offs, seg_ids, seg=seg,
                                     qblock=qblock, interpret=True)
        qkeys = stencil_query_keys(coords, mask, offs)
        kys = jnp.pad(mkey, ((0, 0), (0, (-mkey.shape[1]) % seg)),
                      constant_values=np.iinfo(np.int32).max)
        rel_k, fnd_k = stencil_match_pallas(kys, qkeys, seg_ids, seg=seg,
                                            qblock=qblock, interpret=True)
        fnd_d, fnd_k = np.asarray(fnd_d), np.asarray(fnd_k)
        valid = np.asarray(mask)[:, :, None] & np.ones_like(fnd_d)
        assert (fnd_d == fnd_k)[valid].all()
        hit = fnd_d & valid
        assert (np.asarray(rel_d) == np.asarray(rel_k))[hit].all()

    def test_conv_equals_gather_gemm(self):
        from open3d_ml_tpu.models.sparseconvunet import kernel_offsets
        from open3d_ml_tpu.ops.pallas.stencil import stencil_conv_pallas
        from open3d_ml_tpu.ops.sparse_bucket import (BucketCtx, gather_taps,
                                                     match_stencil,
                                                     stencil_query_keys)
        seg, qblock, cin, cout = 32, 16, 8, 12
        rng = np.random.default_rng(1)
        coords, mask, mkey, _ = self._scene(seed=1)
        b, cap = mask.shape
        sup, sites_q, seg_ids, _ = self._tables(coords, mask, seg, qblock)
        offs = kernel_offsets(3, centered=True)
        k = offs.shape[0]
        values = jnp.asarray(rng.normal(size=(b, cap, cin)), jnp.float32)
        values = values * mask[..., None]
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) * 0.1, jnp.float32)

        rel, fnd = match_stencil(sup, sites_q, offs, seg_ids, seg=seg,
                                 qblock=qblock, interpret=True)
        ctx = BucketCtx(seg_ids, rel, fnd, seg, qblock, True)
        g = gather_taps(values, ctx)
        ref = jnp.einsum("bqkc,kco->bqo", g, w)

        qkeys = stencil_query_keys(coords, mask, offs)
        out = stencil_conv_pallas(values, mkey, qkeys, seg_ids, w, seg,
                                  qblock, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(out)[np.asarray(mask)],
                                   np.asarray(ref)[np.asarray(mask)],
                                   rtol=1e-5, atol=1e-5)

    def test_conv_grads_match_reference(self):
        from open3d_ml_tpu.models.sparseconvunet import kernel_offsets
        from open3d_ml_tpu.ops.pallas.stencil import stencil_conv_pallas
        from open3d_ml_tpu.ops.sparse_bucket import (BucketCtx, gather_taps,
                                                     match_stencil,
                                                     stencil_query_keys)
        seg, qblock, cin, cout = 32, 16, 4, 6
        rng = np.random.default_rng(2)
        coords, mask, mkey, _ = self._scene(b=1, cap=128, box=12, seed=2)
        b, cap = mask.shape
        sup, sites_q, seg_ids, _ = self._tables(coords, mask, seg, qblock)
        offs = kernel_offsets(3, centered=True)
        k = offs.shape[0]
        values = jnp.asarray(rng.normal(size=(b, cap, cin)), jnp.float32)
        values = values * mask[..., None]
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) * 0.1, jnp.float32)
        cot = jnp.asarray(rng.normal(size=(b, cap, cout)), jnp.float32)
        cot = cot * mask[..., None]

        rel, fnd = match_stencil(sup, sites_q, offs, seg_ids, seg=seg,
                                 qblock=qblock, interpret=True)
        ctx = BucketCtx(seg_ids, rel, fnd, seg, qblock, True)

        def f_ref(v, ww):
            g = gather_taps(v, ctx)
            return jnp.sum(jnp.einsum("bqkc,kco->bqo", g, ww) * cot)

        qkeys = stencil_query_keys(coords, mask, offs)

        def f_fused(v, ww):
            out = stencil_conv_pallas(v, mkey, qkeys, seg_ids, ww, seg,
                                      qblock, jnp.float32, True)
            return jnp.sum(out * cot)

        gv_r, gw_r = jax.grad(f_ref, (0, 1))(values, w)
        gv_f, gw_f = jax.grad(f_fused, (0, 1))(values, w)
        np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                                   rtol=1e-5, atol=1e-5)

    def test_mosaic_interpret_stencil_tiny(self, monkeypatch):
        """True Mosaic interpreter on a tiny scene: fused kernel == XLA
        twin for match, conv forward, and conv gradients."""
        from open3d_ml_tpu.models.sparseconvunet import kernel_offsets
        from open3d_ml_tpu.ops.pallas import stencil as ps
        from open3d_ml_tpu.ops.sparse_bucket import stencil_query_keys
        seg, qblock, cin, cout = 16, 8, 4, 8
        rng = np.random.default_rng(7)
        coords, mask, mkey, _ = self._scene(b=1, cap=64, box=8, seed=7)
        sup, sites_q, seg_ids, _ = self._tables(coords, mask, seg, qblock)
        offs = kernel_offsets(3, centered=True)
        k = offs.shape[0]
        b, cap = mask.shape
        values = jnp.asarray(rng.standard_normal((b, cap, cin)),
                             jnp.float32) * mask[..., None]
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1,
                        jnp.float32)
        qkeys = stencil_query_keys(coords, mask, offs)
        cot = jnp.asarray(rng.standard_normal((b, cap, cout)),
                          jnp.float32) * mask[..., None]

        def run(interp_kernel, fn):
            monkeypatch.setattr(ps, "_INTERPRET_KERNEL", interp_kernel)
            jax.clear_caches()
            return fn()

        def match():
            return ps.stencil_match_pallas(mkey, qkeys, seg_ids, seg=seg,
                                           qblock=qblock, interpret=True)

        rel_t, fnd_t = run(False, match)
        rel_k, fnd_k = run(True, match)
        valid = np.asarray(mask)[:, :, None] & np.ones_like(
            np.asarray(fnd_t))
        assert (np.asarray(fnd_t) == np.asarray(fnd_k))[valid].all()
        hit = np.asarray(fnd_t) & valid
        assert (np.asarray(rel_t) == np.asarray(rel_k))[hit].all()

        def conv(v, ww):
            return ps.stencil_conv_pallas(v, mkey, qkeys, seg_ids, ww,
                                          seg, qblock, jnp.float32, True)

        out_t = run(False, lambda: conv(values, w))
        out_k = run(True, lambda: conv(values, w))
        np.testing.assert_allclose(np.asarray(out_k)[np.asarray(mask)],
                                   np.asarray(out_t)[np.asarray(mask)],
                                   rtol=1e-5, atol=1e-5)

        def loss(v, ww):
            return jnp.sum(conv(v, ww) * cot)

        gv_t, gw_t = run(False, lambda: jax.grad(loss, (0, 1))(values, w))
        gv_k, gw_k = run(True, lambda: jax.grad(loss, (0, 1))(values, w))
        np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_t),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_t),
                                   rtol=1e-4, atol=1e-4)

    def test_downconv_child_keys(self):
        """Stride-2 down-conv taps via (parent_key << 3) | child_code match
        the distance rulebook on the fine sites."""
        from open3d_ml_tpu.models.sparseconvunet import kernel_offsets
        from open3d_ml_tpu.ops.pallas.stencil import stencil_match_pallas
        from open3d_ml_tpu.ops.sparse_bucket import (bucket_downsample,
                                                     match_stencil,
                                                     rank_site_segments,
                                                     support_points)
        seg, qblock = 32, 16
        coords, mask, mkey, _ = self._scene(seed=3)
        nv = jnp.sum(mask, axis=1).astype(jnp.int32)
        dcap = 128
        pcoords, pmask, pkey, _, _ = bucket_downsample(coords, mask, mkey,
                                                       dcap)
        npar = jnp.sum(pmask, axis=1).astype(jnp.int32)
        sup = support_points(coords, mask, seg)
        pq = jnp.where(pmask[..., None], (pcoords * 2).astype(jnp.float32),
                       2e9)
        nseg = sup.shape[1] // seg
        seg_ids, ovf = rank_site_segments(sup, nv, pq, npar, seg=seg,
                                          qblock=qblock, num_segs=nseg,
                                          reach=1.74)
        assert int(jnp.sum(ovf)) == 0
        offs8 = kernel_offsets(2, centered=False)
        rel_d, fnd_d = match_stencil(sup, pq, offs8, seg_ids, seg=seg,
                                     qblock=qblock, interpret=True)
        child = jnp.arange(8, dtype=jnp.int32)
        qkeys = jnp.where(pmask[..., None], (pkey[..., None] << 3) | child,
                          -1)
        kys = jnp.pad(mkey, ((0, 0), (0, (-mkey.shape[1]) % seg)),
                      constant_values=np.iinfo(np.int32).max)
        rel_k, fnd_k = stencil_match_pallas(kys, qkeys, seg_ids, seg=seg,
                                            qblock=qblock, interpret=True)
        valid = np.asarray(pmask)[:, :, None] & np.ones_like(
            np.asarray(fnd_d))
        assert (np.asarray(fnd_d) == np.asarray(fnd_k))[valid].all()
        hit = np.asarray(fnd_d) & valid
        assert (np.asarray(rel_d) == np.asarray(rel_k))[hit].all()
