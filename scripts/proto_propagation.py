"""Prototype: candidate-segment selection by COARSE-NEIGHBOR PROPAGATION.

Hypothesis: a fine query block's best candidate segments are the segments
containing the (stride-4) children of the coarse-level neighbors of the
block's parent points — the actual neighbor structure one level up — rather
than segments ranked by bbox lower bounds. Measures 16-NN recall of the
propagated selection vs exact KD-tree on a lidar-density cloud, across
(seg, qblock, S), assuming exact coarse neighbors (the pyramid computes
coarse levels first, where exactness is cheap).
"""
import json
import sys

import numpy as np
from scipy.spatial import cKDTree


def lidar_cloud(rng, n):
    r = 50.0 * rng.uniform(0.02, 1.0, n) ** 2
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.normal(0, 2.0, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


def morton_sort_np(pts):
    lo, hi = pts.min(0), pts.max(0)
    g = np.clip(((pts - lo) / np.maximum(hi - lo, 1e-9) * 1023), 0,
                1023).astype(np.uint64)
    code = np.zeros(len(pts), np.uint64)
    for b in range(10):
        for a in range(3):
            code |= ((g[:, a] >> b) & 1) << np.uint64(3 * b + a)
    return pts[np.argsort(code)]


def bbox_rank(pc, seg, qblock, nseg, nqb, sub_split=4):
    """Per-block segment ranking by bbox lower bound, mirroring
    ops/bucket.py _rank_segments (merged best-rank over sub-blocks).
    Returns rank [nqb, nseg] (lower = better)."""
    n = len(pc)
    pad = nseg * seg - n
    p = np.pad(pc, ((0, pad), (0, 0)), constant_values=np.nan)
    p = p.reshape(nseg, seg, 3)
    plo, phi = np.nanmin(p, 1), np.nanmax(p, 1)
    sq = max(qblock // sub_split, 1)
    nsb = -(-n // sq)
    qpad = nsb * sq - n
    qp = np.pad(pc, ((0, qpad), (0, 0)), constant_values=np.nan)
    qp = qp.reshape(nsb, sq, 3)
    qlo, qhi = np.nanmin(qp, 1), np.nanmax(qp, 1)
    gap = np.maximum(np.maximum(qlo[:, None] - phi[None], plo[None] -
                                qhi[:, None]), 0.0)
    lb = np.sqrt((gap * gap).sum(-1))
    cd = 0.5 * np.sqrt((((qlo + qhi)[:, None] -
                         (plo + phi)[None]) ** 2).sum(-1))
    score = lb * 1e4 + cd
    rank_sb = np.argsort(np.argsort(score, 1), 1)  # [nsb, nseg]
    sub_per_blk = qblock // sq
    rank = rank_sb.reshape(nqb, sub_per_blk, nseg).min(1)
    return rank


def main():
    n, k, ratio = 45056, 16, 4
    kc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    pc = morton_sort_np(lidar_cloud(rng, n))
    exact = cKDTree(pc).query(pc, k=k)[1]

    sub = pc[::ratio]                       # coarse level, still sorted
    cnn = cKDTree(sub).query(sub, k=kc)[1]  # [N/4, kc] coarse NN (exact)

    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]] or [
        (64, 32, 12), (64, 32, 16), (64, 32, 20), (64, 32, 24),
        (32, 32, 32), (32, 32, 40), (64, 128, 16), (64, 128, 24)]
    for seg, qblock, s in cfgs:
        nseg = -(-n // seg)
        nqb = -(-n // qblock)
        rank = bbox_rank(pc, seg, qblock, nseg, nqb)
        hits = 0
        total = 0
        for b in range(nqb):
            q0, q1 = b * qblock, min((b + 1) * qblock, n)
            parents = np.arange(q0 // ratio, -(-q1 // ratio))
            cand = cnn[parents].ravel()              # coarse neighbor ids
            segs = (cand * ratio) // seg             # child segments
            # queries' own segments are always candidates (self-locality)
            own = np.arange(q0 // seg, min(-(-q1 // seg), nseg))
            hist = np.bincount(segs, minlength=nseg).astype(np.float64)
            hist[own] = np.inf
            # union: propagation hits first, bbox rank breaks the tail
            # (segments with zero coarse votes still rank by geometry)
            key = hist * 1e6 - rank[b]
            top = np.argpartition(-key, min(s, nseg) - 1)[:s]
            sel = np.zeros(nseg, bool)
            sel[top] = True
            nb = exact[q0:q1]
            hits += sel[nb // seg].sum()
            total += nb.size
        print(json.dumps({"seg": seg, "qblock": qblock, "S": s, "kc": kc,
                          "table": seg * s,
                          "recall": round(hits / total, 4)}), flush=True)


if __name__ == "__main__":
    main()
