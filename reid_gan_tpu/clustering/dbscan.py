"""DBSCAN over a precomputed distance matrix.

Replaces sklearn's DBSCAN(metric='precomputed') used for pseudo-labels
(CC/examples/cluster_contrast_train_usl.py:160-163). Classic algorithm:
core points (≥ min_samples neighbors within eps, self included) BFS-expand
clusters; border points join the first core cluster that reaches them; the
rest are noise (−1). Deterministic in index order — label-identical to
sklearn for non-border-ambiguous inputs and cluster-identical in general.

A C++ native path (reid_gan_tpu.native) accelerates the neighbor scan when
built; the numpy path is the reference implementation.
"""

import numpy as np


def dbscan(dist, eps, min_samples=4, native="auto"):
    """dist: (N, N) symmetric distance matrix (host array). Returns labels
    (N,) int32, −1 = noise. native='auto' uses the C++ kernel when built."""
    if native in ("auto", True):
        try:
            from ..native import dbscan_native

            return dbscan_native(dist, eps, min_samples)
        except Exception:
            if native is True:
                raise
    dist = np.asarray(dist)
    n = dist.shape[0]
    neighbors = dist <= eps          # boolean adjacency, self included
    n_neighbors = neighbors.sum(axis=1)
    core = n_neighbors >= min_samples

    labels = np.full(n, -1, np.int32)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS from core point i
        labels[i] = cluster
        frontier = [i]
        while frontier:
            nxt = []
            for p in frontier:
                if not core[p]:
                    continue
                reach = np.nonzero(neighbors[p] & (labels == -1))[0]
                labels[reach] = cluster
                nxt.extend(reach.tolist())
            frontier = nxt
        cluster += 1
    return labels
