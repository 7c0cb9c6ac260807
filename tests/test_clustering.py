"""DBSCAN parity vs sklearn; k-means sanity."""

import numpy as np
from scipy.spatial.distance import cdist
from sklearn.cluster import DBSCAN as SkDBSCAN

from reid_gan_tpu.clustering import dbscan, kmeans_labels


def _blobs(rng, k=4, per=20, d=8, spread=0.05):
    centers = rng.randn(k, d) * 3
    pts = np.concatenate([c + rng.randn(per, d) * spread for c in centers])
    return pts.astype(np.float32)


def _same_partition(a, b):
    """Labels equal up to renaming (noise −1 must match exactly)."""
    assert ((a == -1) == (b == -1)).all()
    mapping = {}
    for x, y in zip(a, b):
        if x == -1:
            continue
        if x in mapping:
            if mapping[x] != y:
                return False
        else:
            mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


def test_dbscan_matches_sklearn_blobs(rng):
    pts = _blobs(rng)
    dist = cdist(pts, pts)
    ours = dbscan(dist, eps=0.5, min_samples=4)
    ref = SkDBSCAN(eps=0.5, min_samples=4, metric="precomputed").fit_predict(dist)
    assert _same_partition(ours, ref)


def test_dbscan_noise(rng):
    pts = _blobs(rng, k=2, per=10)
    pts = np.vstack([pts, rng.randn(3, 8) * 10 + 50])  # far outliers
    dist = cdist(pts, pts)
    ours = dbscan(dist, eps=0.5, min_samples=4)
    ref = SkDBSCAN(eps=0.5, min_samples=4, metric="precomputed").fit_predict(dist)
    assert _same_partition(ours, ref)
    assert (ours[-3:] == -1).all()


def test_dbscan_min_samples(rng):
    pts = _blobs(rng, k=1, per=3)  # 3 points < min_samples → all noise
    dist = cdist(pts, pts)
    ours = dbscan(dist, eps=0.5, min_samples=4)
    assert (ours == -1).all()


def test_kmeans_separable(rng):
    pts = _blobs(rng, k=3, per=30)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    labels, centers = kmeans_labels(pts, 3, iters=20, seed=0)
    assert centers.shape == (3, 8)
    # each true blob maps to a single k-means cluster
    for s in range(0, 90, 30):
        assert len(set(labels[s:s + 30].tolist())) == 1
