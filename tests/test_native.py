"""Native C++ kernel tests: build, DBSCAN parity, Jaccard min-sum parity,
Infomap planted-partition recovery."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from reid_gan_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.available(), "libreidnative.so failed to build"


def test_dbscan_native_matches_python(rng):
    from reid_gan_tpu.clustering.dbscan import dbscan

    pts = np.concatenate([rng.randn(20, 4) * 0.05 + c
                          for c in (0, 3, 6)]).astype(np.float32)
    dist = cdist(pts, pts).astype(np.float32)
    ours_native = native.dbscan_native(dist, eps=0.5, min_samples=4)
    ours_py = dbscan(dist, eps=0.5, min_samples=4, native=False)
    np.testing.assert_array_equal(ours_native, ours_py)


def test_jaccard_minsum_native_matches_python(rng):
    from reid_gan_tpu.ops.jaccard import _min_sum_jaccard

    n = 40
    V = rng.rand(n, n).astype(np.float32)
    V[V < 0.8] = 0.0  # sparse
    V /= V.sum(1, keepdims=True) + 1e-12
    a = native.jaccard_minsum_native(V)
    b = _min_sum_jaccard(V, native=False)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # query-rows-only variant
    a5 = native.jaccard_minsum_native(V, query_num=5)
    np.testing.assert_allclose(a5, b[:5], atol=1e-5)


def _planted_graph(rng, k=4, per=25, p_in=0.5, p_out=0.01):
    n = k * per
    src, dst, w = [], [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            same = (i // per) == (j // per)
            if rng.rand() < (p_in if same else p_out):
                src.append(i)
                dst.append(j)
                w.append(1.0)
    return (np.asarray(src, np.int32), np.asarray(dst, np.int32),
            np.asarray(w, np.float32), n, per, k)


def test_infomap_recovers_planted_partition(rng):
    src, dst, w, n, per, k = _planted_graph(rng)
    labels, n_modules = native.infomap_native(src, dst, w, n, seed=0)
    assert labels.shape == (n,)
    # each planted block should be (almost) a single module
    purity = 0
    for b in range(k):
        block = labels[b * per:(b + 1) * per]
        vals, counts = np.unique(block, return_counts=True)
        purity += counts.max()
    assert purity / n > 0.9
    # and distinct blocks get distinct dominant modules
    dominants = [np.bincount(labels[b * per:(b + 1) * per]).argmax()
                 for b in range(k)]
    assert len(set(dominants)) == k


def test_infomap_cluster_pipeline(rng):
    """Full cluster_by_infomap flow over separable normalized features."""
    from reid_gan_tpu.clustering.infomap import cluster_by_infomap

    centers = rng.randn(3, 16) * 5
    feats = np.concatenate([centers[i] + rng.randn(20, 16) * 0.05
                            for i in range(3)]).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = cluster_by_infomap(feats, k=10, min_sim=0.8, cluster_num=2,
                                print_flag=False)
    assert labels.shape == (60,)
    for b in range(3):
        block = labels[b * 20:(b + 1) * 20]
        block = block[block >= 0]
        assert len(block) > 10
        vals, counts = np.unique(block, return_counts=True)
        assert counts.max() / len(block) > 0.9


def _clustered_feats(rng, n=300, d=64, k=12):
    centers = rng.randn(k, d).astype(np.float32)
    f = centers[rng.randint(k, size=n)] + \
        0.3 * rng.randn(n, d).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def test_sparse_kreciprocal_pipeline_matches_dense(rng):
    """The end-to-end sparse C++ pipeline (kreciprocal_v_native →
    jaccard_minsum_rows_native, the MSMT-scale hot path) must equal the dense
    python fallback of compute_jaccard_distance (faiss_rerank.py:43-115
    semantics) on clustered data, including the k2 query expansion."""
    from reid_gan_tpu.ops.jaccard import compute_jaccard_distance

    feats = _clustered_feats(rng)
    for k1, k2 in ((20, 6), (12, 1)):       # k2=1 skips query expansion
        sparse = compute_jaccard_distance(feats, k1=k1, k2=k2,
                                          print_flag=False, native=True)
        dense = compute_jaccard_distance(feats, k1=k1, k2=k2,
                                         print_flag=False, native=False)
        np.testing.assert_allclose(sparse, dense, atol=2e-5)


def test_sparse_jaccard_fp16_output(rng):
    """use_float16 downcasts only the returned matrix on the sparse path."""
    from reid_gan_tpu.ops.jaccard import compute_jaccard_distance

    feats = _clustered_feats(rng, n=120)
    d32 = compute_jaccard_distance(feats, k1=15, k2=4, print_flag=False,
                                   native=True)
    d16 = compute_jaccard_distance(feats, k1=15, k2=4, print_flag=False,
                                   native=True, use_float16=True)
    assert d16.dtype == np.float16
    np.testing.assert_allclose(d16.astype(np.float32), d32, atol=1e-3)


def test_native_reranking_matches_python(rng):
    """Eval-time re-ranking: the threaded C++ path (partial-sort rank table →
    reid_kreciprocal_v_dist → query expand → min-sum) must equal the python
    fallback, which is the parity oracle for rerank.py:31-97 semantics."""
    from reid_gan_tpu.ops.jaccard import re_ranking

    f = _clustered_feats(rng, n=160)
    q, g = f[:40], f[40:]

    def d(a, b):
        return cdist(a, b, "sqeuclidean").astype(np.float32)

    args = (d(q, g), d(q, q), d(g, g))
    for k1, k2 in ((20, 6), (10, 1)):
        fast = re_ranking(*args, k1=k1, k2=k2, native=True)
        slow = re_ranking(*args, k1=k1, k2=k2, native=False)
        np.testing.assert_allclose(fast, slow, atol=2e-5)


def test_native_fallback_warns_and_matches(rng, monkeypatch):
    """native='auto' must degrade to the python path LOUDLY (RuntimeWarning
    carrying the swallowed exception) and still return correct results."""
    import reid_gan_tpu.native as native_mod
    from reid_gan_tpu.ops.jaccard import compute_jaccard_distance

    feats = _clustered_feats(rng, n=80)
    want = compute_jaccard_distance(feats, k1=10, k2=3, print_flag=False,
                                    native=False)

    def boom(*a, **k):
        raise RuntimeError("simulated native breakage")

    monkeypatch.setattr(native_mod, "kreciprocal_v_native", boom)
    with pytest.warns(RuntimeWarning, match="simulated native breakage"):
        got = compute_jaccard_distance(feats, k1=10, k2=3, print_flag=False,
                                       native="auto")
    np.testing.assert_allclose(got, want, atol=2e-5)
