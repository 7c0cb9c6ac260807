"""Jaccard distance + re-ranking parity against a direct transliteration of
the published k-reciprocal algorithm (oracle derived from
CC/clustercontrast/utils/faiss_rerank.py / rerank.py semantics)."""

import numpy as np

from reid_gan_tpu.ops.jaccard import compute_jaccard_distance, re_ranking


def _oracle_jaccard(feats, k1, k2):
    """Direct N² implementation of the faiss_rerank flow."""
    n = feats.shape[0]
    dist = ((feats[:, None] - feats[None]) ** 2).sum(-1)
    initial_rank = np.argsort(dist, axis=1)[:, :k1]  # k1-wide, incl. self

    def recip(i, k):
        fwd = initial_rank[i, : k + 1]
        bwd = initial_rank[fwd, : k + 1]
        return fwd[np.where(bwd == i)[0]]

    nn_k1 = [recip(i, k1) for i in range(n)]
    half = int(np.around(k1 / 2))
    nn_half = [recip(i, half) for i in range(n)]
    V = np.zeros((n, n), np.float32)
    for i in range(n):
        idx = nn_k1[i]
        exp_idx = idx
        for c in idx:
            cand = nn_half[c]
            if len(np.intersect1d(cand, idx)) > 2 / 3 * len(cand):
                exp_idx = np.append(exp_idx, cand)
        exp_idx = np.unique(exp_idx)
        d = 2 - 2 * feats[i] @ feats[exp_idx].T
        e = np.exp(-d)
        V[i, exp_idx] = e / e.sum()
    if k2 != 1:
        V = np.stack([V[initial_rank[i, :k2]].mean(0) for i in range(n)])
    jac = np.zeros((n, n), np.float32)
    for i in range(n):
        temp_min = np.zeros(n, np.float32)
        for j in np.nonzero(V[i])[0]:
            rows = np.nonzero(V[:, j])[0]
            temp_min[rows] += np.minimum(V[i, j], V[rows, j])
        jac[i] = 1 - temp_min / (2 - temp_min)
    return np.clip(jac, 0, None)


def test_jaccard_parity_small(rng):
    feats = rng.randn(40, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    ours = compute_jaccard_distance(feats, k1=10, k2=3, print_flag=False)
    ref = _oracle_jaccard(feats, k1=10, k2=3)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_jaccard_diag_small(rng):
    feats = rng.randn(30, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    jac = compute_jaccard_distance(feats, k1=8, k2=1, print_flag=False)
    # self-distance must be (near) the minimum of each row
    assert (np.abs(np.diag(jac)) <= jac.min(axis=1) + 1e-5).all()
    assert jac.min() >= 0.0 and jac.max() <= 1.0 + 1e-6


def test_reranking_improves_corrupted_ranking(rng):
    """Two clusters; one query's euclidean ranking is corrupted; k-reciprocal
    re-ranking must fix it via neighborhood consensus."""
    c1 = rng.randn(20, 8) * 0.1
    c2 = rng.randn(20, 8) * 0.1 + 3.0
    q = np.vstack([c1[:2], c2[:2]]).astype(np.float32)
    g = np.vstack([c1[2:], c2[2:]]).astype(np.float32)

    def d(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1).astype(np.float32)

    q_g, q_q, g_g = d(q, g), d(q, q), d(g, g)
    out = re_ranking(q_g, q_q, g_g, k1=10, k2=3)
    assert out.shape == q_g.shape
    # same-cluster gallery items rank before cross-cluster ones
    order = np.argsort(out[0])
    assert set(order[:10]) <= set(range(18))
    order3 = np.argsort(out[3])
    assert set(order3[:10]) <= set(range(18, 36))


def test_reranking_lambda_zero_pure_jaccard(rng):
    f = rng.randn(30, 8).astype(np.float32)
    q, g = f[:10], f[10:]

    def d(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1).astype(np.float32)

    out = re_ranking(d(q, g), d(q, q), d(g, g), k1=8, k2=2, lambda_value=0.0)
    assert out.shape == (10, 20)
    assert np.isfinite(out).all()
