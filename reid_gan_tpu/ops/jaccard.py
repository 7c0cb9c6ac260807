"""k-reciprocal Jaccard distance + re-ranking.

TPU/host split (SURVEY.md §7 step 4): the O(N²·D) k-NN ranking runs on TPU as
blockwise MXU matmuls + top-k (ops/distance.knn_search); the irregular
k-reciprocal expansion and sparse min-sum run on host over the small (N×k)
neighbor lists — the same split the reference uses with faiss-gpu + numpy
(CC/clustercontrast/utils/faiss_rerank.py:30-123,
CC/clustercontrast/utils/rerank.py:31-97).
"""

import warnings

import numpy as np

from .distance import knn_search


def _warn_native_fallback(where, exc):
    """native='auto' degrades to the per-row python path LOUDLY: at MSMT
    scale that is minutes-to-hours per epoch instead of seconds, and a
    silently-swallowed exception would mask real native-kernel regressions
    (the parity tests pin native=True, production runs 'auto')."""
    warnings.warn(
        f"{where}: native C++ pipeline unavailable "
        f"({type(exc).__name__}: {exc}); falling back to the slow python "
        "path", RuntimeWarning, stacklevel=3)


def k_reciprocal_neigh(initial_rank, i, k):
    """Neighbors j of i (within top-k+1 incl. self) that also rank i within
    their own top-k+1 (faiss_rerank.py:23-27)."""
    forward = initial_rank[i, : k + 1]
    backward = initial_rank[forward, : k + 1]
    fi = np.where(backward == i)[0]
    return forward[fi]


def _expanded_reciprocal(initial_rank, i, nn_k1, nn_k1_half):
    """k-reciprocal set of i expanded with candidates whose half-k reciprocal
    set overlaps ≥ 2/3 (faiss_rerank.py:73-80; rerank.py:55-65)."""
    k_reciprocal_index = nn_k1[i]
    expansion = [k_reciprocal_index]
    for candidate in k_reciprocal_index:
        candidate_set = nn_k1_half[candidate]
        if len(np.intersect1d(candidate_set, k_reciprocal_index)) > (2.0 / 3) * len(candidate_set):
            expansion.append(candidate_set)
    return np.unique(np.concatenate(expansion))


def _query_expand(V, initial_rank, k2):
    """k2 query expansion: row i ← mean of rows of its top-k2 neighbors
    (faiss_rerank.py:89-93)."""
    if k2 == 1:
        return V
    return V[initial_rank[:, :k2]].mean(axis=1)


def _min_sum_jaccard(V, query_num=None, native="auto"):
    """Jaccard distance from the sparse soft-assignment matrix V:
    jac[i, :] = 1 − Σ_j min(V[i,j], V[:,j]) / (2 − Σ_j min(...)), summing over
    the nonzero columns of row i (faiss_rerank.py:98-115, rerank.py:80-90).

    Dispatches to the threaded C++ kernel when built (reid_gan_tpu/native).
    """
    if native in ("auto", True):
        try:
            from ..native import jaccard_minsum_native

            return jaccard_minsum_native(np.asarray(V, np.float32), query_num)
        except Exception:
            if native is True:
                raise
    n = V.shape[0]
    m = n if query_num is None else query_num
    jaccard = np.zeros((m, n), V.dtype)
    # CSC access: for each column, its nonzero rows
    Vt = V.T.copy()
    for i in range(m):
        cols = np.nonzero(V[i])[0]
        if cols.size == 0:
            jaccard[i] = 1.0
            continue
        # (|cols|, n) block: min(V[i, j], V[:, j]) summed over j
        temp_min = np.minimum(V[i, cols][:, None], Vt[cols]).sum(axis=0)
        jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)
    return jaccard


def compute_jaccard_distance(features, k1=30, k2=6, print_flag=True,
                             search_option=None, use_float16=False,
                             native="auto", mesh=None):
    """Jaccard distance over k-reciprocal encodings for pseudo-labeling
    (parity: CC/clustercontrast/utils/faiss_rerank.py:30-123; the faiss kNN
    backends are replaced by the TPU blockwise kNN).

    features: (N, D) L2-normalized host/jax array. Returns (N, N) float
    matrix, zeros clipped.

    The hot path (native="auto"/True with libreidnative built) keeps V sparse
    end to end — C++ k-reciprocal expansion, k2 query expansion and min-sum —
    so the only dense (N, N) array is the returned Jaccard matrix. At MSMT17
    scale (N=32,621) the reference's layout would need a 4.3 GB dense fp32 V
    plus a 12.7 GB transient for the k2 gather; this path needs ~0.1 GB of
    sparse rows (validated by scripts/validate_msmt_scale.py). use_float16
    downcasts the RETURNED matrix only (V itself is never dense here).
    """
    import time

    end = time.time()
    if print_flag:
        print("Computing jaccard distance...")
    feats = np.asarray(features, np.float32)
    n = feats.shape[0]
    mat_type = np.float16 if use_float16 else np.float32

    # k1 columns incl. self — the :k1+1 slices below clamp to the available
    # width, matching the reference where initial_rank comes from a k1-wide
    # faiss search (faiss_rerank.py:43 + :23-27)
    _, initial_rank = knn_search(feats, k=min(k1, n), metric="l2", mesh=mesh)

    if native in ("auto", True):
        try:
            from ..native import (jaccard_minsum_rows_native,
                                  kreciprocal_v_native)

            idx, w, cnt = kreciprocal_v_native(initial_rank, feats, k1, k2)
            # reid_jaccard_minsum clips negatives at write time — this path
            # honors the "zeros clipped" contract without an extra O(N²) pass
            jaccard = jaccard_minsum_rows_native(idx, w, cnt)
            if use_float16:
                jaccard = jaccard.astype(np.float16)
            if print_flag:
                print("Jaccard distance computing time cost:"
                      f" {time.time() - end}")
            return jaccard
        except Exception as e:
            if native is True:
                raise
            _warn_native_fallback("compute_jaccard_distance", e)

    nn_k1 = [k_reciprocal_neigh(initial_rank, i, k1) for i in range(n)]
    half = int(np.around(k1 / 2))
    nn_k1_half = [k_reciprocal_neigh(initial_rank, i, half) for i in range(n)]

    V = np.zeros((n, n), dtype=mat_type)
    for i in range(n):
        idx = _expanded_reciprocal(initial_rank, i, nn_k1, nn_k1_half)
        # soft weights: softmax over −(2−2·cos) distances (faiss_rerank.py:81-85)
        dist = 2.0 - 2.0 * feats[i] @ feats[idx].T
        e = np.exp(-dist)
        V[i, idx] = (e / e.sum()).astype(mat_type)

    V = _query_expand(V, initial_rank, k2).astype(mat_type)
    jaccard = _min_sum_jaccard(V).astype(mat_type)
    np.clip(jaccard, 0.0, None, out=jaccard)
    if print_flag:
        print(f"Jaccard distance computing time cost: {time.time() - end}")
    return jaccard


def _topk_rank(dist, rank_w):
    """Row-wise indices of the ``rank_w`` smallest entries, sorted ascending.
    argpartition + in-block argsort: O(N² + N·R·logR) instead of the full
    O(N²·logN) argsort — only the first max(k1, k1/2)+1 rank columns are ever
    read by the k-reciprocal algorithm."""
    n = dist.shape[1]
    if rank_w >= n:
        return np.argsort(dist, axis=1).astype(np.int32)
    part = np.argpartition(dist, rank_w - 1, axis=1)[:, :rank_w]
    block = np.take_along_axis(dist, part, axis=1)
    order = np.argsort(block, axis=1)
    return np.take_along_axis(part, order, axis=1).astype(np.int32)


def re_ranking(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3,
               native="auto"):
    """k-reciprocal re-ranking of an eval distance matrix
    (parity: CC/clustercontrast/utils/rerank.py:31-97; weights are
    exp(−dist/colmax-normalized) rather than softmax).

    The hot path (native="auto"/True with libreidnative built) runs the
    k-reciprocal expansion, k2 query expansion and min-sum in threaded C++
    over sparse rows, with a partial-sort rank table — the reference's numpy
    version is O(N²·logN) sort + per-row Python loops and takes minutes at
    Market eval scale (N=19,281).
    """
    q_g_dist = np.asarray(q_g_dist, np.float32)
    q_q_dist = np.asarray(q_q_dist, np.float32)
    g_g_dist = np.asarray(g_g_dist, np.float32)
    original_dist = np.concatenate(
        [np.concatenate([q_q_dist, q_g_dist], axis=1),
         np.concatenate([q_g_dist.T, g_g_dist], axis=1)], axis=0)
    original_dist = np.power(original_dist, 2).astype(np.float32)
    original_dist = np.ascontiguousarray(
        (original_dist / np.max(original_dist, axis=0)).T)

    query_num = q_g_dist.shape[0]
    all_num = original_dist.shape[0]
    rank_w = min(all_num, max(k1 + 1, k2))
    initial_rank = _topk_rank(original_dist, rank_w)

    if native in ("auto", True):
        try:
            from ..native import (jaccard_minsum_rows_native,
                                  kreciprocal_v_dist_native)

            idx, w, cnt = kreciprocal_v_dist_native(initial_rank,
                                                    original_dist, k1, k2)
            jaccard = jaccard_minsum_rows_native(idx, w, cnt,
                                                 query_num=query_num)
            final_dist = (jaccard * (1 - lambda_value)
                          + original_dist[:query_num] * lambda_value)
            return final_dist[:, query_num:]
        except Exception as e:
            if native is True:
                raise
            _warn_native_fallback("re_ranking", e)

    nn_k1 = [k_reciprocal_neigh(initial_rank, i, k1) for i in range(all_num)]
    half = int(np.around(k1 / 2.0))
    nn_k1_half = [k_reciprocal_neigh(initial_rank, i, half) for i in range(all_num)]

    V = np.zeros_like(original_dist, np.float32)
    for i in range(all_num):
        idx = _expanded_reciprocal(initial_rank, i, nn_k1, nn_k1_half)
        weight = np.exp(-original_dist[i, idx])
        V[i, idx] = weight / weight.sum()

    V = _query_expand(V, initial_rank, k2).astype(np.float32)
    jaccard = _min_sum_jaccard(V, query_num=query_num)
    final_dist = jaccard * (1 - lambda_value) + original_dist[:query_num] * lambda_value
    return final_dist[:, query_num:]
