"""ctypes bindings to libreidnative.so (built on first use with g++).

Native host kernels: DBSCAN, Infomap-style community detection, Jaccard
min-sum — the replacements for the reference's sklearn/infomap/faiss-side
native dependencies (SURVEY.md §2.4).
"""

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libreidnative.so")
_lib = None


def ensure_built(force=False):
    """Compile the shared library if missing. Returns the loaded CDLL."""
    global _lib
    if _lib is not None and not force:
        return _lib
    src = osp.join(_DIR, "src", "reidnative.cc")
    mk = osp.join(_DIR, "Makefile")
    # a deployment may ship only the prebuilt .so (no Makefile/src tree):
    # load it as-is instead of crashing on getmtime
    have_build_tree = osp.exists(src) and osp.exists(mk)
    if force or not osp.exists(_LIB_PATH) or (
            have_build_tree
            and os.path.getmtime(_LIB_PATH)
            < max(os.path.getmtime(src), os.path.getmtime(mk))):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, text=True)
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.reid_dbscan.argtypes = [f32p, ctypes.c_int32, ctypes.c_float,
                                ctypes.c_int32, i32p]
    lib.reid_dbscan.restype = None
    lib.reid_jaccard_minsum.argtypes = [i64p, i32p, f32p, i64p, i32p, f32p,
                                        ctypes.c_int32, ctypes.c_int32, f32p]
    lib.reid_jaccard_minsum.restype = None
    lib.reid_infomap.argtypes = [ctypes.c_int32, ctypes.c_int64, i32p, i32p,
                                 f32p, ctypes.c_double, ctypes.c_int64, i32p]
    lib.reid_infomap.restype = ctypes.c_int32
    lib.reid_kreciprocal_v.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32,
                                       f32p, ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_int32, i32p, f32p, i32p]
    lib.reid_kreciprocal_v.restype = ctypes.c_int32
    lib.reid_kreciprocal_v_dist.argtypes = [i32p, ctypes.c_int32,
                                            ctypes.c_int32, f32p,
                                            ctypes.c_int32, ctypes.c_int32,
                                            i32p, f32p, i32p]
    lib.reid_kreciprocal_v_dist.restype = ctypes.c_int32
    lib.reid_query_expand.argtypes = [i32p, f32p, i32p, ctypes.c_int32,
                                      i32p, ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32, ctypes.c_int32,
                                      i32p, f32p, i32p]
    lib.reid_query_expand.restype = ctypes.c_int32
    _lib = lib
    return lib


def available():
    try:
        ensure_built()
        return True
    except Exception:
        return False


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dbscan_native(dist, eps, min_samples=4):
    lib = ensure_built()
    dist = np.ascontiguousarray(dist, np.float32)
    n = dist.shape[0]
    labels = np.empty(n, np.int32)
    lib.reid_dbscan(_ptr(dist, ctypes.c_float), n, float(eps),
                    int(min_samples), _ptr(labels, ctypes.c_int32))
    return labels


def jaccard_minsum_native(V, query_num=None):
    """V: dense (n, n) float32 sparse-ish matrix → jaccard rows (m, n)."""
    from scipy import sparse

    lib = ensure_built()
    n = V.shape[0]
    m = n if query_num is None else int(query_num)
    csr = sparse.csr_matrix(V)
    csc = sparse.csr_matrix(V.T)
    out = np.empty((m, n), np.float32)
    lib.reid_jaccard_minsum(
        _ptr(np.ascontiguousarray(csr.indptr, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(csr.indices, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(csr.data, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(csc.indptr, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(csc.indices, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(csc.data, np.float32), ctypes.c_float),
        n, m, _ptr(out, ctypes.c_float))
    return out


def _kreciprocal_rows(lib, rank, k1, k2, call):
    """Shared retry + k2-query-expansion driver for the two V builders.
    ``call(cap, idx, w, cnt)`` runs the C kernel and returns the max row size
    needed; rows beyond cap are truncated, so we retry with the reported cap.
    """
    n, rank_w = rank.shape
    half = int(np.around(k1 / 2))
    cap = min(n, (min(k1, rank_w - 1) + 1) * (min(half, rank_w - 1) + 2))
    while True:
        idx = np.empty((n, cap), np.int32)
        w = np.empty((n, cap), np.float32)
        cnt = np.empty(n, np.int32)
        need = call(cap, idx, w, cnt)
        if need <= cap:
            break
        cap = need
    if k2 <= 1:
        return idx, w, cnt
    cap_out = min(n, int(k2) * cap)
    while True:
        idx2 = np.empty((n, cap_out), np.int32)
        w2 = np.empty((n, cap_out), np.float32)
        cnt2 = np.empty(n, np.int32)
        need = lib.reid_query_expand(
            _ptr(idx, ctypes.c_int32), _ptr(w, ctypes.c_float),
            _ptr(cnt, ctypes.c_int32), cap, _ptr(rank, ctypes.c_int32),
            rank_w, n, int(k2), cap_out, _ptr(idx2, ctypes.c_int32),
            _ptr(w2, ctypes.c_float), _ptr(cnt2, ctypes.c_int32))
        if need <= cap_out:
            break
        cap_out = need
    return idx2, w2, cnt2


def kreciprocal_v_native(initial_rank, feats, k1, k2):
    """Sparse k-reciprocal soft-assignment V with k2 query expansion
    (faiss_rerank.py:43-93 without ever materializing the dense (N, N) V).

    initial_rank: (n, rank_w) int32 kNN table (self first), feats: (n, d)
    float32 L2-normalized. Returns padded row storage
    (idx (n, cap) int32, w (n, cap) float32, cnt (n,) int32) of the
    query-expanded V.
    """
    lib = ensure_built()
    rank = np.ascontiguousarray(initial_rank, np.int32)
    f = np.ascontiguousarray(feats, np.float32)
    n, rank_w = rank.shape
    d = f.shape[1]

    def call(cap, idx, w, cnt):
        return lib.reid_kreciprocal_v(
            _ptr(rank, ctypes.c_int32), n, rank_w, _ptr(f, ctypes.c_float),
            d, int(k1), cap, _ptr(idx, ctypes.c_int32),
            _ptr(w, ctypes.c_float), _ptr(cnt, ctypes.c_int32))

    return _kreciprocal_rows(lib, rank, k1, k2, call)


def kreciprocal_v_dist_native(initial_rank, dist, k1, k2):
    """Same sparse V build, but weights exp(-dist[i, j]) from a dense (n, n)
    distance matrix — the eval re-ranking flavor (rerank.py:55-71)."""
    lib = ensure_built()
    rank = np.ascontiguousarray(initial_rank, np.int32)
    d = np.ascontiguousarray(dist, np.float32)
    n, rank_w = rank.shape
    assert d.shape == (n, n)

    def call(cap, idx, w, cnt):
        return lib.reid_kreciprocal_v_dist(
            _ptr(rank, ctypes.c_int32), n, rank_w, _ptr(d, ctypes.c_float),
            int(k1), cap, _ptr(idx, ctypes.c_int32),
            _ptr(w, ctypes.c_float), _ptr(cnt, ctypes.c_int32))

    return _kreciprocal_rows(lib, rank, k1, k2, call)


def jaccard_minsum_rows_native(idx, w, cnt, query_num=None):
    """Jaccard min-sum over padded sparse rows (the kreciprocal_v_native
    output) → dense (m, n) float32 distance matrix."""
    lib = ensure_built()
    n, cap = idx.shape
    m = n if query_num is None else int(query_num)
    cnt64 = cnt.astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(cnt64, out=indptr[1:])
    mask = np.arange(cap)[None, :] < cnt[:, None]
    indices = np.ascontiguousarray(idx[mask], np.int32)
    data = np.ascontiguousarray(w[mask], np.float32)
    # CSC of V == CSR of Vᵀ
    from scipy import sparse

    csc = sparse.csr_matrix(
        (data, indices, indptr), shape=(n, n)).T.tocsr()
    out = np.empty((m, n), np.float32)
    lib.reid_jaccard_minsum(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_float),
        _ptr(np.ascontiguousarray(csc.indptr, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(csc.indices, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(csc.data, np.float32), ctypes.c_float),
        n, m, _ptr(out, ctypes.c_float))
    return out


def infomap_native(src, dst, weight, n, tau=0.15, seed=0):
    """Directed weighted edge list → (labels (n,), num_modules)."""
    lib = ensure_built()
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    weight = np.ascontiguousarray(weight, np.float32)
    labels = np.empty(n, np.int32)
    k = lib.reid_infomap(int(n), int(len(src)), _ptr(src, ctypes.c_int32),
                         _ptr(dst, ctypes.c_int32),
                         _ptr(weight, ctypes.c_float), float(tau), int(seed),
                         _ptr(labels, ctypes.c_int32))
    return labels, int(k)
