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
    if force or not osp.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
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
