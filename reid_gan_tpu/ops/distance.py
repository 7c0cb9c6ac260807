"""Pairwise distance / similarity kernels.

The reference computes eval distance matrices on CPU with
``x²+y²−2x·yᵀ`` via ``addmm_`` (CC/clustercontrast/evaluators.py:71-88) and
k-NN via faiss-gpu. Here every N×N computation is an MXU matmul, computed in
row blocks so arbitrary N streams through fixed-size tiles, and shardable over
the data mesh (each chip owns a row-block of queries against the full
gallery — the blockwise-matmul design of SURVEY.md §5.7).
"""

import functools

import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


@jax.jit
def squared_euclidean(x, y):
    """(m, d), (n, d) → (m, n) squared L2 distances, MXU-dominant form
    ``‖x‖² + ‖y‖² − 2 x·yᵀ`` (CC/clustercontrast/evaluators.py:78-88)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    d = x2 + y2.T - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(d, 0.0)


@jax.jit
def cosine_similarity(x, y):
    """Inner products of L2-normalized rows (faiss IP search equivalent)."""
    return jnp.dot(l2_normalize(x), l2_normalize(y).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _mesh_query_blocks(query, block_rows, mesh):
    """Host query rows → list of device blocks row-sharded over the mesh,
    each the same shape (one compiled program; SURVEY.md §5.8: per-chip block
    matmul against a replicated gallery). Rows are balanced across blocks so
    padding waste is < n_dev·nblocks rows (naive pad-to-block-multiple wastes
    up to a whole block, ~2× work for n just over block_rows·n_dev)."""
    import numpy as np

    from ..parallel.mesh import batch_sharding

    qh = np.asarray(query, np.float32)
    n = qh.shape[0]
    n_dev = mesh.devices.size
    nblocks = max(1, -(-n // (block_rows * n_dev)))
    blk = -(-n // (nblocks * n_dev)) * n_dev
    pad = nblocks * blk - n
    if pad:
        qh = np.concatenate([qh, np.zeros((pad, qh.shape[1]), qh.dtype)], 0)
    sh = batch_sharding(mesh, 2)
    return [jax.device_put(qh[s:s + blk], sh)
            for s in range(0, qh.shape[0], blk)]


def _rolling_drain(block_iter, max_pending):
    """Dispatch device blocks ahead of the host sync, but keep at most
    ``max_pending`` result blocks live on device: once the window is full,
    each new dispatch drains the oldest block to host. Overlaps device
    compute with device→host copies at O(window) — not O(#blocks) — device
    memory (a (block_rows, n) fp32 distance block is GBs at MSMT gallery
    scale)."""
    import numpy as np

    out, pending = [], []
    for b in block_iter:
        pending.append(b)
        if len(pending) >= max_pending:
            out.append(np.asarray(pending.pop(0)))
    out.extend(np.asarray(b) for b in pending)
    return out


def pairwise_distance(query, gallery=None, block_rows=4096, mesh=None,
                      max_pending=2):
    """Full distance matrix, streamed in row blocks (device memory bound by
    max_pending·block_rows×n — blocks past the in-flight window drain to
    host as later blocks dispatch). With ``gallery=None`` computes the
    self-distance matrix (parity: CC/clustercontrast/evaluators.py:71-88).
    With ``mesh``, each block's rows are sharded over the data axis — every
    chip computes its row-slab against the replicated gallery.

    Inputs/outputs are host numpy or jax arrays; result is a host array for
    consumption by the (host-side) CMC/mAP and clustering code.
    """
    import numpy as np

    m = query.shape[0]
    if mesh is not None:
        from ..parallel.mesh import replicated_sharding

        g = jax.device_put(
            np.asarray(query if gallery is None else gallery, np.float32),
            replicated_sharding(mesh))
        out = _rolling_drain(
            (squared_euclidean(qb, g)
             for qb in _mesh_query_blocks(query, block_rows, mesh)),
            max_pending)
        return np.concatenate(out, axis=0)[:m]

    q = jnp.asarray(query, jnp.float32)
    g = q if gallery is None else jnp.asarray(gallery, jnp.float32)
    q, nblocks, blk = _pad_query_blocks(q, block_rows)
    out = _rolling_drain(
        (squared_euclidean(q[s:s + blk], g)
         for s in range(0, nblocks * blk, blk)),
        max_pending)
    return np.concatenate(out, axis=0)[:m]


@functools.partial(jax.jit, static_argnames=("k",))
def knn_block(q_block, gallery_n, k):
    """Top-k nearest neighbors (L2) of a query block against gallery.

    Uses negative squared distance with lax.top_k (MXU matmul + on-chip
    top-k) — the TPU replacement for faiss bruteForceKnn
    (CC/clustercontrast/utils/faiss_rerank.py:39-62).
    Returns (distances (b,k), indices (b,k)) sorted ascending by distance.
    """
    d = squared_euclidean(q_block, gallery_n)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("k",))
def knn_ip_block(q_block, gallery_n, k):
    """Top-k by inner product (features assumed L2-normalized) — the faiss
    IndexFlatIP path used by infomap clustering
    (CC/clustercontrast/utils/infomap_cluster.py:63-72)."""
    s = jnp.dot(q_block, gallery_n.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sim, idx = jax.lax.top_k(s, k)
    return sim, idx


def _pad_query_blocks(q, block_rows):
    """Split the query side into equal-size blocks so every block compiles to
    ONE program shape (a ragged tail block would force a second XLA compile —
    seconds of wasted cold-start per epoch). Rows are balanced across blocks
    (block size ⌈m/nblocks⌉, padding waste < nblocks rows). Single-block
    inputs are returned unpadded. Returns (padded queries, nblocks, blk)."""
    m = q.shape[0]
    if m <= block_rows:
        return q, 1, m
    nblocks = -(-m // block_rows)
    blk = -(-m // nblocks)
    pad = nblocks * blk - m
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)], 0)
    return q, nblocks, blk


def knn_search(features, k, metric="l2", block_rows=4096, mesh=None):
    """All-pairs k-NN of a feature set against itself, streamed in blocks.

    Self-match included as the first neighbor (distance 0 / sim 1), matching
    faiss behavior the reference relies on (k_reciprocal uses k1+1 neighbors
    including self, faiss_rerank.py:23-27). With ``mesh``, query rows are
    sharded over the data axis against the replicated feature matrix — the
    multi-chip replacement for faiss's sharded GPU index
    (CC/clustercontrast/utils/faiss_utils.py:93-105).
    Returns host arrays (vals (N,k), idx (N,k)).
    """
    import numpy as np

    n = features.shape[0]
    fn = knn_block if metric == "l2" else knn_ip_block
    if mesh is not None:
        from ..parallel.mesh import replicated_sharding

        g = jax.device_put(np.asarray(features, np.float32),
                           replicated_sharding(mesh))
        res = [fn(qb, g, k)
               for qb in _mesh_query_blocks(features, block_rows, mesh)]
    else:
        f = jnp.asarray(features, jnp.float32)
        q, nblocks, blk = _pad_query_blocks(f, block_rows)
        # async dispatch of all blocks; host copies overlap device compute
        res = [fn(q[s:s + blk], f, k)
               for s in range(0, nblocks * blk, blk)]
    vals = np.concatenate([np.asarray(v) for v, _ in res], 0)[:n]
    idxs = np.concatenate([np.asarray(i) for _, i in res], 0)[:n]
    return vals, idxs
