"""Distance / k-NN kernel tests (ops/distance.py)."""

import numpy as np
from scipy.spatial.distance import cdist

from reid_gan_tpu.ops.distance import (
    cosine_similarity,
    knn_search,
    l2_normalize,
    pairwise_distance,
    squared_euclidean,
)


def test_squared_euclidean_vs_scipy(rng):
    x = rng.randn(33, 17).astype(np.float32)
    y = rng.randn(21, 17).astype(np.float32)
    ours = np.asarray(squared_euclidean(x, y))
    ref = cdist(x, y, "sqeuclidean")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_pairwise_distance_blocked(rng):
    x = rng.randn(100, 8).astype(np.float32)
    full = pairwise_distance(x, block_rows=16)
    ref = cdist(x, x, "sqeuclidean")
    np.testing.assert_allclose(full, ref, atol=1e-3)
    assert full.shape == (100, 100)


def test_knn_self_first(rng):
    f = rng.randn(50, 16).astype(np.float32)
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    dists, idx = knn_search(f, k=5, metric="l2", block_rows=13)
    # first neighbor is self with distance ~0 (faiss parity)
    np.testing.assert_array_equal(idx[:, 0], np.arange(50))
    assert np.abs(dists[:, 0]).max() < 1e-4
    # ascending distances
    assert (np.diff(dists, axis=1) >= -1e-5).all()


def test_knn_ip_matches_l2_on_normalized(rng):
    f = rng.randn(40, 8).astype(np.float32)
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    _, idx_l2 = knn_search(f, k=4, metric="l2")
    _, idx_ip = knn_search(f, k=4, metric="ip")
    np.testing.assert_array_equal(idx_l2, idx_ip)


def test_cosine_similarity_range(rng):
    x = rng.randn(10, 32).astype(np.float32)
    s = np.asarray(cosine_similarity(x, x))
    assert np.allclose(np.diag(s), 1.0, atol=1e-5)
    assert s.max() <= 1.0 + 1e-5 and s.min() >= -1.0 - 1e-5


def test_l2_normalize(rng):
    x = rng.randn(7, 5).astype(np.float32)
    n = np.asarray(l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_knn_search_mesh_equivalence(rng, mesh):
    """Mesh-sharded kNN (query rows sharded over the data axis, gallery
    replicated — the faiss sharded-index replacement) must equal the
    single-device blockwise path, including padded tail blocks."""
    f = rng.randn(37, 16).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    for metric in ("l2", "ip"):
        v0, i0 = knn_search(f, k=5, metric=metric, block_rows=13)
        # blk = 2*8 = 16 → 3 sharded blocks with padding
        v1, i1 = knn_search(f, k=5, metric=metric, block_rows=2, mesh=mesh)
        # single sharded block (default block_rows)
        v2, i2 = knn_search(f, k=5, metric=metric, mesh=mesh)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(i0, i2)
        np.testing.assert_allclose(v0, v1, atol=1e-5)
        np.testing.assert_allclose(v0, v2, atol=1e-5)


def test_pairwise_distance_mesh_equivalence(rng, mesh):
    x = rng.randn(37, 8).astype(np.float32)
    y = rng.randn(21, 8).astype(np.float32)
    base = pairwise_distance(x, y)
    np.testing.assert_allclose(pairwise_distance(x, y, mesh=mesh), base,
                               atol=1e-5)
    np.testing.assert_allclose(
        pairwise_distance(x, y, block_rows=2, mesh=mesh), base, atol=1e-5)


def test_block_balancing_invariants(mesh):
    """Balanced blocking: one program shape, padding waste bounded by
    nblocks (× n_dev on the mesh) rows — never a whole block."""
    import jax.numpy as jnp

    from reid_gan_tpu.ops.distance import _mesh_query_blocks, _pad_query_blocks

    for m in (1, 5, 4095, 4096, 4097, 12936, 32621):
        q = jnp.zeros((m, 4))
        qp, nblocks, blk = _pad_query_blocks(q, 4096)
        assert nblocks * blk == qp.shape[0] >= m
        assert qp.shape[0] - m < max(nblocks, 1)
        if m > 4096:
            assert blk <= 4096
    for m in (1, 7, 9, 63, 4096 * 8 + 1):
        blocks = _mesh_query_blocks(np.zeros((m, 4), np.float32), 4096, mesh)
        total = sum(b.shape[0] for b in blocks)
        assert total >= m and total - m < len(blocks) * 8
        assert all(b.shape[0] % 8 == 0 and b.shape[0] == blocks[0].shape[0]
                   for b in blocks)
