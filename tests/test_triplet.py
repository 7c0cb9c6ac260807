"""Batch-hard triplet mining vs a torch TripletMarginLoss oracle
(the reference's commented-out intent: CC/clustercontrast/trainers.py:27,
trainers_b.py:371-378)."""

import numpy as np

from reid_gan_tpu.ops.triplet import (
    batch_hard_mine,
    batch_hard_triplet_loss,
    pairwise_l2,
)


def _batch(rng, n=24, d=16, k=6):
    f = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, k, n).astype(np.int32)
    # guarantee every anchor has at least one positive
    labels[: 2 * k] = np.repeat(np.arange(k), 2)
    return f, labels


def test_mining_matches_numpy_loops(rng):
    f, labels = _batch(rng)
    d_ap, d_an, valid = map(np.asarray, batch_hard_mine(f, labels))
    assert valid.all()
    d = np.sqrt(np.maximum(
        ((f[:, None] - f[None]) ** 2).sum(-1), 0))
    for i in range(len(f)):
        pos = [j for j in range(len(f)) if labels[j] == labels[i] and j != i]
        neg = [j for j in range(len(f)) if labels[j] != labels[i]]
        np.testing.assert_allclose(d_ap[i], d[i, pos].max(), rtol=1e-5)
        np.testing.assert_allclose(d_an[i], d[i, neg].min(), rtol=1e-5)


def test_anchor_without_positive_or_negative_contributes_zero(rng):
    """Singleton-identity anchors (no positive) and single-identity batches
    (no negative) must not inject a spurious margin hinge."""
    f = rng.randn(3, 8).astype(np.float32)
    # anchor 0 is a singleton id: only anchors 1,2 can form triplets
    labels = np.array([0, 1, 1], np.int32)
    _, _, valid = map(np.asarray, batch_hard_mine(f, labels))
    assert valid.tolist() == [False, True, True]
    d = np.sqrt(((f[:, None] - f[None]) ** 2).sum(-1))
    expect = np.mean([max(d[i, 3 - i] - d[i, 0] + 1.0, 0.0) for i in (1, 2)])
    np.testing.assert_allclose(
        float(batch_hard_triplet_loss(f, labels, margin=1.0)), expect,
        rtol=1e-5)
    # all-same-label batch: no negatives anywhere → loss exactly 0
    assert float(batch_hard_triplet_loss(
        f, np.zeros(3, np.int32), margin=1.0)) == 0.0


def test_loss_matches_torch_oracle(rng):
    """Feeding torch's TripletMarginLoss the same mined (a, p, n) triples
    must give the identical loss — the parity contract with the reference's
    nn.TripletMarginLoss(margin=1.0, p=2)."""
    import torch

    f, labels = _batch(rng)
    ours = float(batch_hard_triplet_loss(f, labels, margin=1.0))

    d = np.sqrt(np.maximum(((f[:, None] - f[None]) ** 2).sum(-1), 0))
    same = labels[:, None] == labels[None]
    np.fill_diagonal(same, False)
    p_idx = np.array([np.flatnonzero(same[i])[
        d[i, same[i]].argmax()] for i in range(len(f))])
    n_idx = np.array([np.flatnonzero(~same[i] & (labels != labels[i]))[
        d[i, ~same[i] & (labels != labels[i])].argmin()]
        for i in range(len(f))])
    t = torch.from_numpy(f)
    oracle = torch.nn.TripletMarginLoss(margin=1.0, p=2, eps=0.0)(
        t, t[p_idx], t[n_idx])
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5, atol=1e-6)


def test_soft_and_grad(rng):
    import jax

    f, labels = _batch(rng)
    loss, grads = jax.value_and_grad(
        lambda x: batch_hard_triplet_loss(x, labels, soft=True))(f)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads)).all()
    # the grad-safe sqrt: zero-distance pairs (duplicate rows) must not NaN
    f2 = np.vstack([f, f[:2]])
    l2 = np.concatenate([labels, labels[:2]])
    _, g2 = jax.value_and_grad(
        lambda x: batch_hard_triplet_loss(x, l2))(f2)
    assert np.isfinite(np.asarray(g2)).all()


def test_separated_clusters_zero_loss(rng):
    """Well-separated clusters with margin smaller than the gap → loss 0."""
    c = rng.randn(4, 8).astype(np.float32) * 0.01
    f = np.concatenate([c + 100.0 * i for i in range(3)])
    labels = np.repeat(np.arange(3), 4).astype(np.int32)
    assert float(batch_hard_triplet_loss(f, labels, margin=0.5)) == 0.0
    d = np.asarray(pairwise_l2(f, f))
    # the x²+y²−2xy form cancels catastrophically at ‖x‖~200 (exactly like
    # the reference's addmm_ distmat): diag is ~0 only to fp32 scale·eps
    assert d.shape == (12, 12)
    assert np.abs(np.diag(d)).max() <= 0.05 * np.abs(f).max()
    small = np.asarray(pairwise_l2(f[:4] - f[:4].mean(0), f[:4] - f[:4].mean(0)))
    assert np.allclose(np.diag(small), 0.0, atol=1e-4)
