"""Batch-hard triplet mining as one MXU program.

The reference carries triplet loss only as commented-out intent
(CC/clustercontrast/trainers.py:27 ``nn.TripletMarginLoss(margin=1.0, p=2)``;
the synthesized-pair use at trainers_b.py:371-378) — implemented here to the
intended semantics, per the north-star "batch-hard triplet mining …
become[s a] TPU matmul kernel": the full pairwise-distance matrix is a
single batch matmul, and the hardest positive/negative per anchor are masked
row reductions that XLA fuses into it.
"""

import jax
import jax.numpy as jnp

from .distance import squared_euclidean


@jax.jit
def pairwise_l2(x, y):
    """Euclidean (p=2) distances with a grad-safe sqrt at zero."""
    d2 = squared_euclidean(x, y)
    # sqrt has an infinite gradient at 0 (the diagonal); clamp then re-zero
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    return jnp.where(d2 <= 1e-12, 0.0, d)


@jax.jit
def batch_hard_mine(features, labels):
    """Hardest positive / hardest negative distance per anchor
    (Hermans et al., "In Defense of the Triplet Loss", batch-hard):
    d_ap[i] = max_j { d(i,j) : labels j == i, j ≠ i },
    d_an[i] = min_j { d(i,j) : labels j ≠ i }.
    Returns (d_ap, d_an, valid): distances are 0 where the batch holds no
    positive (resp. negative) for the anchor, and ``valid`` flags anchors
    that have BOTH — only those can form a triplet."""
    d = pairwise_l2(features, features)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos = same & ~eye
    d_ap = jnp.max(jnp.where(pos, d, -jnp.inf), axis=1)
    d_an = jnp.min(jnp.where(~same, d, jnp.inf), axis=1)
    valid = jnp.isfinite(d_ap) & jnp.isfinite(d_an)
    d_ap = jnp.where(jnp.isfinite(d_ap), d_ap, 0.0)
    d_an = jnp.where(jnp.isfinite(d_an), d_an, 0.0)
    return d_ap, d_an, valid


def batch_hard_triplet_loss(features, labels, margin=1.0, soft=False):
    """Mean batch-hard triplet loss over the anchors that have both a
    positive and a negative in the batch (singleton-identity or
    single-identity anchors contribute nothing — a hinge on their zeroed
    distances would otherwise inject a spurious ``margin`` gradient).

    ``margin`` defaults to the reference's commented
    ``TripletMarginLoss(margin=1.0, p=2)``. ``soft=True`` uses the
    margin-free softplus formulation ln(1+exp(d_ap−d_an)).
    """
    d_ap, d_an, valid = batch_hard_mine(features, labels)
    if soft:
        per_anchor = jax.nn.softplus(d_ap - d_an)
    else:
        per_anchor = jnp.maximum(d_ap - d_an + margin, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)
    return jnp.sum(per_anchor) / jnp.maximum(jnp.sum(valid), 1)
