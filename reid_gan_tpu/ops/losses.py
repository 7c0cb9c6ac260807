"""Auxiliary loss ops: gradient-matching and contrastive helpers.

Parity: CC/clustercontrast/trainers_b.py —
- distance_wb (:72-89) and match_loss (:92-144): per-layer gradient matching
  ('ours' grouped cosine / 'mse' / 'cos') used by the gradient-matching AL
  option group (CC/examples/options/base_options.py).
- contrastive_loss (:1151-1159), intra_cl (:1161-1172), cl_loss (:1174-1184).
"""

import jax
import jax.numpy as jnp


def _l2n(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def distance_wb(gwr, gws):
    """Grouped cosine distance between two gradient tensors
    (trainers_b.py:72-89): reshape to (out, -1), 1 − Σ cos per row."""
    shape = gwr.shape
    if len(shape) == 4:
        gwr = gwr.reshape(shape[0], -1)
        gws = gws.reshape(shape[0], -1)
    elif len(shape) == 3:
        gwr = gwr.reshape(shape[0], -1)
        gws = gws.reshape(shape[0], -1)
    elif len(shape) == 2:
        pass
    elif len(shape) == 1:
        return jnp.zeros(())  # bias/BN vectors are skipped (trainers_b:84-87)
    num = jnp.sum(gwr * gws, axis=-1)
    den = jnp.linalg.norm(gwr, axis=-1) * jnp.linalg.norm(gws, axis=-1) + 1e-6
    return jnp.sum(1.0 - num / den)


def match_loss(g_syn, g_real, dis_metric="ours"):
    """Sum of per-leaf gradient distances between two gradient pytrees
    (trainers_b.py:92-144)."""
    syn_leaves = jax.tree_util.tree_leaves(g_syn)
    real_leaves = jax.tree_util.tree_leaves(g_real)
    if dis_metric == "ours":
        return sum(distance_wb(a, b) for a, b in zip(real_leaves, syn_leaves))
    if dis_metric == "mse":
        gr = jnp.concatenate([a.reshape(-1) for a in real_leaves])
        gs = jnp.concatenate([a.reshape(-1) for a in syn_leaves])
        return jnp.sum((gr - gs) ** 2)
    if dis_metric == "cos":
        gr = jnp.concatenate([a.reshape(-1) for a in real_leaves])
        gs = jnp.concatenate([a.reshape(-1) for a in syn_leaves])
        return 1.0 - jnp.sum(gr * gs) / (
            jnp.linalg.norm(gr) * jnp.linalg.norm(gs) + 1e-6)
    raise ValueError(f"unknown distance metric: {dis_metric}")


def contrastive_loss(q, k, temp=0.05):
    """InfoNCE with in-batch identity targets, scaled by 2·T
    (trainers_b.py:1151-1159)."""
    q = _l2n(q)
    k = _l2n(k)
    logits = jnp.einsum("nc,mc->nm", q, k) / temp
    labels = jnp.arange(q.shape[0])
    logz = jax.scipy.special.logsumexp(logits, axis=1)
    loss = (logz - logits[jnp.arange(q.shape[0]), labels]).mean()
    return loss * 2 * temp


def intra_cl(q, k, group_size=16, temp=0.05):
    """Group-summed contrastive loss (trainers_b.py:1161-1172)."""
    q = _l2n(q)
    k = _l2n(k)
    logits = jnp.einsum("nc,mc->nm", q, k) / temp
    ks = logits.shape[1]
    logits = jnp.sum(logits.reshape(-1, group_size, ks), axis=1)
    n = logits.shape[0]
    labels = jnp.arange(n)
    logz = jax.scipy.special.logsumexp(logits, axis=1)
    return (logz - logits[jnp.arange(n), labels]).mean()


def cl_loss(q, k, group_size=16, temp=0.05):
    """Column-group-summed contrastive loss (trainers_b.py:1174-1184)."""
    q = _l2n(q)
    k = _l2n(k)
    logits = jnp.einsum("nc,mc->nm", q, k) / temp
    n_groups = logits.shape[1] // group_size
    logits = jnp.sum(logits.reshape(logits.shape[0], n_groups, group_size),
                     axis=-1)
    n = n_groups // 2
    labels = jnp.repeat(jnp.arange(n), group_size)[: logits.shape[0]]
    logz = jax.scipy.special.logsumexp(logits, axis=1)
    return (logz - jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]).mean()
