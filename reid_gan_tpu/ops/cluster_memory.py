"""ClusterMemory — the cluster-contrast InfoNCE memory bank, reformulated as
pure state-in/state-out functions.

Reference (CC/clustercontrast/models/cm.py): custom autograd.Functions whose
*backward* both propagates the input gradient and mutates the memory bank
in-place (cm.py:29-31). That side-effecting design is single-process-only
(SURVEY.md §5.2). The mathematically identical TPU formulation:

    logits = x_n @ stop_gradient(M)ᵀ / temp        (forward; cm.py:17,134)
    loss   = CE(logits, y), reduction='none'       (cm.py:135)
    M'     = momentum_update(M, x_n, y)            (applied after the step)

— identical because the reference's backward never differentiates through the
bank. In-batch duplicate labels update **sequentially in batch order** in the
reference loop; we replicate that exactly with a `lax.scan` fold (bit-stable
under any sharding because the update runs replicated over the all-gathered
batch).

The bank is padded to a static ``num_clusters`` (pad-and-mask, SURVEY.md §7
'ragged shapes') so cluster-count changes between epochs don't retrace.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MemoryState(NamedTuple):
    features: jnp.ndarray      # (K_pad, D) centroid bank
    gan_features: jnp.ndarray  # (K_pad, D) parallel GAN bank (CM_gan) or ()
    num_valid: jnp.ndarray     # scalar int32 — live clusters ≤ K_pad


def init_memory(centroids, k_pad=None, gan_centroids=None):
    """Build a MemoryState from per-epoch centroids (already L2-normalized as
    in CC/examples/...usl.py:169-184), zero-padded to k_pad rows. The bank
    dtype is at least float32; float64 centroids are preserved (used by the
    fp64 torch train-parity oracle)."""
    c = jnp.asarray(centroids)
    c = c.astype(jnp.promote_types(c.dtype, jnp.float32))
    k = c.shape[0]
    k_pad = k_pad or k
    pad = ((0, k_pad - k), (0, 0))
    feats = jnp.pad(c, pad)
    if gan_centroids is not None:
        g = jnp.pad(jnp.asarray(gan_centroids, c.dtype), pad)
    else:
        g = jnp.zeros((0, c.shape[1]), c.dtype)
    return MemoryState(feats, g, jnp.asarray(k, jnp.int32))


def _l2n(x, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def memory_loss(x, targets, state, temp=0.05, ex_f=None, group_size=1):
    """Per-sample InfoNCE against the (stop-gradient) bank
    (cm.py:123-137). Gradient flows only to ``x``.

    This plain-XLA formulation IS the fast path on TPU: a hand-written
    flash-softmax Pallas kernel (streamed K-blocks, custom VJP) was
    benchmarked against it on a real v5e chip at B=256, D=2048 and lost at
    every bank size — value_and_grad ms, XLA vs best Pallas config:
    K=1,024: 0.69 vs 0.68 (1.02x); K=10,240: 1.28 vs 1.59 (0.81x);
    K=30,720: 2.71 vs 3.71 (0.73x). XLA fuses the (B,K) logits matmul with
    the masked log-sum-exp well at these shapes, and the kernel pays a
    second logits matmul in its backward. The kernel was removed (r3);
    resurrect from git history only with a shape regime that beats this.

    ex_f: optional (T, D) extended synthetic negatives appended to the logits
    with the −10000·I repeat-interleave self-mask of
    ClusterMemory_Gradient.forward (cm.py:158-182).
    Returns (per-sample loss (B,), logits (B, K_pad[+T])).
    """
    x = _l2n(x)
    bank = jax.lax.stop_gradient(state.features)
    acc_t = jnp.promote_types(jnp.promote_types(x.dtype, bank.dtype),
                              jnp.float32)
    logits = jnp.dot(x, bank.T, preferred_element_type=acc_t,
                     precision=jax.lax.Precision.HIGHEST)
    k_pad = bank.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    logits = jnp.where(col < state.num_valid, logits, -jnp.inf)
    if ex_f is not None:
        ex = _l2n(ex_f)
        t = ex.shape[0]
        lex = jnp.dot(x, ex.T, preferred_element_type=acc_t,
                      precision=jax.lax.Precision.HIGHEST)
        # mask each sample's own synthetic source: −10000·I repeated per group
        row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], t), 0) // group_size
        colx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], t), 1)
        lex = lex + jnp.where(row == colx, -10000.0, 0.0)
        logits = jnp.concatenate([logits, lex], axis=1)
    logits = logits / temp
    logz = jax.scipy.special.logsumexp(logits, axis=1)
    picked = jnp.take_along_axis(logits, targets[:, None], axis=1)[:, 0]
    loss = logz - picked
    return loss, logits


def update_memory(state, x, targets, momentum=0.2, use_hard=False,
                  gan_x=None, group_size=None):
    """Momentum bank update, applied AFTER the gradient step.

    - plain CM (cm.py:29-31): sequential per-sample fold
      ``M[y] ← normalize(m·M[y] + (1−m)·x)`` in batch order.
    - CM_Hard (cm.py:58-70): per cluster, the batch sample with MIN similarity
      to the current centroid updates once.
    - CM_gan (cm.py:99-103): plain update of both feature and GAN banks.

    ``group_size``: static per-cluster occurrence bound (the sampler's
    num_instances — RandomMultipleGallerySampler yields exactly K instances
    per pid). When given, the plain fold scans over occurrence DEPTH
    (group_size iterations of parallel disjoint scatters) instead of batch
    position (B iterations of single-row scatters) — bit-identical, with a
    ``lax.cond`` fallback to the batch-order scan if any label occurs more
    often than the bound.
    """
    x = _l2n(jax.lax.stop_gradient(x))
    if use_hard:
        return _update_hard(state, x, targets, momentum)
    feats = _plain_fold(state.features, x, targets, momentum, group_size)
    gan_feats = state.gan_features
    if gan_x is not None and state.gan_features.shape[0] > 0:
        gan_feats = _plain_fold(state.gan_features,
                                jax.lax.stop_gradient(gan_x), targets,
                                momentum, group_size)
    return state._replace(features=feats, gan_features=gan_feats)


def _plain_fold(bank, x, targets, momentum, group_size=None):
    if group_size is None or group_size >= x.shape[0]:
        return _sequential_fold(bank, x, targets, momentum)
    # occ[i] = # of earlier batch slots with the same label — the sample's
    # update depth within its cluster's sequential chain
    b = x.shape[0]
    eq = targets[None, :] == targets[:, None]
    lower = jnp.tril(jnp.ones((b, b), bool), -1)
    occ = jnp.sum(eq & lower, axis=1).astype(jnp.int32)
    return jax.lax.cond(
        jnp.max(occ) >= group_size,
        lambda bk: _sequential_fold(bk, x, targets, momentum),
        lambda bk: _occurrence_fold(bk, x, targets, momentum, occ, group_size),
        bank)


def _sequential_fold(bank, x, targets, momentum):
    def body(feats, inp):
        xi, yi = inp
        row = feats[yi]
        row = momentum * row + (1.0 - momentum) * xi
        row = row * jax.lax.rsqrt(jnp.sum(row * row) + 1e-24)
        return feats.at[yi].set(row), None

    bank, _ = jax.lax.scan(body, bank, (x, targets))
    return bank


def _occurrence_fold(bank, x, targets, momentum, occ, group_size):
    """Depth-g of every cluster's chain updates in one parallel scatter:
    within a depth the touched rows are distinct (occ is unique per label),
    and updates to different rows commute, so batch-order semantics are
    preserved exactly."""
    k_pad = bank.shape[0]

    def body(feats, g):
        rows = feats[targets]                               # (B, D)
        upd = momentum * rows + (1.0 - momentum) * x
        upd = upd * jax.lax.rsqrt(
            jnp.sum(upd * upd, axis=-1, keepdims=True) + 1e-24)
        # rows whose depth isn't g scatter out of bounds and are dropped
        tgt = jnp.where(occ == g, targets, k_pad)
        return feats.at[tgt].set(upd, mode="drop"), None

    bank, _ = jax.lax.scan(body, bank,
                           jnp.arange(group_size, dtype=jnp.int32))
    return bank


def _update_hard(state, x, targets, momentum):
    """Vectorized CM_Hard: choose per cluster the batch sample with minimum
    dot-product to the PRE-update centroid, first-in-batch tie-break (matches
    the np.argmin over the batch-ordered list at cm.py:58-70): segment-min of
    the similarities, then segment-min of the batch index over the exact
    (float-equal) argmin set — identical winner to the strict-less scan."""
    k_pad = state.features.shape[0]
    b = x.shape[0]
    sims = jnp.sum(x * state.features[targets], axis=-1)  # (B,)

    best_sim = jax.ops.segment_min(sims, targets, num_segments=k_pad)
    is_best = sims == best_sim[targets]
    idxs = jnp.arange(b, dtype=jnp.int32)
    best_idx = jax.ops.segment_min(jnp.where(is_best, idxs, b), targets,
                                   num_segments=k_pad)

    touched = best_idx < b
    hard_x = x[jnp.clip(best_idx, 0, b - 1)]                   # (K_pad, D)
    upd = momentum * state.features + (1.0 - momentum) * hard_x
    upd = upd * jax.lax.rsqrt(jnp.sum(upd * upd, axis=-1, keepdims=True) + 1e-24)
    feats = jnp.where(touched[:, None], upd, state.features)
    return state._replace(features=feats)


class GradientMemoryState(NamedTuple):
    """ClusterMemory_Gradient (cm.py:140-193): clusters as a TRAINABLE tensor
    with a private SGD optimizer."""
    clusters: jnp.ndarray     # (K, D) unnormalized trainable centroids
    num_valid: jnp.ndarray


def init_gradient_memory(centroids, k_pad=None):
    c = jnp.asarray(centroids, jnp.float32)
    k = c.shape[0]
    k_pad = k_pad or k
    return GradientMemoryState(jnp.pad(c, ((0, k_pad - k), (0, 0))),
                               jnp.asarray(k, jnp.int32))


def gradient_memory_loss(x, targets, state, temp=0.05, ex_f=None,
                         group_size=1):
    """Forward against detached NORMALIZED clusters; extended-logit masking as
    in memory_loss (cm.py:158-182). Returns mean CE (cm.py:181)."""
    normed = _l2n(state.clusters)
    proxy = MemoryState(jax.lax.stop_gradient(normed),
                        jnp.zeros((0, state.clusters.shape[1])),
                        state.num_valid)
    loss, logits = memory_loss(x, targets, proxy, temp, ex_f, group_size)
    return loss.mean(), logits


def update_gradient_clusters(state, grads, p_ids, cluster_lr=0.1, eps=1e-16):
    """SGD step on the trainable clusters with per-row gradient normalization
    for the touched ids (cm.py:184-193). ``grads``: (K, D) gradient of the
    GAN loss wrt state.clusters; ``p_ids``: boolean mask (K,) of rows to
    row-normalize."""
    norms = jnp.linalg.norm(grads, axis=1, keepdims=True) + eps
    g = jnp.where(p_ids[:, None], grads / norms, grads)
    return state._replace(clusters=state.clusters - cluster_lr * g)


@partial(jax.jit, static_argnames=("temp", "momentum", "use_hard"))
def memory_step(x, targets, state, temp=0.05, momentum=0.2, use_hard=False,
                gan_x=None):
    """Convenience: loss (per-sample) + post-step bank update in one call.
    NOTE: for training, call memory_loss inside your grad fn and
    update_memory outside — the update must not be differentiated."""
    loss, _ = memory_loss(x, targets, state, temp)
    new_state = update_memory(state, x, targets, momentum, use_hard, gan_x)
    return loss, new_state
