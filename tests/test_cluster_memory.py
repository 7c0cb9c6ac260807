"""ClusterMemory math parity vs a numpy oracle of cm.py semantics
(CC/clustercontrast/models/cm.py:9-33,40-72,110-137)."""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.ops.cluster_memory import (
    init_memory,
    memory_loss,
    update_memory,
)


def _l2n(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def _oracle_ce(x, y, bank, temp):
    """normalize → logits → /temp → per-sample CE (cm.py:123-137)."""
    xn = _l2n(x)
    logits = xn @ bank.T / temp
    logz = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) + \
        logits.max(1)
    return logz - logits[np.arange(len(y)), y]


def _oracle_update_plain(bank, x, y, m):
    """Sequential in-place momentum update (cm.py:29-31)."""
    bank = bank.copy()
    for xi, yi in zip(_l2n(x), y):
        bank[yi] = m * bank[yi] + (1 - m) * xi
        bank[yi] /= np.linalg.norm(bank[yi])
    return bank


def _oracle_update_hard(bank, x, y, m):
    """CM_Hard: min-similarity batch sample per cluster (cm.py:58-70)."""
    bank = bank.copy()
    xn = _l2n(x)
    groups = {}
    for i, yi in enumerate(y):
        groups.setdefault(int(yi), []).append(i)
    for yi, idxs in groups.items():
        sims = [float(xn[i] @ bank[yi]) for i in idxs]
        hard = xn[idxs[int(np.argmin(sims))]]
        bank[yi] = m * bank[yi] + (1 - m) * hard
        bank[yi] /= np.linalg.norm(bank[yi])
    return bank


def _setup(rng, k=6, d=16, b=12, k_pad=None):
    centers = _l2n(rng.randn(k, d)).astype(np.float32)
    x = rng.randn(b, d).astype(np.float32)
    y = rng.randint(0, k, b).astype(np.int32)
    # ensure duplicate labels exercise the sequential fold
    y[1] = y[0]
    y[2] = y[0]
    state = init_memory(centers, k_pad=k_pad)
    return centers, x, y, state


def test_memory_loss_matches_oracle(rng):
    centers, x, y, state = _setup(rng)
    loss, _ = memory_loss(jnp.asarray(x), jnp.asarray(y), state, temp=0.05)
    ref = _oracle_ce(x, y, centers, 0.05)
    np.testing.assert_allclose(np.asarray(loss), ref, rtol=1e-4, atol=1e-5)


def test_memory_loss_padding_invariant(rng):
    centers, x, y, _ = _setup(rng)
    s1 = init_memory(centers)
    s2 = init_memory(centers, k_pad=32)
    l1, _ = memory_loss(jnp.asarray(x), jnp.asarray(y), s1, temp=0.05)
    l2, _ = memory_loss(jnp.asarray(x), jnp.asarray(y), s2, temp=0.05)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_gradient_only_to_inputs(rng):
    centers, x, y, state = _setup(rng)

    def f(xx):
        loss, _ = memory_loss(xx, jnp.asarray(y), state, temp=0.05)
        return loss.mean()

    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_update_plain_sequential_parity(rng):
    centers, x, y, state = _setup(rng)
    new = update_memory(state, jnp.asarray(x), jnp.asarray(y), momentum=0.2)
    ref = _oracle_update_plain(centers, x, y, 0.2)
    np.testing.assert_allclose(np.asarray(new.features), ref, rtol=1e-4, atol=1e-5)


def test_update_hard_parity(rng):
    centers, x, y, state = _setup(rng)
    new = update_memory(state, jnp.asarray(x), jnp.asarray(y), momentum=0.2,
                        use_hard=True)
    ref = _oracle_update_hard(centers, x, y, 0.2)
    np.testing.assert_allclose(np.asarray(new.features), ref, rtol=1e-4, atol=1e-5)


def test_update_untouched_rows_stable(rng):
    centers, x, y, state = _setup(rng, k=8, b=4)
    y = np.zeros(4, np.int32)  # only cluster 0 updated
    new = update_memory(state, jnp.asarray(x), jnp.asarray(y), momentum=0.2)
    np.testing.assert_allclose(np.asarray(new.features)[1:8],
                               np.asarray(state.features)[1:8])


def test_extended_negatives_mask(rng):
    centers, x, y, state = _setup(rng, b=8)
    ex = _l2n(rng.randn(4, 16)).astype(np.float32)  # group_size = 2
    loss, logits = memory_loss(jnp.asarray(x), jnp.asarray(y), state,
                               temp=0.05, ex_f=jnp.asarray(ex), group_size=2)
    logits = np.asarray(logits)
    k = state.features.shape[0]
    # sample i's own synthetic column (i // group_size) is masked by −10000/temp
    for i in range(8):
        assert logits[i, k + i // 2] < -1000
    assert np.isfinite(np.asarray(loss)).all()


def test_occurrence_fold_bitexact_vs_sequential(rng):
    """The group_size occurrence-depth fold must match the batch-order scan
    bit for bit, for both P×K-grouped and shuffled label layouts."""
    k, d, p, g = 9, 16, 4, 4
    centers = _l2n(rng.randn(k, d)).astype(np.float32)
    x = rng.randn(p * g, d).astype(np.float32)
    grouped = np.repeat(rng.choice(k, p, replace=False), g).astype(np.int32)
    shuffled = grouped.copy()
    rng.shuffle(shuffled)
    for y in (grouped, shuffled):
        for gan in (False, True):
            gk = {}
            if gan:
                gk["gan_centroids"] = _l2n(rng.randn(k, d)).astype(np.float32)
            state = init_memory(centers, **gk)
            gx = jnp.asarray(rng.randn(p * g, d).astype(np.float32)) if gan \
                else None
            slow = update_memory(state, jnp.asarray(x), jnp.asarray(y),
                                 momentum=0.2, gan_x=gx)
            fast = update_memory(state, jnp.asarray(x), jnp.asarray(y),
                                 momentum=0.2, gan_x=gx, group_size=g)
            np.testing.assert_array_equal(np.asarray(slow.features),
                                          np.asarray(fast.features))
            np.testing.assert_array_equal(np.asarray(slow.gan_features),
                                          np.asarray(fast.gan_features))


def test_occurrence_fold_overflow_falls_back(rng):
    """A label occurring more often than group_size trips the lax.cond
    fallback to the sequential fold — results stay exact."""
    k, d, b = 5, 8, 12
    centers = _l2n(rng.randn(k, d)).astype(np.float32)
    x = rng.randn(b, d).astype(np.float32)
    y = np.zeros(b, np.int32)          # one label 12 times > group_size 4
    state = init_memory(centers)
    fast = update_memory(state, jnp.asarray(x), jnp.asarray(y),
                         momentum=0.2, group_size=4)
    ref = _oracle_update_plain(centers, x, y, 0.2)
    np.testing.assert_allclose(np.asarray(fast.features), ref,
                               rtol=1e-4, atol=1e-5)


def test_update_hard_first_in_batch_tiebreak(rng):
    """Two batch samples with IDENTICAL minimum similarity: the earlier batch
    slot must win (strict-less scan semantics of cm.py:58-70)."""
    k, d = 3, 8
    centers = _l2n(rng.randn(k, d)).astype(np.float32)
    x = np.stack([centers[0] * 2.0, centers[0] * 2.0,
                  centers[0] * 3.0]).astype(np.float32)
    # samples 0 and 1 normalize to the same vector → equal sims; 2 also equal
    y = np.zeros(3, np.int32)
    state = init_memory(centers)
    new = update_memory(state, jnp.asarray(x), jnp.asarray(y), momentum=0.2,
                        use_hard=True)
    ref = _oracle_update_hard(centers, x, y, 0.2)   # np.argmin → first index
    np.testing.assert_allclose(np.asarray(new.features), ref,
                               rtol=1e-5, atol=1e-6)
