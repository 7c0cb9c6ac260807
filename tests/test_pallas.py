"""Pallas fused-InfoNCE kernel vs the XLA memory_loss path (interpret mode on
CPU; compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.ops.cluster_memory import init_memory, memory_loss
from reid_gan_tpu.ops.pallas.infonce import fused_infonce


def _setup(rng, b=16, k=40, d=64, k_pad=64):
    centers = rng.randn(k, d).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    state = init_memory(centers, k_pad=k_pad)
    x = rng.randn(b, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = rng.randint(0, k, b).astype(np.int32)
    return state, x, y


def test_forward_matches_xla(rng):
    state, x, y = _setup(rng)
    ref, _ = memory_loss(jnp.asarray(x), jnp.asarray(y), state, temp=0.05)
    out = fused_infonce(jnp.asarray(x), state.features, jnp.asarray(y),
                        state.num_valid, 0.05, 32, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_blocking_invariant(rng):
    state, x, y = _setup(rng)
    a = fused_infonce(jnp.asarray(x), state.features, jnp.asarray(y),
                      state.num_valid, 0.05, 16, 8, True)
    b = fused_infonce(jnp.asarray(x), state.features, jnp.asarray(y),
                      state.num_valid, 0.05, 64, 4, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


def test_gradient_matches_xla(rng):
    """The kernel takes pre-normalized x (no internal _l2n), so the oracle is
    plain CE over raw logits — callers compose their own normalization."""
    state, x, y = _setup(rng)
    yj = jnp.asarray(y)
    mask = jnp.arange(state.features.shape[0]) < state.num_valid

    def ref_loss(xx):
        logits = jnp.dot(xx, state.features.T,
                         precision=jax.lax.Precision.HIGHEST) / 0.05
        logits = jnp.where(mask[None, :], logits, -jnp.inf)
        logz = jax.scipy.special.logsumexp(logits, axis=1)
        return (logz - jnp.take_along_axis(logits, yj[:, None], 1)[:, 0]).mean()

    def ker_loss(xx):
        return fused_infonce(xx, state.features, yj,
                             state.num_valid, 0.05, 32, 8, True).mean()

    g_ref = jax.grad(ref_loss)(jnp.asarray(x))
    g_ker = jax.grad(ker_loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_gradient_composes_with_normalization(rng):
    """l2n(x) ∘ kernel must reproduce memory_loss's gradient exactly."""
    state, x, y = _setup(rng)
    yj = jnp.asarray(y)

    def _l2n(v):
        return v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)

    def ref_loss(xx):
        losses, _ = memory_loss(xx, yj, state, temp=0.05)
        return losses.mean()

    def ker_loss(xx):
        return fused_infonce(_l2n(xx), state.features, yj,
                             state.num_valid, 0.05, 32, 8, True).mean()

    g_ref = jax.grad(ref_loss)(jnp.asarray(x))
    g_ker = jax.grad(ker_loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)
