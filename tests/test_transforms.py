"""Device-side augmentation kernel tests (ops/transforms.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.ops import transforms as T


def _batch(n=4, h=80, w=40):
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_eval_transform_deterministic():
    x = _batch()
    out = T.reid_augment(jax.random.PRNGKey(0), x, height=64, width=32, train=False)
    out2 = T.reid_augment(jax.random.PRNGKey(1), x, height=64, width=32, train=False)
    assert out.shape == (4, 64, 32, 3)
    np.testing.assert_allclose(out, out2)  # eval path ignores the key


def test_normalize_roundtrip():
    x = jnp.asarray(_batch(), jnp.float32) / 255.0
    y = T.normalize(x)
    np.testing.assert_allclose(np.asarray(T.denormalize(y)), np.asarray(x), atol=1e-5)


def test_train_transform_shape_and_randomness():
    x = _batch()
    a = T.reid_augment(jax.random.PRNGKey(0), x, height=64, width=32, train=True)
    b = T.reid_augment(jax.random.PRNGKey(1), x, height=64, width=32, train=True)
    assert a.shape == (4, 64, 32, 3)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # same key → same augmentation (explicit RNG threading)
    a2 = T.reid_augment(jax.random.PRNGKey(0), x, height=64, width=32, train=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))


def test_random_erasing_only_changes_rectangle():
    x = jnp.ones((2, 32, 16, 3), jnp.float32)
    out = np.asarray(T.random_erasing(jax.random.PRNGKey(3), x, p=1.0, fill=0.0))
    for i in range(2):
        changed = np.argwhere((out[i] != 1.0).any(-1))
        assert changed.size > 0
        # changed pixels form a full rectangle
        y0, x0 = changed.min(0)
        y1, x1 = changed.max(0)
        assert ((out[i, y0:y1 + 1, x0:x1 + 1] != 1.0).any(-1)).all()


def test_random_hflip_is_exact_flip():
    x = jnp.asarray(_batch(8, 16, 8), jnp.float32)
    out, flipped = T.random_hflip(jax.random.PRNGKey(0), x)
    out = np.asarray(out)
    flipped = np.asarray(flipped)
    assert flipped.any() and not flipped.all()
    for i in range(8):
        expect = np.asarray(x)[i, :, ::-1] if flipped[i] else np.asarray(x)[i]
        np.testing.assert_allclose(out[i], expect)


def test_crop_full_image_equals_resize():
    """A crop covering the whole image must equal plain resize."""
    x = jnp.asarray(_batch(1, 64, 32), jnp.float32) / 255.0
    from reid_gan_tpu.ops.transforms import _crop_resize_one
    full = _crop_resize_one(x[0], 0.0, 0.0, 64.0, 32.0, 32, 16)
    ref = jax.image.resize(x[0], (32, 16, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), atol=1e-5)


def test_gan_input_transform_range():
    x = _batch()
    out = np.asarray(T.gan_input_transform(x, height=32, width=16))
    assert out.shape == (4, 32, 16, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_diff_transform_differentiable():
    gen = jnp.zeros((2, 32, 16, 3))

    def loss(g):
        return jnp.sum(T.diff_transform(g, height=64, width=32) ** 2)

    g = jax.grad(loss)(gen)
    assert g.shape == gen.shape
    assert np.isfinite(np.asarray(g)).all()
