"""k-means pseudo-label generator on TPU (Lloyd iterations as MXU matmuls).

Replaces faiss.Kmeans in CC/clustercontrast/models/kmeans.py:14-34
(label_generator_kmeans: 20 iters over L2-normalized features).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans(feats, init_idx, k, iters):
    centers = feats[init_idx]

    def step(centers, _):
        # assign: nearest center by squared L2 (‖c‖²−2x·c; ‖x‖² constant)
        xc = jnp.dot(feats, centers.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        c2 = jnp.sum(centers * centers, axis=1)
        assign = jnp.argmin(c2[None, :] - 2.0 * xc, axis=1)
        # update: segment mean
        onehot = jax.nn.one_hot(assign, k, dtype=feats.dtype)
        sums = jnp.dot(onehot.T, feats, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    xc = jnp.dot(feats, centers.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(centers * centers, axis=1)
    assign = jnp.argmin(c2[None, :] - 2.0 * xc, axis=1)
    return assign, centers


def kmeans_labels(features, num_clusters, iters=20, seed=0):
    """Returns (labels (N,), centers (k, D)) as host arrays."""
    feats = jnp.asarray(features, jnp.float32)
    rng = np.random.RandomState(seed)
    init_idx = jnp.asarray(rng.choice(feats.shape[0], num_clusters, replace=False))
    labels, centers = _kmeans(feats, init_idx, num_clusters, iters)
    return np.asarray(labels), np.asarray(centers)
