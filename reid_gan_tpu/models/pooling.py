"""Pooling layers over NHWC feature maps
(parity: CC/clustercontrast/models/pooling.py — GeM with trainable p is the
default for the USL recipe, factory at pooling.py:216-226).
"""

import flax.linen as nn
import jax.numpy as jnp


class GeneralizedMeanPooling(nn.Module):
    """f(X) = (mean(clip(X, eps)^p))^(1/p); p=1 → avg, p→∞ → max
    (pooling.py:57-94)."""
    p: float = 3.0
    eps: float = 1e-6
    trainable: bool = True  # GeneralizedMeanPoolingP (pooling.py:97-103)

    @nn.compact
    def __call__(self, x):
        if self.trainable:
            p = self.param("p", lambda k: jnp.ones((1,), jnp.float32) * self.p)
        else:
            p = self.p
        x = jnp.clip(x, self.eps, None) ** p
        x = jnp.mean(x, axis=(1, 2))
        return x ** (1.0 / p)


class GeneralizedMeanPoolingList(nn.Module):
    """GeM over a list of maps, avg-pool each then mean-stack
    (pooling.py:19-54)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x_list):
        outs = [jnp.mean(jnp.clip(x, self.eps, None), axis=(1, 2)) for x in x_list]
        return jnp.mean(jnp.stack(outs, -1), axis=-1)


class GeneralizedMeanPoolingFpn(nn.Module):
    """GeM per map in a list, concatenated (pooling.py:106-156)."""
    p: float = 3.0
    eps: float = 1e-6
    trainable: bool = True

    @nn.compact
    def __call__(self, x_list):
        if self.trainable:
            p = self.param("p", lambda k: jnp.ones((1,), jnp.float32) * self.p)
        else:
            p = self.p
        outs = []
        for x in x_list:
            v = jnp.mean(jnp.clip(x, self.eps, None) ** p, axis=(1, 2)) ** (1.0 / p)
            outs.append(v)
        return jnp.concatenate(outs, axis=1)


class AvgPool(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2))


class MaxPool(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.max(x, axis=(1, 2))


class AvgMaxPool(nn.Module):
    """avg + max (pooling.py:159-168)."""

    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2))


_POOLING = {
    "avg": AvgPool,
    "max": MaxPool,
    "gem": GeneralizedMeanPooling,
    "gemFpn": GeneralizedMeanPoolingFpn,
    "gemList": GeneralizedMeanPoolingList,
    "avg+max": AvgMaxPool,
}


def pooling_names():
    return sorted(_POOLING.keys())


def build_pooling_layer(kind, **kwargs):
    """kwargs pass through to the flax module (e.g. ``name=``)."""
    if kind not in _POOLING:
        raise KeyError(f"Unknown pooling layer: {kind}")
    return _POOLING[kind](**kwargs)
