"""BatchNorm with TORCH running-stat semantics.

flax's ``nn.BatchNorm`` stores the BIASED batch variance in its running
``var``; torch's ``BatchNorm*d`` normalizes with the biased variance but
stores the UNBIASED one (Bessel's correction, n/(n-1)). The difference is
~0.1% on the stored variance at typical batch·spatial counts — irrelevant
for accuracy, but it is a real semantic divergence from the reference that
surfaces wherever running stats are consumed after in-step updates (e.g.
the 'train' joint mode's eval-mode re-encode of synthesized images,
CC/clustercontrast/trainers.py:66-70) and in any cross-framework checkpoint
round-trip. This module is a drop-in replacement for every BatchNorm in the
framework carrying torch's exact convention; the fp64 one-step torch train
oracles (tests/test_*_parity_oracle.py) pin it.

Conventions matched to the prior ``nn.BatchNorm`` usage so checkpoints keep
loading: param names ``scale``/``bias``, stats ``mean``/``var`` (float32),
momentum is the flax-style decay (ra = momentum·ra + (1−momentum)·batch).
"""

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    axis: int = -1
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feature_axis = self.axis % x.ndim
        red_axes = tuple(i for i in range(x.ndim) if i != feature_axis)
        c = x.shape[feature_axis]
        shape = tuple(c if i == feature_axis else 1 for i in range(x.ndim))

        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,), jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            # stats reduce in (at least) float32, like flax
            acc = jnp.promote_types(x.dtype, jnp.float32)
            xf = x.astype(acc)
            mean = jnp.mean(xf, axis=red_axes)
            var = jnp.mean(xf * xf, axis=red_axes) - mean * mean
            if not self.is_initializing():
                n = 1
                for i in red_axes:
                    n *= x.shape[i]
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum)
                                 * mean.astype(jnp.float32))
                # torch stores the UNBIASED batch variance
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum)
                                * (var * bessel).astype(jnp.float32))

        out_t = jnp.promote_types(x.dtype, jnp.float32)
        y = (x.astype(out_t) - mean.reshape(shape)) \
            * jnp.reciprocal(jnp.sqrt(var.reshape(shape) + self.epsilon))
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (c,), jnp.float32)
            y = y * scale.reshape(shape)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (c,), jnp.float32)
            y = y + bias.reshape(shape)
        return y
