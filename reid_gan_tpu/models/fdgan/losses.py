"""FD-GAN adversarial loss (parity: FD/fdgan/losses.py:12-32).

sigmoid+BCE against smoothed targets: ONE scalar label per call —
real ∈ U[0.7, 1.0], fake ∈ U[0.0, 0.3] when ``smooth``
(losses.py:21-22 fills the whole target tensor with a single
random.uniform draw); hard 1/0 otherwise.
"""

import jax
import jax.numpy as jnp


def gan_loss_bce(key, logits, target_is_real, smooth=False):
    """Mean BCE-with-logits vs (optionally smoothed) targets. ``key`` is used
    only when smooth (the reference draws one fresh uniform scalar per
    call)."""
    if smooth:
        u = jax.random.uniform(key, ())
        target = jnp.full(logits.shape, 0.0) + (
            u * 0.3 + (0.7 if target_is_real else 0.0))
    else:
        target = jnp.full(logits.shape, 1.0 if target_is_real else 0.0)
    # numerically stable BCE with logits
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return loss.mean()
