"""Siamese verification head (parity: FD/reid/models/embedding.py:26-39)."""

import flax.linen as nn
import jax.numpy as jnp
from ..ops.norm import TorchBatchNorm


class EltwiseSubEmbed(nn.Module):
    """(x1 − x2) → square/abs → optional BN1d → classifier logits or scalar
    sum. The stage-I baseline uses nonlinearity='square', use_batch_norm=True,
    use_classifier=True, 2048→2 (FD/baseline.py:97-99)."""
    nonlinearity: str = "square"
    use_batch_norm: bool = False
    use_classifier: bool = False
    num_features: int = 0
    num_classes: int = 0

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x = x1 - x2
        if self.nonlinearity == "square":
            x = x ** 2
        elif self.nonlinearity == "abs":
            x = jnp.abs(x)
        elif self.nonlinearity is not None:
            raise KeyError(f"Unknown nonlinearity: {self.nonlinearity}")
        if self.use_batch_norm:
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
        if self.use_classifier:
            x = nn.Dense(self.num_classes,
                         kernel_init=nn.initializers.normal(0.001),
                         name="classifier")(x)
        else:
            x = jnp.sum(x, axis=1)
        return x
