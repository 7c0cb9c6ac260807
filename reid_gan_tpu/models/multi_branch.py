"""Siamese wrapper (parity: FD/reid/models/multi_branch.py:12-15)."""

import flax.linen as nn

from .embedding import EltwiseSubEmbed
from .resnet import FDResNet


class SiameseNet(nn.Module):
    """Runs the base model on both inputs + the verification head.

    base_model is shared (weight-tied), as in the reference where the same
    module processes x1 and x2.
    """
    base_model: nn.Module
    embed_model: nn.Module = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        f1 = self.base_model(x1, train=train)
        f2 = self.base_model(x2, train=train)
        if self.embed_model is None:
            return f1, f2
        return f1, f2, self.embed_model(f1, f2, train=train)


def siamese_baseline(depth=50):
    """Stage-I verification baseline (FD/baseline.py:96-99): cut-at-pooling
    ResNet + EltwiseSubEmbed(square, BN, classifier 2048→2)."""
    base = FDResNet(depth=depth, cut_at_pooling=True)
    embed = EltwiseSubEmbed(nonlinearity="square", use_batch_norm=True,
                            use_classifier=True, num_features=2048, num_classes=2)
    return SiameseNet(base_model=base, embed_model=embed)
