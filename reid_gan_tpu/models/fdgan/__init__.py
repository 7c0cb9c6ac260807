"""FD-GAN: pose-guided feature-distilling GAN (NIPS'18) — TPU-native engine."""

from .losses import gan_loss_bce
from .networks import CustomPoseGenerator, NLayerDiscriminator
from .model import FDGANModel

__all__ = ["CustomPoseGenerator", "NLayerDiscriminator", "FDGANModel",
           "gan_loss_bce"]
