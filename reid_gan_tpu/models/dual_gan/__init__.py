"""dual_gan — the fork's jointly-trained pose/autoencoder GAN family
(reference: CC/dual_gan/). flax/NHWC re-design; engines are jitted
functional steps."""

from .models import create_model, get_option_setter
from .networks import define_D, define_G

__all__ = ["define_G", "define_D", "create_model", "get_option_setter"]
