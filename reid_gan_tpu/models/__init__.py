"""Model registry (parity: CC/clustercontrast/models/__init__.py and
FD/reid/models/__init__.py:19-52 factories)."""

from .embedding import EltwiseSubEmbed
from .multi_branch import SiameseNet, siamese_baseline
from .resnet import (
    FDResNet,
    ReIDResNet,
    import_torch_resnet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnet_ibn50a,
    resnet_ibn101a,
)

from .resnet_variants import resnet_bip50, resnet_bipd50, resnet_mp50

__factory = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnet_ibn50a": resnet_ibn50a,
    "resnet_ibn101a": resnet_ibn101a,
    "resnet_bip50": resnet_bip50,
    "resnet_bipd50": resnet_bipd50,
    "resnet_mp50": resnet_mp50,
}


def names():
    return sorted(__factory.keys())


def create(name, *args, **kwargs):
    """Create a model by name. Returns a flax Module; initialize with
    ``model.init(rng, dummy_batch, train=False)``."""
    if name not in __factory:
        raise KeyError(f"Unknown model: {name}")
    return __factory[name](*args, **kwargs)
