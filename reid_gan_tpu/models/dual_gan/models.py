"""GAN-model factory with plugin config injection.

Parity: CC/dual_gan/models/__init__.py:7-31 (find_model_using_name) and
models.py:4-22 (create_model); the ``modify_options`` plugin hook
(CC/examples/options/base_options.py:118-120) maps to per-model default
dataclass overrides returned by :func:`get_option_setter`.
"""

from .ae_model import AEModel
from .dptn_model import DPTNModel

_MODELS = {"AE": AEModel, "DPTN": DPTNModel}

# per-model default overrides (the reference's modify_options defaults,
# AE_model.py:19-46)
_MODEL_DEFAULTS = {
    "AE": {"lambda_rec": 2.0, "lambda_g": 5.0, "lambda_style": 500.0,
           "lambda_content": 0.5, "ratio_g2d": 0.1},
    "DPTN": {"lambda_rec": 2.5, "lambda_g": 2.0, "lambda_style": 500.0,
             "lambda_content": 0.5, "ratio_g2d": 0.1},
}


def find_model_using_name(name):
    if name not in _MODELS:
        raise KeyError(f"unknown dual_gan model {name}; options: {list(_MODELS)}")
    return _MODELS[name]


def get_option_setter(name):
    """Returns a fn applying the model's option defaults onto a GANConfig
    (only fields the user left at the dataclass default are overridden)."""
    defaults = _MODEL_DEFAULTS.get(name, {})

    def apply(cfg):
        from ...config import GANConfig

        base = GANConfig()
        for field, val in defaults.items():
            if getattr(cfg, field) == getattr(base, field):
                setattr(cfg, field, val)
        return cfg

    return apply


def load_vgg_params(path):
    """Import torchvision vgg19 weights (a ``.pth`` state dict) into the JAX
    VGG19 tap extractor (reference loads the torchvision-pretrained net,
    CC/dual_gan/models/external_function.py:226-347)."""
    import jax
    import jax.numpy as jnp
    import torch

    from .external_function import VGG19, import_torch_vgg19

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    init = VGG19().init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    return import_torch_vgg19(sd, init)


def create_model(cfg, **kwargs):
    """Instantiate the engine named by cfg.model (models.py:4-22)."""
    cls = find_model_using_name(cfg.model)
    get_option_setter(cfg.model)(cfg)
    if cfg.use_vgg and getattr(cfg, "vgg_weights", "") and \
            "vgg_params" not in kwargs:
        kwargs["vgg_params"] = load_vgg_params(cfg.vgg_weights)
    model = cls(cfg, **kwargs)
    print(f"model [{cls.__name__}] was created")
    return model
