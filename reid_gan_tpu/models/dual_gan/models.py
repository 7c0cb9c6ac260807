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


def create_model(cfg, **kwargs):
    """Instantiate the engine named by cfg.model (models.py:4-22)."""
    cls = find_model_using_name(cfg.model)
    get_option_setter(cfg.model)(cfg)
    model = cls(cfg, **kwargs)
    print(f"model [{cls.__name__}] was created")
    return model
