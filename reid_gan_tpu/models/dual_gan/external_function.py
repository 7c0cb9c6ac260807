"""Multi-mode GAN loss, WGAN-GP gradient penalty, VGG perceptual loss.

Parity: CC/dual_gan/models/external_function.py — GANLoss lsgan (per-sample
MSE) / vanilla (BCE) / hinge / wgangp (:14-69), cal_gradient_penalty
(:72-104), VGGLoss content (5 relu taps) + style (4 gram taps) (:107-146)
over a frozen VGG19 (:226-347).
"""

import flax.linen as nn

from ...ops.fastconv import Conv as FastConv
import jax
import jax.numpy as jnp
import numpy as np


def gan_loss(prediction, target_is_real, is_disc=False, gan_mode="lsgan"):
    """external_function.py:45-69. lsgan returns PER-SAMPLE losses for the
    generator path (reduction='none' → callers mean over non-batch dims for
    conf weighting); all discriminator paths return scalars."""
    if gan_mode in ("lsgan", "vanilla"):
        label = 1.0 if target_is_real else 0.0
        if gan_mode == "lsgan":
            loss = (prediction - label) ** 2
        else:
            t = jnp.full(prediction.shape, label)
            loss = (jnp.maximum(prediction, 0) - prediction * t +
                    jnp.log1p(jnp.exp(-jnp.abs(prediction))))
            loss = loss.mean()
        if is_disc and gan_mode == "lsgan":
            loss = loss.mean()
        return loss
    if gan_mode in ("hinge", "wgangp"):
        if is_disc:
            pred = -prediction if target_is_real else prediction
            if gan_mode == "hinge":
                return nn.relu(1 + pred).mean()
            return pred.mean()
        return -prediction.mean()
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def cal_gradient_penalty(disc_fn, key, real, fake, kind="mixed", constant=1.0,
                         lambda_gp=10.0):
    """WGAN-GP penalty (external_function.py:72-104). ``disc_fn`` maps images
    → logits (params closed over)."""
    if lambda_gp <= 0:
        return 0.0, None
    if kind == "real":
        interp = real
    elif kind == "fake":
        interp = fake
    else:
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        interp = alpha * real + (1 - alpha) * fake

    def d_sum(x):
        return disc_fn(x).sum()

    grads = jax.grad(d_sum)(interp)
    grads = grads.reshape(real.shape[0], -1)
    gp = ((jnp.linalg.norm(grads + 1e-16, axis=1) - constant) ** 2).mean()
    return gp * lambda_gp, grads


# ---------------------------------------------------------------------------
# VGG19 perceptual loss
# ---------------------------------------------------------------------------

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# tap names in torchvision layout: reluX_Y after the Y-th conv of block X
_TAPS = ["relu1_1", "relu1_2", "relu2_1", "relu2_2",
         "relu3_1", "relu3_2", "relu3_3", "relu3_4",
         "relu4_1", "relu4_2", "relu4_3", "relu4_4",
         "relu5_1", "relu5_2", "relu5_3", "relu5_4"]


class VGG19(nn.Module):
    """Feature-tap extractor (external_function.py:226-347). Weights come
    from ``import_torch_vgg19`` when a torchvision state dict is available;
    otherwise random (still a valid fixed random-projection perceptual loss).
    """

    @nn.compact
    def __call__(self, x):
        taps = {}
        ti = 0
        ci = 0
        for v in VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            x = FastConv(v, (3, 3), padding=1, name=f"conv{ci}")(x)
            x = nn.relu(x)
            taps[_TAPS[ti]] = x
            ti += 1
            ci += 1
        return taps


def compute_gram(x):
    """(N,H,W,C) → (N,C,C)/ (H·W·C) (external_function.py:128-133)."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("nlc,nld->ncd", f, f) / (h * w * c)


class VGGLoss:
    """content + style L1 over VGG19 taps (external_function.py:107-146)."""

    CONTENT = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
    STYLE = ["relu2_2", "relu3_4", "relu4_4", "relu5_2"]

    def __init__(self, params=None, weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
        self.model = VGG19()
        self.pretrained = params is not None
        if params is None:
            # LOUD: the reference loads torchvision-pretrained VGG19
            # (CC/dual_gan/models/external_function.py:226-347). Without
            # weights this degrades to a fixed random-projection perceptual
            # loss — still a valid training signal, but NOT the paper's.
            # Provide weights via VGGLoss(params=import_torch_vgg19(sd, p))
            # from a torchvision vgg19 state dict, or pass
            # --vgg-weights <path to torchvision .pth> on the CLIs.
            import warnings

            warnings.warn(
                "VGGLoss: no pretrained VGG19 weights supplied — "
                "lambda_style/lambda_content will use RANDOM taps. "
                "Load torchvision vgg19 weights via import_torch_vgg19 / "
                "--vgg-weights for reference-parity perceptual loss.",
                stacklevel=2)
            print("[VGGLoss] WARNING: running with randomly initialized "
                  "VGG19 taps (no pretrained weights found)")
            params = self.model.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 32, 32, 3)))["params"]
        self.params = params
        self.weights = weights

    def __call__(self, x, y):
        tx = self.model.apply({"params": self.params}, x)
        ty = self.model.apply({"params": self.params}, y)
        content = sum(w * jnp.abs(tx[t] - ty[t]).mean()
                      for w, t in zip(self.weights, self.CONTENT))
        style = sum(jnp.abs(compute_gram(tx[t]) - compute_gram(ty[t])).mean()
                    for t in self.STYLE)
        return content, style


def import_torch_vgg19(state_dict, params):
    """Map torchvision vgg19 ``features.{i}.weight/bias`` onto VGG19 params
    (OIHW→HWIO)."""
    import copy

    params = copy.deepcopy(params if isinstance(params, dict) else dict(params))
    conv_ids = [i for i, v in enumerate(
        _expand_torch_layers()) if v == "conv"]
    for ci, li in enumerate(conv_ids):
        wkey, bkey = f"features.{li}.weight", f"features.{li}.bias"
        if wkey not in state_dict:
            continue
        params[f"conv{ci}"]["kernel"] = jnp.asarray(
            np.transpose(np.asarray(state_dict[wkey]), (2, 3, 1, 0)))
        params[f"conv{ci}"]["bias"] = jnp.asarray(np.asarray(state_dict[bkey]))
    return params


def _expand_torch_layers():
    out = []
    for v in VGG19_CFG:
        if v == "M":
            out.append("pool")
        else:
            out.extend(["conv", "relu"])
    return out
