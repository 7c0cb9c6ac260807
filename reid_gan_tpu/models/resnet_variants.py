"""Backbone variants: bi-path and multi-part ResNets
(parity: CC/clustercontrast/models/{resnet_bip,resnet_bipd,resnet_mp}.py,
SURVEY.md C10).
"""

from typing import Any

import flax.linen as nn

from ..ops.fastconv import Conv as FastConv
import jax.numpy as jnp

from .pooling import build_pooling_layer
from .resnet import STAGES, ResNetBackbone, _l2n, conv_kaiming
from ..ops.norm import TorchBatchNorm


class ResNetStage(nn.Module):
    """One layer{stage} group of blocks (for duplicated-branch variants)."""
    depth: int = 50
    stage: int = 4          # 1-based
    stride: int = 2
    name_prefix: str = "layer4"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, sizes = STAGES[self.depth]
        filters = (64, 128, 256, 512)[self.stage - 1]
        y = x
        for j in range(sizes[self.stage - 1]):
            y = block_cls(filters, stride=self.stride if j == 0 else 1,
                          dtype=self.dtype,
                          name=f"{self.name_prefix}_{j}")(y, train)
        return y


class ResNetBip(nn.Module):
    """Duplicated layer3/4 branches p1/p2 over a shared stem; fused
    α·bn_x1 + (1−α)·bn_x2 or dual output
    (CC/clustercontrast/models/resnet_bip.py:40-45,90-130)."""
    depth: int = 50
    norm: bool = True
    dropout: float = 0.0
    pooling_type: str = "gem"
    cut_at_pooling: bool = False
    # accepted for the common factory signature; >0 is rejected because the
    # reference's embedding branch is broken as shipped (resnet_bip.py:59-67
    # creates feat/feat_bn but the forward reads feat_bn1/feat_bn2 →
    # AttributeError); every shipped recipe passes --features 0
    num_features: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, fuse: bool = True,
                 output_balance: float = 1.0):
        if self.num_features > 0:
            raise NotImplementedError(
                "resnet_bip* with --features > 0: the reference's embedding "
                "branch crashes as shipped (resnet_bip.py:59-67 builds "
                "feat_bn but the forward reads feat_bn1/feat_bn2); "
                "use --features 0")
        stem = ResNetBackbone(self.depth, stop_at_stage=2, dtype=self.dtype,
                              name="base")(x, train)
        x1 = ResNetStage(self.depth, 3, 2, "layer3", dtype=self.dtype,
                         name="p1_l3")(stem, train)
        x1 = ResNetStage(self.depth, 4, 1, "layer4", dtype=self.dtype,
                         name="p1_l4")(x1, train).astype(jnp.float32)
        x2 = ResNetStage(self.depth, 3, 2, "layer3", dtype=self.dtype,
                         name="p2_l3")(stem, train)
        x2 = ResNetStage(self.depth, 4, 1, "layer4", dtype=self.dtype,
                         name="p2_l4")(x2, train).astype(jnp.float32)
        if self.cut_at_pooling:
            return {"feat": x1}
        g1 = build_pooling_layer(self.pooling_type, name="gap1")(x1)
        g2 = build_pooling_layer(self.pooling_type, name="gap2")(x2)
        bn_x1 = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, use_bias=False, name="feat_bn1")(g1)
        bn_x2 = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, use_bias=False, name="feat_bn2")(g2)
        if self.norm:
            bn_x1, bn_x2 = _l2n(bn_x1), _l2n(bn_x2)
        if fuse:
            bn_x = output_balance * bn_x1 + (1 - output_balance) * bn_x2
            if self.norm:
                bn_x = _l2n(bn_x)
            return {"feat": bn_x}
        return {"feat": bn_x1, "feat2": bn_x2}


class ResNetBipD(nn.Module):
    """Bi-path with decoupled outputs: p1 → pooled id vector, p2 → spatial
    GAN map (CC/clustercontrast/models/resnet_bipd.py:97-138)."""
    depth: int = 50
    norm: bool = True
    dropout: float = 0.0
    pooling_type: str = "gem"
    num_features: int = 0   # same contract as ResNetBip.num_features
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, test_all: bool = False):
        if self.num_features > 0:
            raise NotImplementedError(
                "resnet_bipd with --features > 0: see ResNetBip.num_features")
        stem = ResNetBackbone(self.depth, stop_at_stage=2, dtype=self.dtype,
                              name="base")(x, train)
        x1 = ResNetStage(self.depth, 3, 2, "layer3", dtype=self.dtype,
                         name="p1_l3")(stem, train)
        x1 = ResNetStage(self.depth, 4, 1, "layer4", dtype=self.dtype,
                         name="p1_l4")(x1, train).astype(jnp.float32)
        x2 = ResNetStage(self.depth, 3, 2, "layer3", dtype=self.dtype,
                         name="p2_l3")(stem, train)
        x2 = ResNetStage(self.depth, 4, 1, "layer4", dtype=self.dtype,
                         name="p2_l4")(x2, train).astype(jnp.float32)
        g1 = build_pooling_layer(self.pooling_type, name="gap")(x1)
        bn_x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, use_bias=False, name="feat_bn")(g1)
        gan_feat = x2 * jnp.reciprocal(
            jnp.sqrt(jnp.sum(x2 * x2, axis=-1, keepdims=True)) + 1e-12)
        if not train:
            out = {"feat": _l2n(bn_x)}
            if test_all:
                out["gan_feat"] = gan_feat
            return out
        if self.norm:
            bn_x = _l2n(bn_x)
        return {"feat": bn_x, "gan_feat": gan_feat}


class PredictorMLP(nn.Module):
    """SimSiam-style 2-layer predictor head
    (resnet_mp.py:177-197 _build_mlp(2, dim, 2*dim, dim, last_bn=False)):
    Linear(dim→2·dim, no bias) → BN1d → ReLU → Linear(2·dim→dim, no bias)."""
    dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(2 * self.dim, use_bias=False, name="fc1")(x)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        return nn.Dense(self.dim, use_bias=False, name="fc2")(y)


class ResNetMP(nn.Module):
    """Multi-part backbone: global branch + upper/lower part pooling, sum/cat
    fusion, 1×1 GAN projection (CC/clustercontrast/models/resnet_mp.py:85-158).

    ``need_predictor`` builds the SimSiam predictor MLP
    (resnet_mp.py:81-83,195-197, built when need_predictor=opt.cl_loss at
    examples/...infomap.py:191) and, during training, returns its output as
    ``pred`` — the reference builds-but-never-calls it (its cl_loss trainer
    uses are commented out); here the intended ``predictor(f_gc)`` semantics
    are live so ops.losses.cl_loss can consume it.
    """
    depth: int = 50
    norm: bool = True
    dropout: float = 0.0
    num_proj: int = 256
    fusion: str = "sum"
    need_predictor: bool = False
    pooling_type: str = "gem"
    # accepted for the common factory signature and IGNORED, exactly like the
    # reference, which overwrites it with the CNN width (resnet_mp.py:54-62)
    num_features: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, clustering: bool = False,
                 test_all: bool = False):
        stem = ResNetBackbone(self.depth, stop_at_stage=3, dtype=self.dtype,
                              name="base")(x, train)
        x_g = ResNetStage(self.depth, 4, 2, "layer4", dtype=self.dtype,
                          name="res_g")(stem, train).astype(jnp.float32)
        x_p = ResNetStage(self.depth, 4, 1, "layer4", dtype=self.dtype,
                          name="res_p")(stem, train).astype(jnp.float32)
        nfeat = x_g.shape[-1]
        div = x_p.shape[1] // 2

        def pool(name):
            return build_pooling_layer(self.pooling_type, name=name)

        p_g = pool("gpool_g")(x_g)
        p_p1 = pool("gpool_p1")(x_p[:, :div])
        p_p2 = pool("gpool_p2")(x_p[:, div:])

        def bn(name, v):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, use_bias=False, name=name)(v)

        x_g = bn("feat_bn_g", p_g)
        x_p1 = bn("feat_bn_p1", p_p1)
        x_p2 = bn("feat_bn_p2", p_p2)
        if self.fusion == "cat":
            f_g_proj = nn.Dense(nfeat // 2, use_bias=False,
                                kernel_init=conv_kaiming, name="fc_id_g")(x_g)
            f_p1_proj = nn.Dense(nfeat // 4, use_bias=False,
                                 kernel_init=conv_kaiming, name="fc_id_p1")(x_p1)
            f_p2_proj = nn.Dense(nfeat // 4, use_bias=False,
                                 kernel_init=conv_kaiming, name="fc_id_p2")(x_p2)
            x_gc = jnp.concatenate([f_g_proj, f_p1_proj, f_p2_proj], axis=1)
        elif self.fusion == "sum":
            x_gc = x_g + x_p1 + x_p2
        else:
            x_gc = x_g
        gan_feat = FastConv(self.num_proj, (1, 1), use_bias=False,
                           kernel_init=conv_kaiming, name="proj_gan")(x_p)
        if self.norm:
            f_g, f_p1, f_p2, f_gc = map(_l2n, (x_g, x_p1, x_p2, x_gc))
        else:
            f_g, f_p1, f_p2, f_gc = x_g, x_p1, x_p2, x_gc
        if not train:
            out = {"feat": f_gc}
            if clustering or test_all:
                out["gan_feat"] = gan_feat
                out["feat_g"] = f_g
            if self.need_predictor:
                # keep the predictor params in the variable tree regardless of
                # mode so checkpoints round-trip (reference registers it as a
                # submodule unconditionally when need_predictor)
                PredictorMLP(f_gc.shape[-1], name="predictor")(f_gc, False)
            return out
        out = {"feat": f_gc, "feat_g": f_g, "feat_p1": f_p1, "feat_p2": f_p2,
               "gan_feat": gan_feat}
        if self.need_predictor:
            # the reference applies the predictor to the trainer-level
            # (normalized) features: predictor(f_tar) / predictor(f_out1),
            # trainers_b.py:426,908
            out["pred"] = PredictorMLP(f_gc.shape[-1],
                                       name="predictor")(f_gc, train)
        return out


def resnet_bip50(**kw):
    return ResNetBip(depth=50, **kw)


def resnet_bipd50(**kw):
    return ResNetBipD(depth=50, **kw)


def resnet_mp50(**kw):
    return ResNetMP(depth=50, **kw)
