"""ResNet re-ID backbones in flax.linen, NHWC, TPU-first.

Covers both reference backbones with one block library:
- CC backbone (CC/clustercontrast/models/resnet.py): torchvision-style
  ResNet-18/34/50/101/152 with **last-stride 1** (resnet.py:34-35), pluggable
  pooling (GeM default), ``feat_bn`` with frozen bias (resnet.py:61),
  eval → L2-normalized feature, train → (bn_x, L2-normalized GAN feature map)
  (resnet.py:73-107).
- FD backbone (FD/reid/models/resnet.py): stride-2 layer4, average pooling,
  optional embedding/norm/dropout/classifier head (resnet.py:65-88).
- IBN-a variants (CC/clustercontrast/models/resnet_ibn_a.py:22-105): first
  half of the post-conv1 block channels instance-normalized in stages 1-3.

Design notes (TPU): NHWC layout so convs map directly onto MXU tiling;
BatchNorm under jit with a batch-sharded input computes GLOBAL batch stats
(XLA inserts the cross-chip reduction) — i.e. sync-BN, a strict improvement
over the reference's per-replica DataParallel BN (flax computes BN statistics
in float32 internally); mixed precision via the ``dtype=jnp.bfloat16`` module
field — params stay float32, convs/activations run bfloat16 on the MXU
(wired to the reference's parsed-but-unused ``--fp16`` flag,
CC/examples/options/base_options.py:52).
"""

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.fastconv import Conv as FastConv
from .pooling import build_pooling_layer
from ..ops.norm import TorchBatchNorm

conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class IBN(nn.Module):
    """Instance-Batch Norm split: first half channels IN, second half BN
    (CC/clustercontrast/models/resnet_ibn_a.py IBN module)."""
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        half = c // 2
        x_in = nn.GroupNorm(num_groups=half, epsilon=1e-5, name="IN")(x[..., :half])
        x_bn = TorchBatchNorm(use_running_average=not train, momentum=self.momentum,
                            epsilon=1e-5, name="BN")(x[..., half:])
        return jnp.concatenate([x_in, x_bn], axis=-1)


def _bn(name, train, momentum=0.9, dtype=None):
    return TorchBatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=1e-5, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    ibn: bool = False
    expansion: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = FastConv(self.filters, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, kernel_init=conv_kaiming, name="conv1",
                    dtype=self.dtype)(x)
        y = IBN(name="bn1")(y, train) if self.ibn else \
            _bn("bn1", train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = FastConv(self.filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_kaiming, name="conv2", dtype=self.dtype)(y)
        y = _bn("bn2", train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = FastConv(self.filters, (1, 1), (self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kaiming,
                               name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn("downsample_bn", train, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    ibn: bool = False
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = FastConv(self.filters, (1, 1), use_bias=False,
                    kernel_init=conv_kaiming, name="conv1", dtype=self.dtype)(x)
        y = IBN(name="bn1")(y, train) if self.ibn else \
            _bn("bn1", train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = FastConv(self.filters, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, kernel_init=conv_kaiming, name="conv2",
                    dtype=self.dtype)(y)
        y = _bn("bn2", train, dtype=self.dtype)(y)
        y = nn.relu(y)
        out_c = self.filters * self.expansion
        y = FastConv(out_c, (1, 1), use_bias=False,
                    kernel_init=conv_kaiming, name="conv3", dtype=self.dtype)(y)
        y = _bn("bn3", train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = FastConv(out_c, (1, 1), (self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kaiming,
                               name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn("downsample_bn", train, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


STAGES = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNetBackbone(nn.Module):
    """conv1 → maxpool → layer1..4 feature extractor (NHWC in, NHWC out)."""
    depth: int = 50
    last_stride: int = 1
    ibn: bool = False                      # IBN-a in stages 1-3
    stop_at_stage: int = 4                 # for part-branch variants
    dtype: Any = None                      # bf16 mixed-precision compute

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, sizes = STAGES[self.depth]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = FastConv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=conv_kaiming, name="conv1", dtype=self.dtype)(x)
        y = _bn("bn1", train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        filters = (64, 128, 256, 512)
        for i in range(self.stop_at_stage):
            stride = 1 if i == 0 else (self.last_stride if i == 3 else 2)
            ibn = self.ibn and i < 3
            for j in range(sizes[i]):
                y = block_cls(filters[i], stride=stride if j == 0 else 1,
                              ibn=ibn, dtype=self.dtype,
                              name=f"layer{i + 1}_{j}")(y, train)
        return y

    @property
    def out_channels(self):
        block_cls, _ = STAGES[self.depth]
        return 512 * (4 if block_cls is Bottleneck else 1)


class ReIDResNet(nn.Module):
    """CC-style re-ID model (CC/clustercontrast/models/resnet.py:14-127).

    Eval: L2-normalized ``bn_x`` (plus normalized GAN map with test_all).
    Train: ``{'feat': bn_x, 'gan_feat': normalized NHWC map}`` (+ 'prob').
    """
    depth: int = 50
    ibn: bool = False
    num_features: int = 0
    norm: bool = False
    dropout: float = 0.0
    num_classes: int = 0
    pooling_type: str = "gem"
    cut_at_pooling: bool = False
    last_stride: int = 1
    dtype: Any = None                      # bf16 backbone compute; heads f32

    @nn.compact
    def __call__(self, x, train: bool = False, test_all: bool = False):
        fmap = ResNetBackbone(self.depth, self.last_stride, self.ibn,
                              dtype=self.dtype, name="base")(x, train)
        # upcast bf16 backbone outputs for the f32 heads; f64 (the torch
        # train-parity oracle) passes through untouched
        fmap = fmap.astype(jnp.promote_types(fmap.dtype, jnp.float32))
        # GAN branch: per-position channel-L2 normalization
        # (resnet.py:93,107 — F.normalize(gan_x, dim=1) on NCHW)
        gan_feat = fmap * jnp.reciprocal(
            jnp.sqrt(jnp.sum(fmap * fmap, axis=-1, keepdims=True)) + 1e-12)

        pooled = build_pooling_layer(self.pooling_type, name="gap")(fmap)
        if self.cut_at_pooling:
            return {"feat": pooled, "gan_feat": gan_feat}

        if self.num_features > 0:
            z = nn.Dense(self.num_features, kernel_init=conv_kaiming,
                         name="feat")(pooled)
        else:
            z = pooled
        # feat_bn: bias frozen at zero (resnet.py:61) → scale-only BN
        bn_x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, use_bias=False, name="feat_bn")(z)

        if not train:
            out = _l2n(bn_x)
            if test_all:
                return {"feat": out, "gan_feat": gan_feat}
            return {"feat": out}

        if self.norm:
            bn_x = _l2n(bn_x)
        elif self.num_features > 0:
            bn_x = nn.relu(bn_x)
        if self.dropout > 0:
            bn_x = nn.Dropout(self.dropout, name="drop")(bn_x, deterministic=not train)
        out = {"feat": bn_x, "gan_feat": gan_feat}
        if self.num_classes > 0:
            out["prob"] = nn.Dense(
                self.num_classes, use_bias=False,
                kernel_init=nn.initializers.normal(0.001), name="classifier")(bn_x)
        return out


class FDResNet(nn.Module):
    """FD-GAN-style backbone head (FD/reid/models/resnet.py:65-88): always
    average-pools; cut_at_pooling returns the pooled vector."""
    depth: int = 50
    num_features: int = 0
    norm: bool = False
    dropout: float = 0.0
    num_classes: int = 0
    cut_at_pooling: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = ResNetBackbone(self.depth, last_stride=2, name="base")(x, train)
        y = jnp.mean(fmap, axis=(1, 2))
        if self.cut_at_pooling:
            return y
        if self.num_features > 0:
            y = nn.Dense(self.num_features, kernel_init=conv_kaiming, name="feat")(y)
            y = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="feat_bn")(y)
        if self.norm:
            y = _l2n(y)
        elif self.num_features > 0:
            y = nn.relu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, name="drop")(y, deterministic=not train)
        if self.num_classes > 0:
            y = nn.Dense(self.num_classes,
                         kernel_init=nn.initializers.normal(0.001),
                         name="classifier")(y)
        return y


def _l2n(x, eps=1e-12):
    return x * jnp.reciprocal(jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + eps)


# ---------------------------------------------------------------------------
# torch-style weight import (torchvision key layout → our module tree)
# ---------------------------------------------------------------------------

def import_torch_resnet(state_dict, params, batch_stats, base_scope="base"):
    """Copy a torchvision-style ResNet state dict (numpy values) into our
    (params, batch_stats) trees. Conv kernels transpose OIHW→HWIO; Linear
    weights transpose (out,in)→(in,out). Returns new (params, batch_stats).

    Unmatched source keys are returned for caller inspection.
    """
    import copy

    params = copy.deepcopy(_plain(params))
    batch_stats = copy.deepcopy(_plain(batch_stats))
    unmatched = []

    def set_conv(scope_keys, w):
        _assign(params, scope_keys + ("kernel",), np.transpose(w, (2, 3, 1, 0)))

    def set_bn(tree, scope_keys, key, v):
        _assign(tree, scope_keys + (key,), v)

    for key, w in state_dict.items():
        w = np.asarray(w)
        parts = key.split(".")
        try:
            if parts[0] == "conv1":
                set_conv((base_scope, "conv1"), w)
            elif parts[0] == "bn1":
                _route_bn(params, batch_stats, (base_scope, "bn1"), parts[1], w)
            elif parts[0].startswith("layer"):
                stage, blk = parts[0], parts[1]
                name = f"{stage}_{blk}"
                if parts[2].startswith("conv"):
                    set_conv((base_scope, name, parts[2]), w)
                elif parts[2].startswith("bn") and len(parts) > 4 and \
                        parts[3] in ("IN", "BN"):
                    # IBN-a split norm (resnet_ibn_a.py:54-67): IN half is
                    # InstanceNorm2d(affine) → our GroupNorm 'IN' (params
                    # only); BN half is a regular BatchNorm 'BN'
                    scope = (base_scope, name, parts[2], parts[3])
                    if parts[3] == "IN":
                        if parts[4] == "weight":
                            _assign(params, scope + ("scale",), w)
                        elif parts[4] == "bias":
                            _assign(params, scope + ("bias",), w)
                        else:
                            raise KeyError(parts[4])
                    else:
                        _route_bn(params, batch_stats, scope, parts[4], w)
                elif parts[2].startswith("bn"):
                    _route_bn(params, batch_stats, (base_scope, name, parts[2]),
                              parts[3], w)
                elif parts[2] == "downsample":
                    if parts[3] == "0":
                        set_conv((base_scope, name, "downsample_conv"), w)
                    else:
                        _route_bn(params, batch_stats,
                                  (base_scope, name, "downsample_bn"), parts[4], w)
                else:
                    unmatched.append(key)
            elif parts[0] == "feat" and parts[1] == "weight":
                _assign(params, ("feat", "kernel"), w.T)
            elif parts[0] == "feat" and parts[1] == "bias":
                _assign(params, ("feat", "bias"), w)
            elif parts[0] == "feat_bn":
                _route_bn(params, batch_stats, ("feat_bn",), parts[1], w)
            elif parts[0] == "classifier" and parts[1] == "weight":
                _assign(params, ("classifier", "kernel"), w.T)
            elif parts[0] == "classifier" and parts[1] == "bias":
                _assign(params, ("classifier", "bias"), w)
            elif parts[0] == "fc":
                continue  # torchvision classification head — unused
            else:
                unmatched.append(key)
        except KeyError:
            unmatched.append(key)
    return params, batch_stats, unmatched


# CC wraps the torchvision stages in one nn.Sequential
# (CC/clustercontrast/models/resnet.py:37-39, resnet_ibn.py:35-37):
# Sequential(conv1, bn1, relu, maxpool, layer1, layer2, layer3, layer4) —
# indices 2/3 (relu/maxpool) carry no parameters.
_CC_BASE_MAP = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                "6": "layer3", "7": "layer4"}


def normalize_reference_state_dict(state_dict):
    """Translate a reference-format checkpoint state dict (the CC
    ``base.N`` sequential layout, possibly ``module.``-prefixed per
    ``copy_state_dict(strip='module.')``,
    CC/clustercontrast/utils/serialization.py:41-61) into the
    torchvision-style key names ``import_torch_resnet`` consumes.

    Returns ``(translated_dict, gem_p)`` where ``gem_p`` is the trainable
    GeM pooling power (``gap.p``) if the checkpoint carries one.
    """
    out, gem_p = {}, None
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k == "gap.p":
            gem_p = np.asarray(v)
            continue
        if k.startswith("base."):
            parts = k.split(".")
            head = _CC_BASE_MAP.get(parts[1])
            if head is None:       # relu/maxpool — no params expected
                out[k] = v
                continue
            k = ".".join([head] + parts[2:])
        out[k] = v
    return out, gem_p


def _route_bn(params, batch_stats, scope, field, w):
    if field == "weight":
        _assign(params, scope + ("scale",), w)
    elif field == "bias":
        _assign(params, scope + ("bias",), w)
    elif field == "running_mean":
        _assign(batch_stats, scope + ("mean",), w)
    elif field == "running_var":
        _assign(batch_stats, scope + ("var",), w)
    elif field == "num_batches_tracked":
        pass
    else:
        raise KeyError(field)


def _assign(tree, keys, value):
    cur = tree
    for k in keys[:-1]:
        cur = cur[k]
    old = cur[keys[-1]]
    if tuple(np.shape(old)) != tuple(np.shape(value)):
        raise KeyError(f"shape mismatch at {keys}: {np.shape(old)} vs {np.shape(value)}")
    cur[keys[-1]] = jnp.asarray(value, jnp.asarray(old).dtype)


def _plain(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return dict(tree) if isinstance(tree, dict) else tree


def resnet18(**kw):
    return ReIDResNet(depth=18, **kw)


def resnet34(**kw):
    return ReIDResNet(depth=34, **kw)


def resnet50(**kw):
    return ReIDResNet(depth=50, **kw)


def resnet101(**kw):
    return ReIDResNet(depth=101, **kw)


def resnet152(**kw):
    return ReIDResNet(depth=152, **kw)


def resnet_ibn50a(**kw):
    return ReIDResNet(depth=50, ibn=True, **kw)


def resnet_ibn101a(**kw):
    return ReIDResNet(depth=101, ibn=True, **kw)
