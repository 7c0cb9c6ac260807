"""Pose Transformer Modules (PTM / PCTM).

Parity: CC/dual_gan/models/PTM.py — CAB self-attention encoder blocks
(:162-199), TTB self+cross-attention decoder blocks (:202-247), the CABs/TTBs
stacks (:115-159) and the (H·W)-token flatten wrappers PTM (:60-112) /
PCTM (:6-58).

Layout: batch-first (B, L, C) sequences (the reference permutes to (L, B, C)
for torch MultiheadAttention; content is identical). Norms over the channel
dim: 'batch' → BatchNorm1d semantics (stats over B·L), 'instance' →
InstanceNorm1d (per-sample stats over L). Xavier-uniform init of all >1-dim
params (PTM.py:45-48).
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .base_function import get_nonlinearity
from ...ops.norm import TorchBatchNorm

xavier = nn.initializers.xavier_uniform()


class _SeqNorm(nn.Module):
    """BatchNorm1d / InstanceNorm1d over (B, L, C) channel dim."""
    norm: str = "batch"
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm == "batch":
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, use_bias=self.affine,
                                use_scale=self.affine, name="bn",
                                axis=-1)(x)
        # instance: per-(B, C) stats over L (always reduced in fp32)
        x = jnp.asarray(x, jnp.float32)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + 1e-5))
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


def _attn(d_model, nhead, name, dtype=None):
    return nn.MultiHeadDotProductAttention(
        num_heads=nhead, qkv_features=d_model, out_features=d_model,
        kernel_init=xavier, dtype=dtype, name=name)


def _with_pos(t, pos):
    return t if pos is None else t + pos


class CAB(nn.Module):
    """Context Augment Block (PTM.py:162-199)."""
    d_model: int
    nhead: int = 2
    dim_feedforward: int = 2048
    activation: str = "LeakyReLU"
    affine: bool = True
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        q = k = _with_pos(src, pos)
        src2 = _attn(self.d_model, self.nhead, "self_attn",
                     self.dtype)(q, k, src)
        src = src + src2
        src = _SeqNorm(self.norm, self.affine, name="norm1")(src, train)
        act = get_nonlinearity(self.activation)
        src2 = nn.Dense(self.dim_feedforward, kernel_init=xavier,
                        dtype=self.dtype, name="linear1")(src)
        src2 = nn.Dense(self.d_model, kernel_init=xavier,
                        dtype=self.dtype, name="linear2")(act(src2))
        src = src + src2
        return _SeqNorm(self.norm, self.affine, name="norm2")(src, train)


class TTB(nn.Module):
    """Texture Transfer Block: self-attn + cross-attn(query=tgt, key=memory,
    value=val) + FFN (PTM.py:202-247)."""
    d_model: int
    nhead: int = 2
    dim_feedforward: int = 2048
    activation: str = "LeakyReLU"
    affine: bool = True
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, memory, val, pos=None, train: bool = False):
        q = k = _with_pos(tgt, pos)
        tgt2 = _attn(self.d_model, self.nhead, "self_attn",
                     self.dtype)(q, k, tgt)
        tgt = tgt + tgt2
        tgt = _SeqNorm(self.norm, self.affine, name="norm1")(tgt, train)
        tgt2 = _attn(self.d_model, self.nhead, "multihead_attn", self.dtype)(
            _with_pos(tgt, pos), _with_pos(memory, pos), val)
        tgt = tgt + tgt2
        tgt = _SeqNorm(self.norm, self.affine, name="norm2")(tgt, train)
        act = get_nonlinearity(self.activation)
        tgt2 = nn.Dense(self.dim_feedforward, kernel_init=xavier,
                        dtype=self.dtype, name="linear1")(tgt)
        tgt2 = nn.Dense(self.d_model, kernel_init=xavier,
                        dtype=self.dtype, name="linear2")(act(tgt2))
        tgt = tgt + tgt2
        return _SeqNorm(self.norm, self.affine, name="norm3")(tgt, train)


class PTM(nn.Module):
    """(src, tgt, val) NHWC maps → transformed NHWC map (PTM.py:60-112)."""
    d_model: int
    nhead: int = 2
    num_CABs: int = 2
    num_TTBs: int = 2
    dim_feedforward: int = 256
    activation: str = "LeakyReLU"
    affine: bool = True
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, tgt, val, pos_embed=None, train: bool = False):
        n, h, w, c = src.shape
        flat = lambda t: t.reshape(t.shape[0], h * w, c)  # noqa: E731
        src_s, tgt_s, val_s = flat(src), flat(tgt), flat(val)
        memory = src_s
        for i in range(self.num_CABs):
            memory = CAB(self.d_model, self.nhead, self.dim_feedforward,
                         self.activation, self.affine, self.norm, self.dtype,
                         name=f"cab{i}")(memory, pos_embed, train)
        out = tgt_s
        for i in range(self.num_TTBs):
            out = TTB(self.d_model, self.nhead, self.dim_feedforward,
                      self.activation, self.affine, self.norm, self.dtype,
                      name=f"ttb{i}")(out, memory, val_s, pos_embed, train)
        out = _SeqNorm(self.norm, self.affine, name="decoder_norm")(out, train)
        return out.reshape(n, h, w, c)


class PCTM(nn.Module):
    """(query=pose map, value=id-feature map) cross module (PTM.py:6-58)."""
    d_model: int
    nhead: int = 2
    num_CABs: int = 2
    num_TTBs: int = 2
    dim_feedforward: int = 256
    activation: str = "LeakyReLU"
    affine: bool = True
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, query, value, pos_embed=None, train: bool = False):
        n, h, w, c = query.shape
        q_s = query.reshape(n, h * w, c)
        v_s = value.reshape(n, h * w, c)
        memory = v_s
        for i in range(self.num_CABs):
            memory = CAB(self.d_model, self.nhead, self.dim_feedforward,
                         self.activation, self.affine, self.norm, self.dtype,
                         name=f"cab{i}")(memory, pos_embed, train)
        out = q_s
        for i in range(self.num_TTBs):
            out = TTB(self.d_model, self.nhead, self.dim_feedforward,
                      self.activation, self.affine, self.norm, self.dtype,
                      name=f"ttb{i}")(out, memory, memory, pos_embed, train)
        out = _SeqNorm(self.norm, self.affine, name="decoder_norm")(out, train)
        return out.reshape(n, h, w, c)
