"""Torch twins of the dual_gan Pose generator + ResDiscriminator.

These re-implement reid_gan_tpu/models/dual_gan/{base_function,ptm,networks}
.py in torch for the fp64 one-step joint-train oracle
(tests/test_joint_parity_oracle.py): identical math, torch autograd/optim.
They transcribe the ARCHITECTURE the reference builds for the flagship joint
recipe (CC/dual_gan/models/networks.py:639-738 PoseGenerator1, :917-956
ResDiscriminator, base blocks base_function.py:236-443, PTM.py:6-247) with
the same intended-semantics resolutions the jax side makes (spatial reid_f
conditioning; flax-style spectral norm with persisted u/sigma).

Conventions:
- parameters are stored in FLAX layouts (conv kernels HWIO, MHA kernels
  (d_model, heads, head_dim), etc.) so ``load_flax`` copies verbatim and
  ``grads`` returns trees directly comparable to jax gradient trees;
- forward activations are NCHW (torch conv layout); module boundaries match
  the flax modules 1:1;
- spectral normalization follows flax.linen.SpectralNorm exactly: matrix =
  kernel.reshape(-1, out), one power iteration per forward starting from the
  stored ``u`` (updates persisted only when ``update=True``), sigma
  differentiable through the kernel, kernel / where(sigma != 0, sigma, 1);
- BatchNorm follows the framework's TorchBatchNorm (= torch semantics):
  normalization by the biased batch variance, eps 1e-5, running stats
  ra = 0.9*ra + 0.1*batch with Bessel's correction on the stored variance.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def _l2n_flax(x):
    """flax.linen.normalization._l2_normalize: x * rsqrt(sum(x^2) + eps)."""
    return x * torch.rsqrt((x * x).sum() + 1e-12)


def act01(x):
    return F.leaky_relu(x, 0.1)


class TConv(nn.Module):
    """SpectralConv twin (base_function.py SpectralConv): plain conv, or conv
    with flax-SpectralNorm'd kernel."""

    def __init__(self, in_c, out_c, k=3, stride=1, padding=1, use_bias=True,
                 use_spect=False):
        super().__init__()
        kh = k if isinstance(k, int) else k[0]
        kw = k if isinstance(k, int) else k[1]
        self.stride, self.padding = stride, padding
        self.use_spect = use_spect
        self.kernel = nn.Parameter(torch.zeros(kh, kw, in_c, out_c,
                                               dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(out_c, dtype=torch.float64)) \
            if use_bias else None
        if use_spect:
            self.register_buffer("u", torch.zeros(1, out_c,
                                                  dtype=torch.float64))
            self.register_buffer("sigma", torch.ones((), dtype=torch.float64))

    def forward(self, x, update=True):
        w = self.kernel
        if self.use_spect:
            w2 = w.reshape(-1, w.shape[-1])
            with torch.no_grad():
                v0 = _l2n_flax(self.u @ w2.t())
                u0 = _l2n_flax(v0 @ w2)
            sigma = (v0 @ w2 @ u0.t())[0, 0]   # differentiable through w2
            if update:
                with torch.no_grad():
                    self.u.copy_(u0)
                    self.sigma.copy_(sigma)
            w = w / torch.where(sigma != 0, sigma,
                                torch.ones_like(sigma))
        return F.conv2d(x, w.permute(3, 2, 0, 1).contiguous(), self.bias,
                        stride=self.stride, padding=self.padding)

    def load_flax(self, p, s=None):
        with torch.no_grad():
            self.kernel.copy_(_t(p["conv"]["kernel"]))
            if self.bias is not None:
                self.bias.copy_(_t(p["conv"]["bias"]))
            if self.use_spect and s:
                sn = s["SpectralNorm_0"]
                self.u.copy_(_t(sn["conv/kernel/u"]))
                self.sigma.copy_(_t(sn["conv/kernel/sigma"]))

    def grads(self):
        out = {"conv": {"kernel": self.kernel.grad}}
        if self.bias is not None:
            out["conv"]["bias"] = self.bias.grad
        return out

    def export_stats(self):
        if not self.use_spect:
            return {}
        return {"SpectralNorm_0": {"conv/kernel/u": self.u.clone(),
                                   "conv/kernel/sigma": self.sigma.clone()}}


class TConvTranspose(nn.Module):
    """flax nn.ConvTranspose((3,3), (2,2), 'SAME') twin: dilate by 2, pad
    (top/left 2, bottom/right 1), correlate with the un-flipped kernel
    (verified numerically against flax to 1e-15)."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.kernel = nn.Parameter(torch.zeros(3, 3, in_c, out_c,
                                               dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(out_c, dtype=torch.float64))

    def forward(self, x):
        n, c, h, w = x.shape
        xd = x.new_zeros(n, c, 2 * h - 1, 2 * w - 1)
        xd[:, :, ::2, ::2] = x
        xp = F.pad(xd, (2, 1, 2, 1))
        y = F.conv2d(xp, self.kernel.permute(3, 2, 0, 1).contiguous())
        return y + self.bias.view(1, -1, 1, 1)

    def load_flax(self, p, s=None):
        with torch.no_grad():
            self.kernel.copy_(_t(p["conv"]["kernel"]))
            self.bias.copy_(_t(p["conv"]["bias"]))

    def grads(self):
        return {"conv": {"kernel": self.kernel.grad,
                         "bias": self.bias.grad}}


class TBatchNorm(nn.Module):
    """flax nn.BatchNorm twin in train mode: biased batch stats, eps 1e-5.
    ``dims``: reduction axes ((0,2,3) for NCHW maps, (0,1) for (B,L,C))."""

    def __init__(self, c, dims=(0, 2, 3)):
        super().__init__()
        self.dims = dims
        self.scale = nn.Parameter(torch.ones(c, dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(c, dtype=torch.float64))
        self.register_buffer("mean", torch.zeros(c, dtype=torch.float64))
        self.register_buffer("var", torch.ones(c, dtype=torch.float64))

    def forward(self, x, train=True):
        if self.dims == (0, 2, 3):
            shape = (1, -1, 1, 1)
        else:
            shape = (1, 1, -1)
        if not train:      # eval: normalize with the running stats
            y = (x - self.mean.view(shape)) \
                / torch.sqrt(self.var.view(shape) + 1e-5)
            return y * self.scale.view(shape) + self.bias.view(shape)
        m = x.mean(dim=self.dims)
        v = x.var(dim=self.dims, unbiased=False)
        with torch.no_grad():
            n = 1
            for d in self.dims:
                n *= x.shape[d]
            bessel = n / (n - 1) if n > 1 else 1.0
            self.mean.mul_(0.9).add_(0.1 * m.detach())
            # torch convention: running_var stores the UNBIASED variance
            self.var.mul_(0.9).add_(0.1 * bessel * v.detach())
        y = (x - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-5)
        return y * self.scale.view(shape) + self.bias.view(shape)

    def load_flax(self, p, s):
        with torch.no_grad():
            self.scale.copy_(_t(p["scale"]))
            self.bias.copy_(_t(p["bias"]))
            self.mean.copy_(_t(s["mean"]))
            self.var.copy_(_t(s["var"]))

    def grads(self):
        return {"scale": self.scale.grad, "bias": self.bias.grad}


class TSeqNorm(nn.Module):
    """ptm._SeqNorm('batch') twin: BN over (B, L) of (B, L, C) tokens; flax
    puts the wrapped BN under a 'bn' key."""

    def __init__(self, c):
        super().__init__()
        self.bn = TBatchNorm(c, dims=(0, 1))

    def forward(self, x):
        return self.bn(x)

    def load_flax(self, p, s):
        self.bn.load_flax(p["bn"], s["bn"])

    def grads(self):
        return {"bn": self.bn.grads()}


class TMHA(nn.Module):
    """flax nn.MultiHeadDotProductAttention twin (qkv_features = out_features
    = d_model, bias, query scaled by 1/sqrt(head_dim))."""

    def __init__(self, d_model, nhead):
        super().__init__()
        dh = d_model // nhead
        z = lambda *s: nn.Parameter(torch.zeros(*s, dtype=torch.float64))  # noqa: E731
        self.wq, self.bq = z(d_model, nhead, dh), z(nhead, dh)
        self.wk, self.bk = z(d_model, nhead, dh), z(nhead, dh)
        self.wv, self.bv = z(d_model, nhead, dh), z(nhead, dh)
        self.wo, self.bo = z(nhead, dh, d_model), z(d_model)
        self.dh = dh

    def forward(self, q_in, k_in, v_in):
        q = torch.einsum("blc,chd->blhd", q_in, self.wq) + self.bq
        k = torch.einsum("blc,chd->blhd", k_in, self.wk) + self.bk
        v = torch.einsum("blc,chd->blhd", v_in, self.wv) + self.bv
        q = q / math.sqrt(self.dh)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k).softmax(dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", attn, v)
        return torch.einsum("bqhd,hdc->bqc", out, self.wo) + self.bo

    def load_flax(self, p, s=None):
        with torch.no_grad():
            for name, wp, bp in (("query", self.wq, self.bq),
                                 ("key", self.wk, self.bk),
                                 ("value", self.wv, self.bv),
                                 ("out", self.wo, self.bo)):
                wp.copy_(_t(p[name]["kernel"]))
                bp.copy_(_t(p[name]["bias"]))

    def grads(self):
        return {name: {"kernel": wp.grad, "bias": bp.grad}
                for name, wp, bp in (("query", self.wq, self.bq),
                                     ("key", self.wk, self.bk),
                                     ("value", self.wv, self.bv),
                                     ("out", self.wo, self.bo))}


class TDense(nn.Module):
    """flax nn.Dense twin (kernel (in, out))."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.kernel = nn.Parameter(torch.zeros(in_c, out_c,
                                               dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(out_c, dtype=torch.float64))

    def forward(self, x):
        return x @ self.kernel + self.bias

    def load_flax(self, p, s=None):
        with torch.no_grad():
            self.kernel.copy_(_t(p["kernel"]))
            self.bias.copy_(_t(p["bias"]))

    def grads(self):
        return {"kernel": self.kernel.grad, "bias": self.bias.grad}


class TCAB(nn.Module):
    """ptm.CAB twin."""

    def __init__(self, d_model, nhead, dim_ff):
        super().__init__()
        self.self_attn = TMHA(d_model, nhead)
        self.norm1 = TSeqNorm(d_model)
        self.norm2 = TSeqNorm(d_model)
        self.linear1 = TDense(d_model, dim_ff)
        self.linear2 = TDense(dim_ff, d_model)

    def forward(self, src):
        src = src + self.self_attn(src, src, src)
        src = self.norm1(src)
        src = src + self.linear2(act01(self.linear1(src)))
        return self.norm2(src)

    _parts = ("self_attn", "norm1", "norm2", "linear1", "linear2")

    def load_flax(self, p, s):
        for n in self._parts:
            getattr(self, n).load_flax(p[n], s.get(n) if s else None)

    def grads(self):
        return {n: getattr(self, n).grads() for n in self._parts}


class TTTB(nn.Module):
    """ptm.TTB twin."""

    def __init__(self, d_model, nhead, dim_ff):
        super().__init__()
        self.self_attn = TMHA(d_model, nhead)
        self.multihead_attn = TMHA(d_model, nhead)
        self.norm1 = TSeqNorm(d_model)
        self.norm2 = TSeqNorm(d_model)
        self.norm3 = TSeqNorm(d_model)
        self.linear1 = TDense(d_model, dim_ff)
        self.linear2 = TDense(dim_ff, d_model)

    def forward(self, tgt, memory, val):
        tgt = tgt + self.self_attn(tgt, tgt, tgt)
        tgt = self.norm1(tgt)
        tgt = tgt + self.multihead_attn(tgt, memory, val)
        tgt = self.norm2(tgt)
        tgt = tgt + self.linear2(act01(self.linear1(tgt)))
        return self.norm3(tgt)

    _parts = ("self_attn", "multihead_attn", "norm1", "norm2", "norm3",
              "linear1", "linear2")

    def load_flax(self, p, s):
        for n in self._parts:
            getattr(self, n).load_flax(p[n], s.get(n) if s else None)

    def grads(self):
        return {n: getattr(self, n).grads() for n in self._parts}


class TPCTM(nn.Module):
    """ptm.PCTM twin: CABs over the id-feature tokens, TTBs with the pose
    tokens as query; maps are NCHW, tokens (B, H*W, C) in flax's NHWC
    flatten order."""

    def __init__(self, d_model, nhead=2, num_cabs=2, num_ttbs=2):
        super().__init__()
        self.cabs = nn.ModuleList([TCAB(d_model, nhead, d_model)
                                   for _ in range(num_cabs)])
        self.ttbs = nn.ModuleList([TTTB(d_model, nhead, d_model)
                                   for _ in range(num_ttbs)])
        self.decoder_norm = TSeqNorm(d_model)

    @staticmethod
    def _tok(x):
        n, c, h, w = x.shape
        return x.permute(0, 2, 3, 1).reshape(n, h * w, c), (h, w)

    def forward(self, query, value):
        q_s, (h, w) = self._tok(query)
        v_s, _ = self._tok(value)
        memory = v_s
        for cab in self.cabs:
            memory = cab(memory)
        out = q_s
        for ttb in self.ttbs:
            out = ttb(out, memory, memory)
        out = self.decoder_norm(out)
        n, l, c = out.shape
        return out.reshape(n, h, w, c).permute(0, 3, 1, 2)

    def load_flax(self, p, s):
        for i, cab in enumerate(self.cabs):
            cab.load_flax(p[f"cab{i}"], s.get(f"cab{i}", {}))
        for i, ttb in enumerate(self.ttbs):
            ttb.load_flax(p[f"ttb{i}"], s.get(f"ttb{i}", {}))
        self.decoder_norm.load_flax(p["decoder_norm"], s["decoder_norm"])

    def grads(self):
        out = {f"cab{i}": c.grads() for i, c in enumerate(self.cabs)}
        out.update({f"ttb{i}": t.grads() for i, t in enumerate(self.ttbs)})
        out["decoder_norm"] = self.decoder_norm.grads()
        return out


class TEncoderBlockOptimized(nn.Module):
    """base_function.EncoderBlockOptimized twin: conv↓2 → BN → act → conv."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv1 = TConv(in_c, out_c, 4, 2, 1)
        self.norm1 = TBatchNorm(out_c)
        self.conv2 = TConv(out_c, out_c, 3, 1, 1)

    def forward(self, x):
        return self.conv2(act01(self.norm1(self.conv1(x))))

    def load_flax(self, p, s):
        self.conv1.load_flax(p["conv1"])
        self.norm1.load_flax(p["norm1"], s["norm1"])
        self.conv2.load_flax(p["conv2"])

    def grads(self):
        return {"conv1": self.conv1.grads(), "norm1": self.norm1.grads(),
                "conv2": self.conv2.grads()}


class TEncoderBlock(nn.Module):
    """base_function.EncoderBlock twin (batch-norm variant)."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.norm1 = TBatchNorm(in_c)
        self.conv1 = TConv(in_c, out_c, 4, 2, 1)
        self.norm2 = TBatchNorm(out_c)
        self.conv2 = TConv(out_c, out_c, 3, 1, 1)

    def forward(self, x):
        y = self.conv1(act01(self.norm1(x)))
        return self.conv2(act01(self.norm2(y)))

    def load_flax(self, p, s):
        self.norm1.load_flax(p["norm1"], s["norm1"])
        self.conv1.load_flax(p["conv1"])
        self.norm2.load_flax(p["norm2"], s["norm2"])
        self.conv2.load_flax(p["conv2"])

    def grads(self):
        return {"norm1": self.norm1.grads(), "conv1": self.conv1.grads(),
                "norm2": self.norm2.grads(), "conv2": self.conv2.grads()}


class TFeatureAdaptBlock1(nn.Module):
    """base_function.FeatureAdaptBlock1 twin: 1×1 conv → BN → act. The flax
    module's conv is a bare FastConv (params directly under 'conv1')."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.kernel = nn.Parameter(torch.zeros(1, 1, in_c, out_c,
                                               dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(out_c, dtype=torch.float64))
        self.norm1 = TBatchNorm(out_c)

    def forward(self, x):
        y = F.conv2d(x, self.kernel.permute(3, 2, 0, 1).contiguous(), self.bias)
        return act01(self.norm1(y))

    def load_flax(self, p, s):
        with torch.no_grad():
            self.kernel.copy_(_t(p["conv1"]["kernel"]))
            self.bias.copy_(_t(p["conv1"]["bias"]))
        self.norm1.load_flax(p["norm1"], s["norm1"])

    def grads(self):
        return {"conv1": {"kernel": self.kernel.grad, "bias": self.bias.grad},
                "norm1": self.norm1.grads()}


class TResBlockDecoder(nn.Module):
    """base_function.ResBlockDecoder twin: norm→act→conv3×3 → norm→act→
    convT↑2, + convT↑2 bypass."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.norm1 = TBatchNorm(in_c)
        self.conv1 = TConv(in_c, out_c, 3, 1, 1)
        self.norm2 = TBatchNorm(out_c)
        self.conv2 = TConvTranspose(out_c, out_c)
        self.bypass = TConvTranspose(in_c, out_c)

    def forward(self, x):
        y = self.conv1(act01(self.norm1(x)))
        y = self.conv2(act01(self.norm2(y)))
        return y + self.bypass(x)

    def load_flax(self, p, s):
        self.norm1.load_flax(p["norm1"], s["norm1"])
        self.conv1.load_flax(p["conv1"])
        self.norm2.load_flax(p["norm2"], s["norm2"])
        self.conv2.load_flax(p["conv2"])
        self.bypass.load_flax(p["bypass"])

    def grads(self):
        return {"norm1": self.norm1.grads(), "conv1": self.conv1.grads(),
                "norm2": self.norm2.grads(), "conv2": self.conv2.grads(),
                "bypass": self.bypass.grads()}


class TOutput(nn.Module):
    """base_function.Output twin: act → reflect-pad → conv → tanh."""

    def __init__(self, in_c, out_c=3):
        super().__init__()
        self.conv1 = TConv(in_c, out_c, 3, 1, 0)

    def forward(self, x):
        y = F.pad(act01(x), (1, 1, 1, 1), mode="reflect")
        return torch.tanh(self.conv1(y))

    def load_flax(self, p, s):
        self.conv1.load_flax(p["conv1"])

    def grads(self):
        return {"conv1": self.conv1.grads()}


class TPoseGenerator1(nn.Module):
    """networks.PoseGenerator1 twin (ngf=64, img_f=256, layers=3): pose
    encoder with U-Net skip adds, 1×1 reid adapter, PCTM, decoder."""

    def __init__(self, pose_nc=18, ngf=64, reid_dim=2048):
        super().__init__()
        self.block0 = TEncoderBlockOptimized(pose_nc, ngf)
        self.encoder0 = TEncoderBlock(ngf, ngf * 2)
        self.encoder1 = TEncoderBlock(ngf * 2, ngf * 4)
        self.feature_block = TFeatureAdaptBlock1(reid_dim, ngf * 4)
        self.PCTM = TPCTM(ngf * 4)
        self.decoder0 = TResBlockDecoder(ngf * 4, ngf * 2)
        self.decoder1 = TResBlockDecoder(ngf * 2, ngf)
        self.decoder2 = TResBlockDecoder(ngf, ngf)
        self.outconv = TOutput(ngf, 3)

    def forward(self, reid_f, pose):
        f_p = self.block0(pose)
        skips = [f_p]
        f_p = self.encoder0(f_p)
        skips.append(f_p)
        f_p = self.encoder1(f_p)
        f_id = self.feature_block(reid_f)
        f_g = self.PCTM(f_p, f_id)
        f_g = self.decoder0(f_g) + skips.pop()
        f_g = self.decoder1(f_g) + skips.pop()
        f_g = self.decoder2(f_g)
        return self.outconv(f_g)

    _parts = ("block0", "encoder0", "encoder1", "feature_block", "PCTM",
              "decoder0", "decoder1", "decoder2", "outconv")

    def load_flax(self, variables):
        p, s = variables["params"], variables.get("batch_stats", {})
        for n in self._parts:
            getattr(self, n).load_flax(p[n], s.get(n, {}))

    def grads(self):
        return {n: getattr(self, n).grads() for n in self._parts}


class TResBlockEncoderOptimized(nn.Module):
    """base_function.ResBlockEncoderOptimized twin (norm='none', spectral):
    conv3×3 → act → conv4×4↓2, + (avgpool2 → 1×1 conv) bypass."""

    def __init__(self, in_c, out_c, hidden_c):
        super().__init__()
        self.conv1 = TConv(in_c, hidden_c, 3, 1, 1, use_spect=True)
        self.conv2 = TConv(hidden_c, out_c, 4, 2, 1, use_spect=True)
        self.bypass = TConv(in_c, out_c, 1, 1, 0, use_spect=True)

    def forward(self, x, update=True):
        y = self.conv2(act01(self.conv1(x, update)), update)
        short = self.bypass(F.avg_pool2d(x, 2, 2), update)
        return y + short

    def load_flax(self, p, s):
        for n in ("conv1", "conv2", "bypass"):
            getattr(self, n).load_flax(p[n], s.get(n, {}))

    def grads(self):
        return {n: getattr(self, n).grads()
                for n in ("conv1", "conv2", "bypass")}

    def export_stats(self):
        return {n: getattr(self, n).export_stats()
                for n in ("conv1", "conv2", "bypass")}


class TResBlockEncoder(nn.Module):
    """base_function.ResBlockEncoder twin (norm='none', spectral):
    act → conv3×3 → act → conv4×4↓2, + (avgpool2 → 1×1 conv) bypass."""

    def __init__(self, in_c, out_c, hidden_c):
        super().__init__()
        self.conv1 = TConv(in_c, hidden_c, 3, 1, 1, use_spect=True)
        self.conv2 = TConv(hidden_c, out_c, 4, 2, 1, use_spect=True)
        self.bypass = TConv(in_c, out_c, 1, 1, 0, use_spect=True)

    def forward(self, x, update=True):
        y = self.conv1(act01(x), update)
        y = self.conv2(act01(y), update)
        short = self.bypass(F.avg_pool2d(x, 2, 2), update)
        return y + short

    load_flax = TResBlockEncoderOptimized.load_flax
    grads = TResBlockEncoderOptimized.grads
    export_stats = TResBlockEncoderOptimized.export_stats


class TResDiscriminator(nn.Module):
    """networks.ResDiscriminator twin (ndf=32, img_f=128, layers=3, all
    convs spectral-normalized, no norm layers)."""

    def __init__(self, input_nc=3, ndf=32, img_f=128, layers=3):
        super().__init__()
        self.block0 = TResBlockEncoderOptimized(input_nc, ndf, ndf)
        mult = 1
        encs = []
        for i in range(layers - 1):
            mult_prev = mult
            mult = min(2 ** (i + 1), img_f // ndf)
            encs.append(TResBlockEncoder(ndf * mult_prev, ndf * mult,
                                         ndf * mult_prev))
        self.encoders = nn.ModuleList(encs)
        self.conv = TConv(ndf * mult, 1, 1, 1, 0, use_spect=True)

    def forward(self, x, update=True):
        out = self.block0(x, update)
        for enc in self.encoders:
            out = enc(out, update)
        return self.conv(act01(out), update)

    def load_flax(self, variables):
        p, s = variables["params"], variables.get("batch_stats", {})
        self.block0.load_flax(p["block0"], s.get("block0", {}))
        for i, enc in enumerate(self.encoders):
            enc.load_flax(p[f"encoder{i}"], s.get(f"encoder{i}", {}))
        self.conv.load_flax(p["conv"], s.get("conv", {}))

    def grads(self):
        out = {"block0": self.block0.grads(), "conv": self.conv.grads()}
        for i, enc in enumerate(self.encoders):
            out[f"encoder{i}"] = enc.grads()
        return out

    def export_stats(self):
        out = {"block0": self.block0.export_stats(),
               "conv": self.conv.export_stats()}
        for i, enc in enumerate(self.encoders):
            out[f"encoder{i}"] = enc.export_stats()
        return out


# ===========================================================================
# FD-GAN twins (reid_gan_tpu/models/fdgan/networks.py ← FD/fdgan/networks.py)
# ===========================================================================

def act02(x):
    return F.leaky_relu(x, 0.2)


class TPlainConv(nn.Module):
    """FastConv twin (flax-layout kernel, no spectral)."""

    def __init__(self, in_c, out_c, k=(4, 4), stride=2, padding=1,
                 use_bias=False):
        super().__init__()
        kh, kw = (k, k) if isinstance(k, int) else k
        self.stride, self.padding = stride, padding
        self.kernel = nn.Parameter(torch.zeros(kh, kw, in_c, out_c,
                                               dtype=torch.float64))
        self.bias = nn.Parameter(torch.zeros(out_c, dtype=torch.float64)) \
            if use_bias else None

    def forward(self, x):
        return F.conv2d(x, self.kernel.permute(3, 2, 0, 1).contiguous(), self.bias,
                        stride=self.stride, padding=self.padding)

    def load_flax(self, p):
        with torch.no_grad():
            self.kernel.copy_(_t(p["kernel"]))
            if self.bias is not None:
                self.bias.copy_(_t(p["bias"]))

    def grads(self):
        out = {"kernel": self.kernel.grad}
        if self.bias is not None:
            out["bias"] = self.bias.grad
        return out


class TFDConvT(nn.Module):
    """flax nn.ConvTranspose((4,4), (2,2), 'SAME', no bias) twin: dilate by
    2, pad symmetrically by 2, correlate with the un-flipped kernel
    (jax _conv_transpose_padding(k=4, s=2, SAME) → (2, 2))."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.kernel = nn.Parameter(torch.zeros(4, 4, in_c, out_c,
                                               dtype=torch.float64))

    def forward(self, x):
        n, c, h, w = x.shape
        xd = x.new_zeros(n, c, 2 * h - 1, 2 * w - 1)
        xd[:, :, ::2, ::2] = x
        xp = F.pad(xd, (2, 2, 2, 2))
        return F.conv2d(xp, self.kernel.permute(3, 2, 0, 1).contiguous())

    def load_flax(self, p):
        with torch.no_grad():
            self.kernel.copy_(_t(p["kernel"]))

    def grads(self):
        return {"kernel": self.kernel.grad}


class TFDConvTValid(nn.Module):
    """flax nn.ConvTranspose((kh,kw), stride 1, 'VALID', no bias) twin for
    the 1x1 fused-code input: a FULL correlation, so the kernel lands
    spatially reversed — out[b,o,i,j] = sum_c x[b,c] * k[kh-1-i,kw-1-j,c,o]
    (verified numerically against flax)."""

    def __init__(self, in_c, out_c, k):
        super().__init__()
        kh, kw = k
        self.kernel = nn.Parameter(torch.zeros(kh, kw, in_c, out_c,
                                               dtype=torch.float64))

    def forward(self, x):
        return torch.einsum("bc,hwco->bohw", x[:, :, 0, 0],
                            torch.flip(self.kernel, [0, 1]))

    def load_flax(self, p):
        with torch.no_grad():
            self.kernel.copy_(_t(p["kernel"]))

    def grads(self):
        return {"kernel": self.kernel.grad}


class TFDGen(nn.Module):
    """CustomPoseGenerator twin (fuse_mode='cat', dropout 0): 5-layer strided
    pose encoder → 1x1 pose code → cat(reid, pose, noise) → 5-layer
    transposed-conv decoder with `connect_layers` U-Net skip concats."""

    def __init__(self, h=64, w=32, pose_nc=18, ngf=64, pose_feature_nc=128,
                 reid_nc=2048, noise_nc=56, connect_layers=0):
        super().__init__()
        self.cn = connect_layers
        k_avg = (h // 32, w // 32)
        self.en_conv1 = TPlainConv(pose_nc, ngf)
        self.en_conv2_conv = TPlainConv(ngf, ngf * 2)
        self.en_conv2_bn = TBatchNorm(ngf * 2)
        self.en_conv3_conv = TPlainConv(ngf * 2, ngf * 4)
        self.en_conv3_bn = TBatchNorm(ngf * 4)
        self.en_conv4_conv = TPlainConv(ngf * 4, ngf * 8)
        self.en_conv4_bn = TBatchNorm(ngf * 8)
        self.en_conv5_conv = TPlainConv(ngf * 8, ngf * 8)
        self.en_conv5_bn = TBatchNorm(ngf * 8)
        self.en_avg_conv = TPlainConv(ngf * 8, pose_feature_nc, k=k_avg,
                                      stride=1, padding=0)
        self.en_avg_bn = TBatchNorm(pose_feature_nc)
        fused = reid_nc + pose_feature_nc + noise_nc
        self.de_avg_conv = TFDConvTValid(fused, ngf * 8, k_avg)
        self.de_avg_bn = TBatchNorm(ngf * 8)
        ic = [[8, 8, 4, 2, 1], [16, 8, 4, 2, 1], [16, 16, 4, 2, 1],
              [16, 16, 8, 2, 1], [16, 16, 8, 4, 1], [16, 16, 8, 4, 2]
              ][connect_layers]
        self.de_conv5_conv = TFDConvT(ngf * ic[0], ngf * 8)
        self.de_conv5_bn = TBatchNorm(ngf * 8)
        self.de_conv4_conv = TFDConvT(ngf * ic[1], ngf * 4)
        self.de_conv4_bn = TBatchNorm(ngf * 4)
        self.de_conv3_conv = TFDConvT(ngf * ic[2], ngf * 2)
        self.de_conv3_bn = TBatchNorm(ngf * 2)
        self.de_conv2_conv = TFDConvT(ngf * ic[3], ngf)
        self.de_conv2_bn = TBatchNorm(ngf)
        self.de_conv1_conv = TFDConvT(ngf * ic[4], 3)

    def forward(self, posemap, reid, noise):
        p1 = self.en_conv1(posemap)
        p2 = self.en_conv2_bn(self.en_conv2_conv(act02(p1)))
        p3 = self.en_conv3_bn(self.en_conv3_conv(act02(p2)))
        p4 = self.en_conv4_bn(self.en_conv4_conv(act02(p3)))
        p5 = self.en_conv5_bn(self.en_conv5_conv(act02(p4)))
        pose_code = self.en_avg_bn(self.en_avg_conv(act02(p5)))
        feat = torch.cat([reid[:, :, None, None], pose_code,
                          noise[:, :, None, None]], dim=1)
        y = self.de_avg_bn(self.de_avg_conv(F.relu(feat)))
        cn = self.cn
        for name, skip in (("de_conv5", p5), ("de_conv4", p4),
                           ("de_conv3", p3), ("de_conv2", p2)):
            if cn > 0:
                y = torch.cat([y, skip], dim=1)
                cn -= 1
            y = getattr(self, name + "_bn")(
                getattr(self, name + "_conv")(F.relu(y)))
        if cn > 0:
            y = torch.cat([y, p1], dim=1)
        return torch.tanh(self.de_conv1_conv(F.relu(y)))

    _convs = ("en_conv1", "en_conv2_conv", "en_conv3_conv", "en_conv4_conv",
              "en_conv5_conv", "en_avg_conv", "de_avg_conv", "de_conv5_conv",
              "de_conv4_conv", "de_conv3_conv", "de_conv2_conv",
              "de_conv1_conv")
    _bns = ("en_conv2_bn", "en_conv3_bn", "en_conv4_bn", "en_conv5_bn",
            "en_avg_bn", "de_avg_bn", "de_conv5_bn", "de_conv4_bn",
            "de_conv3_bn", "de_conv2_bn")

    def load_flax(self, variables):
        p, s = variables["params"], variables.get("batch_stats", {})
        for n in self._convs:
            getattr(self, n).load_flax(p[n])
        for n in self._bns:
            getattr(self, n).load_flax(p[n], s[n])

    def grads(self):
        out = {n: getattr(self, n).grads() for n in self._convs}
        out.update({n: getattr(self, n).grads() for n in self._bns})
        return out


class TNLayerD(nn.Module):
    """NLayerDiscriminator twin (3-layer PatchGAN over posemap ⊕ image)."""

    def __init__(self, input_nc=21, ndf=64):
        super().__init__()
        self.conv0 = TPlainConv(input_nc, ndf, use_bias=True)
        self.conv1 = TPlainConv(ndf, ndf * 2)
        self.bn1 = TBatchNorm(ndf * 2)
        self.conv2 = TPlainConv(ndf * 2, ndf * 4)
        self.bn2 = TBatchNorm(ndf * 4)
        self.conv3 = TPlainConv(ndf * 4, ndf * 8, stride=1)
        self.bn3 = TBatchNorm(ndf * 8)
        self.conv_out = TPlainConv(ndf * 8, 1, stride=1, use_bias=True)

    def forward(self, x, train=True):
        y = act02(self.conv0(x))
        y = act02(self.bn1(self.conv1(y), train))
        y = act02(self.bn2(self.conv2(y), train))
        y = act02(self.bn3(self.conv3(y), train))
        return self.conv_out(y)

    def load_flax(self, variables):
        p, s = variables["params"], variables.get("batch_stats", {})
        for i, n in enumerate(("conv0", "conv1", "conv2", "conv3")):
            getattr(self, n).load_flax(p[f"conv{i}"])
        for i in (1, 2, 3):
            getattr(self, f"bn{i}").load_flax(p[f"bn{i}"], s[f"bn{i}"])
        self.conv_out.load_flax(p["conv_out"])

    def grads(self):
        out = {f"conv{i}": getattr(self, n).grads()
               for i, n in enumerate(("conv0", "conv1", "conv2", "conv3"))}
        out.update({f"bn{i}": getattr(self, f"bn{i}").grads()
                    for i in (1, 2, 3)})
        out["conv_out"] = self.conv_out.grads()
        return out


def _bn_stats(mod):
    return {"mean": mod.mean.clone(), "var": mod.var.clone()}


def _fdgen_export_stats(self):
    return {n: _bn_stats(getattr(self, n)) for n in TFDGen._bns}


def _nlayerd_export_stats(self):
    return {f"bn{i}": _bn_stats(getattr(self, f"bn{i}")) for i in (1, 2, 3)}


TFDGen.export_stats = _fdgen_export_stats
TNLayerD.export_stats = _nlayerd_export_stats


class TResBlock(nn.Module):
    """base_function.ResBlock twin (sample 'none', batch norm, no spect):
    norm→act→conv3×3 → norm→act→conv3×3, + 1×1 bypass."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.norm1 = TBatchNorm(in_c)
        self.conv1 = TConv(in_c, out_c, 3, 1, 1)
        self.norm2 = TBatchNorm(out_c)
        self.conv2 = TConv(out_c, out_c, 3, 1, 1)
        self.bypass = TConv(in_c, out_c, 1, 1, 0)

    def forward(self, x):
        y = self.conv1(act01(self.norm1(x)))
        y = self.conv2(act01(self.norm2(y)))
        return y + self.bypass(x)

    def load_flax(self, p, s):
        self.norm1.load_flax(p["norm1"], s["norm1"])
        self.conv1.load_flax(p["conv1"])
        self.norm2.load_flax(p["norm2"], s["norm2"])
        self.conv2.load_flax(p["conv2"])
        self.bypass.load_flax(p["bypass"])

    def grads(self):
        return {"norm1": self.norm1.grads(), "conv1": self.conv1.grads(),
                "norm2": self.norm2.grads(), "conv2": self.conv2.grads(),
                "bypass": self.bypass.grads()}


class TAEGenerator(nn.Module):
    """networks.AEGenerator twin (ngf=64, img_f=256, layers=3, 3 mblocks):
    split forward_enc / forward_dec, as synthesize_fc uses them."""

    def __init__(self, ngf=64):
        super().__init__()
        self.block0 = TEncoderBlockOptimized(3, ngf)
        self.encoders_0 = TEncoderBlock(ngf, ngf * 2)
        self.encoders_1 = TEncoderBlock(ngf * 2, ngf * 4)
        self.mblocks_0 = TResBlock(ngf * 4, ngf * 4)
        self.mblocks_1 = TResBlock(ngf * 4, ngf * 4)
        self.mblocks_2 = TResBlock(ngf * 4, ngf * 4)
        self.dec0 = TResBlockDecoder(ngf * 4, ngf * 2)
        self.dec1 = TResBlockDecoder(ngf * 2, ngf)
        self.dec2 = TResBlockDecoder(ngf, ngf)
        self.outconv = TOutput(ngf, 3)

    def forward_enc(self, x):
        f = self.block0(x)
        f = self.encoders_0(f)
        return self.encoders_1(f)

    def forward_dec(self, f):
        f = self.mblocks_0(f)
        f = self.mblocks_1(f)
        f = self.mblocks_2(f)
        f = self.dec0(f)
        f = self.dec1(f)
        f = self.dec2(f)
        return self.outconv(f)

    _enc_parts = ("block0", "encoders_0", "encoders_1")
    _mids = ("mblocks_0", "mblocks_1", "mblocks_2")

    def load_flax(self, variables):
        p, s = variables["params"], variables.get("batch_stats", {})
        for n in self._enc_parts + self._mids:
            getattr(self, n).load_flax(p[n], s.get(n, {}))
        dp, ds = p["decoder"], s.get("decoder", {})
        for i in range(3):
            getattr(self, f"dec{i}").load_flax(dp[f"decoder{i}"],
                                               ds.get(f"decoder{i}", {}))
        self.outconv.load_flax(dp["outconv"], ds.get("outconv", {}))

    def grads(self):
        out = {n: getattr(self, n).grads()
               for n in self._enc_parts + self._mids}
        dec = {f"decoder{i}": getattr(self, f"dec{i}").grads()
               for i in range(3)}
        dec["outconv"] = self.outconv.grads()
        out["decoder"] = dec
        return out
