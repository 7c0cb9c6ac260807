"""dual_gan generators + discriminator (flax, NHWC).

Parity: CC/dual_gan/models/networks.py —
- define_G factory (:14-33), define_D (:36-38)
- SourceEncoder (:54-92), Resize_ReID adaptor (:140-162)
- DPTNGenerator (:165-275), AEGenerator with forward_enc/forward_dec (:278-355)
- DECGenerator1 (:401-446), FDGenerator (:449-543)
- PoseGenerator1 with PCTM cross-attention + U-Net skip adds (:639-738)
- PoseAEGenerator (:740-831)
- ResDiscriminator (:917-956)
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base_function import (
    EncoderBlock,
    EncoderBlockOptimized,
    FeatureAdaptBlock1,
    Output,
    ResBlock,
    ResBlockDecoder,
    ResBlockEncoder,
    ResBlockEncoderOptimized,
    SpectralConv,
    get_nonlinearity,
    make_norm,
    orth_init,
)
from .ptm import PCTM, PTM


def _enc_mults(ngf, img_f, layers):
    mults = [1]
    for i in range(layers - 1):
        mults.append(min(2 ** (i + 1), img_f // ngf))
    return mults


def _dec_mults(ngf, img_f, layers, mult):
    out = []
    for i in range(layers):
        mult = min(2 ** (layers - i - 2), img_f // ngf) if i != layers - 1 else 1
        out.append(mult)
    return out


class SourceEncoder(nn.Module):
    """En_s (networks.py:54-92)."""
    ngf: int = 64
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, source, train: bool = False):
        out = EncoderBlockOptimized(self.ngf, self.norm, self.activation,
                                    self.use_spect, self.use_coord,
                                    dtype=self.dtype,
                                    name="block0")(source, train)
        for i, mult in enumerate(_enc_mults(self.ngf, self.img_f, self.layers)[1:]):
            out = EncoderBlock(self.ngf * mult, self.norm, self.activation,
                               self.use_spect, self.use_coord,
                               dtype=self.dtype,
                               name=f"encoder{i}")(out, train)
        return out


class ResizeReID(nn.Module):
    """Residual adaptor: bicubic 128×64 → 256×128, + 3 ResBlocks
    (networks.py:140-162)."""
    ngf: int = 64
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bicubic")
        y = ResBlock(self.ngf, norm=self.norm, activation=self.activation,
                     use_spect=self.use_spect, dtype=self.dtype,
                     name="resblock1")(x, train)
        y = ResBlock(self.ngf, norm=self.norm, activation=self.activation,
                     use_spect=self.use_spect, dtype=self.dtype,
                     name="resblock2")(y, train)
        y = ResBlock(c, norm=self.norm, activation=self.activation,
                     use_spect=self.use_spect, dtype=self.dtype,
                     name="resblock3")(y, train)
        return x + y


class _Decoder(nn.Module):
    """Shared decoder stack: layers × ResBlockDecoder + Output."""
    ngf: int = 64
    img_f: int = 256
    layers: int = 3
    output_nc: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    skip_add: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feature, skips=None, train: bool = False):
        mult = min(2 ** (self.layers - 1), self.img_f // self.ngf)
        for i, m in enumerate(_dec_mults(self.ngf, self.img_f, self.layers, mult)):
            feature = ResBlockDecoder(self.ngf * m, self.ngf * m, self.norm,
                                      self.activation, self.use_spect,
                                      dtype=self.dtype,
                                      name=f"decoder{i}")(feature, train)
            if self.skip_add and skips and i < self.layers - 1:
                feature = feature + skips.pop()
        return Output(self.output_nc, 3, "none", self.activation,
                      self.use_spect, dtype=self.dtype,
                      name="outconv")(feature, train)


class AEGenerator(nn.Module):
    """Autoencoder generator with split enc/dec (networks.py:278-355)."""
    image_nc: int = 3
    ngf: int = 64
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    output_nc: int = 3
    num_blocks: int = 3
    dtype: Any = None

    def setup(self):
        self.block0 = EncoderBlockOptimized(self.ngf, self.norm, self.activation,
                                            self.use_spect, self.use_coord,
                                            dtype=self.dtype)
        mults = _enc_mults(self.ngf, self.img_f, self.layers)
        self.encoders = [EncoderBlock(self.ngf * m, self.norm, self.activation,
                                      self.use_spect, self.use_coord,
                                      dtype=self.dtype)
                         for m in mults[1:]]
        self.mblocks = [ResBlock(self.ngf * mults[-1], norm=self.norm,
                                 activation=self.activation,
                                 use_spect=self.use_spect,
                                 use_coord=self.use_coord,
                                 dtype=self.dtype)
                        for _ in range(self.num_blocks)]
        self.decoder = _Decoder(self.ngf, self.img_f, self.layers,
                                self.output_nc, self.norm, self.activation,
                                self.use_spect, dtype=self.dtype)

    def __call__(self, inputs, train: bool = False):
        return self.forward_dec(self.forward_enc(inputs, train), train)

    def forward_enc(self, source, train: bool = False):
        f = self.block0(source, train)
        for enc in self.encoders:
            f = enc(f, train)
        return f

    def forward_dec(self, feature, train: bool = False):
        for blk in self.mblocks:
            feature = blk(feature, train)
        return self.decoder(feature, train=train)


class DECGenerator1(nn.Module):
    """Spatial 2048-ch reid feature map → image (networks.py:401-446)."""
    ngf: int = 64
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    output_nc: int = 3
    num_blocks: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feature, train: bool = False):
        mult = 4
        f = FeatureAdaptBlock1(self.ngf * mult, self.norm, self.activation,
                               dtype=self.dtype,
                               name="feature_block")(feature, train)
        for i in range(self.num_blocks):
            f = ResBlock(self.ngf * mult, norm=self.norm,
                         activation=self.activation, use_spect=self.use_spect,
                         dtype=self.dtype, name=f"mblock{i}")(f, train)
        return _Decoder(self.ngf, self.img_f, self.layers, self.output_nc,
                        self.norm, self.activation, self.use_spect,
                        dtype=self.dtype, name="dec")(f, train=train)


class FDGenerator(nn.Module):
    """FD-GAN-style decoder-only generator from a reid vector
    (networks.py:449-543); fuse_mode none|add|cat."""
    reid_feature_nc: int = 2048
    ngf: int = 64
    noise_nc: int = 512
    output_nc: int = 3
    dropout: float = 0.0
    fuse_mode: str = "none"
    bottleneck_hw: Tuple[int, int] = (8, 4)
    dtype: Any = None

    @nn.compact
    def __call__(self, reid_feature, noise=None, train: bool = False):
        if self.fuse_mode == "cat":
            feat = jnp.concatenate([reid_feature, noise], axis=-1)
        elif self.fuse_mode == "add":
            ncm = max(self.reid_feature_nc, self.noise_nc)
            feat = (nn.Dense(ncm, use_bias=False, kernel_init=orth_init,
                             dtype=self.dtype, name="W_reid")(reid_feature) +
                    nn.Dense(ncm, use_bias=False, kernel_init=orth_init,
                             dtype=self.dtype, name="W_noise")(noise))
        else:
            feat = nn.Dense(self.reid_feature_nc, use_bias=False,
                            kernel_init=orth_init, dtype=self.dtype,
                            name="W_reid")(reid_feature)
        y = nn.relu(feat)[:, None, None, :]
        y = nn.ConvTranspose(self.ngf * 8, self.bottleneck_hw, padding="VALID",
                             use_bias=False, kernel_init=orth_init,
                             dtype=self.dtype, name="de_avg_conv")(y)
        bn = make_norm("batch", "de_avg_bn", train)
        y = bn(y)
        y = nn.Dropout(self.dropout, name="de_avg_drop")(y, deterministic=not train)

        for i, out_c in enumerate([self.ngf * 8, self.ngf * 4, self.ngf * 2,
                                   self.ngf]):
            y = nn.relu(y)
            y = nn.ConvTranspose(out_c, (4, 4), (2, 2), padding="SAME",
                                 use_bias=False, kernel_init=orth_init,
                                 dtype=self.dtype,
                                 name=f"de_conv{5 - i}_conv")(y)
            y = make_norm("batch", f"de_conv{5 - i}_bn", train)(y)
            y = nn.Dropout(self.dropout, name=f"de_conv{5 - i}_drop")(
                y, deterministic=not train)
        y = nn.relu(y)
        y = nn.ConvTranspose(self.output_nc, (4, 4), (2, 2), padding="SAME",
                             use_bias=False, kernel_init=orth_init,
                             dtype=self.dtype, name="de_conv1_conv")(y)
        return jnp.tanh(y).astype(jnp.promote_types(y.dtype, jnp.float32))


class PoseGenerator1(nn.Module):
    """Pose-map encoder + 1×1 reid adapter + PCTM + decoder with U-Net skip
    adds (networks.py:639-738). reid_f is the spatial (N,h,w,2048) GAN map."""
    ngf: int = 64
    pose_nc: int = 18
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    output_nc: int = 3
    affine: bool = True
    nhead: int = 2
    num_CABs: int = 2
    num_TTBs: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, reid_f, source_pose, train: bool = False):
        f_p = EncoderBlockOptimized(self.ngf, self.norm, self.activation,
                                    self.use_spect, self.use_coord,
                                    dtype=self.dtype,
                                    name="block0")(source_pose, train)
        skips = []
        mults = _enc_mults(self.ngf, self.img_f, self.layers)
        for i, m in enumerate(mults[1:]):
            skips.append(f_p)
            f_p = EncoderBlock(self.ngf * m, self.norm, self.activation,
                               self.use_spect, self.use_coord,
                               dtype=self.dtype,
                               name=f"encoder{i}")(f_p, train)
        d_model = self.ngf * mults[-1]
        f_id = FeatureAdaptBlock1(d_model, self.norm, self.activation,
                                  dtype=self.dtype,
                                  name="feature_block")(reid_f, train)
        f_g = PCTM(d_model, self.nhead, self.num_CABs, self.num_TTBs,
                   dim_feedforward=d_model, activation="LeakyReLU",
                   affine=self.affine, norm=self.norm, dtype=self.dtype,
                   name="PCTM")(f_p, f_id, train=train)
        for i, m in enumerate(_dec_mults(self.ngf, self.img_f, self.layers, None)):
            f_g = ResBlockDecoder(self.ngf * m, self.ngf * m, self.norm,
                                  self.activation, self.use_spect,
                                  dtype=self.dtype,
                                  name=f"decoder{i}")(f_g, train)
            if i < self.layers - 1:
                f_g = f_g + skips.pop()
        return Output(self.output_nc, 3, "none", self.activation,
                      self.use_spect, dtype=self.dtype,
                      name="outconv")(f_g, train)


class PoseAEGenerator(nn.Module):
    """Dual pose/image encoders + PCTM + decoder (networks.py:740-831)."""
    ngf: int = 64
    image_nc: int = 3
    pose_nc: int = 18
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    output_nc: int = 3
    affine: bool = True
    nhead: int = 2
    num_CABs: int = 2
    num_TTBs: int = 2
    dtype: Any = None

    def setup(self):
        mults = _enc_mults(self.ngf, self.img_f, self.layers)
        self.block0_p = EncoderBlockOptimized(self.ngf, self.norm,
                                              self.activation, self.use_spect,
                                              self.use_coord, dtype=self.dtype)
        self.block0_i = EncoderBlockOptimized(self.ngf, self.norm,
                                              self.activation, self.use_spect,
                                              self.use_coord, dtype=self.dtype)
        self.encoders_i = [EncoderBlock(self.ngf * m, self.norm,
                                        self.activation, self.use_spect,
                                        self.use_coord, dtype=self.dtype)
                           for m in mults[1:]]
        self.encoders_p = [EncoderBlock(self.ngf * m, self.norm,
                                        self.activation, self.use_spect,
                                        self.use_coord, dtype=self.dtype)
                           for m in mults[1:]]
        d_model = self.ngf * mults[-1]
        self.pctm = PCTM(d_model, self.nhead, self.num_CABs, self.num_TTBs,
                         dim_feedforward=d_model, activation="LeakyReLU",
                         affine=self.affine, norm=self.norm, dtype=self.dtype)
        self.decoder = _Decoder(self.ngf, self.img_f, self.layers,
                                self.output_nc, self.norm, self.activation,
                                self.use_spect, dtype=self.dtype)

    def __call__(self, source_image, target_pose, train: bool = False):
        f_i, f_p = self.forward_enc(source_image, target_pose, train)
        f_g = self.pctm(f_p, f_i, train=train)
        return self.forward_dec(f_g, train)

    def forward_enc(self, source_image, target_pose, train: bool = False):
        f_i = self.block0_i(source_image, train)
        f_p = self.block0_p(target_pose, train)
        for enc_i, enc_p in zip(self.encoders_i, self.encoders_p):
            f_i = enc_i(f_i, train)
            f_p = enc_p(f_p, train)
        return f_i, f_p

    def forward_dec(self, f_composed, train: bool = False):
        return self.decoder(f_composed, train=train)


class DPTNGenerator(nn.Module):
    """Dual-task Pose Transformer Network (networks.py:165-275)."""
    image_nc: int = 3
    pose_nc: int = 18
    ngf: int = 64
    img_f: int = 256
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    output_nc: int = 3
    num_blocks: int = 3
    affine: bool = True
    nhead: int = 2
    num_CABs: int = 2
    num_TTBs: int = 2
    dtype: Any = None

    def setup(self):
        mults = _enc_mults(self.ngf, self.img_f, self.layers)
        self.block0 = EncoderBlockOptimized(self.ngf, self.norm,
                                            self.activation, self.use_spect,
                                            self.use_coord, dtype=self.dtype)
        self.encoders = [EncoderBlock(self.ngf * m, self.norm, self.activation,
                                      self.use_spect, self.use_coord,
                                      dtype=self.dtype)
                         for m in mults[1:]]
        d_model = self.ngf * mults[-1]
        self.mblocks = [ResBlock(d_model, norm=self.norm,
                                 activation=self.activation,
                                 use_spect=self.use_spect,
                                 use_coord=self.use_coord,
                                 dtype=self.dtype)
                        for _ in range(self.num_blocks)]
        self.ptm = PTM(d_model, self.nhead, self.num_CABs, self.num_TTBs,
                       dim_feedforward=d_model, activation="LeakyReLU",
                       affine=self.affine, norm=self.norm, dtype=self.dtype)
        self.source_encoder = SourceEncoder(self.ngf, self.img_f, self.layers,
                                            self.norm, self.activation,
                                            self.use_spect, self.use_coord,
                                            dtype=self.dtype)
        self.decoder = _Decoder(self.ngf, self.img_f, self.layers,
                                self.output_nc, self.norm, self.activation,
                                self.use_spect, dtype=self.dtype)

    def _encode(self, x, train):
        f = self.block0(x, train)
        for enc in self.encoders:
            f = enc(f, train)
        for blk in self.mblocks:
            f = blk(f, train)
        return f

    def __call__(self, source, source_b, target_b, is_train: bool = True,
                 train: bool = False):
        f_s_s = self._encode(jnp.concatenate([source, source_b, source_b], -1),
                             train)
        f_s_t = self._encode(jnp.concatenate([source, source_b, target_b], -1),
                             train)
        f_s = self.source_encoder(source, train)
        f_s_t = self.ptm(f_s_s, f_s_t, f_s, train=train)
        out_image_s = self.decoder(f_s_s, train=train) if is_train else None
        out_image_t = self.decoder(f_s_t, train=train)
        return out_image_t, out_image_s


class ResDiscriminator(nn.Module):
    """Spectral-norm residual discriminator (networks.py:917-956)."""
    input_nc: int = 3
    ndf: int = 64
    img_f: int = 1024
    layers: int = 3
    norm: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ResBlockEncoderOptimized(self.ndf, self.ndf, self.norm,
                                       self.activation, self.use_spect,
                                       dtype=self.dtype,
                                       name="block0")(x, train)
        mult = 1
        for i in range(self.layers - 1):
            mult_prev = mult
            mult = min(2 ** (i + 1), self.img_f // self.ndf)
            out = ResBlockEncoder(self.ndf * mult, self.ndf * mult_prev,
                                  self.norm, self.activation, self.use_spect,
                                  dtype=self.dtype,
                                  name=f"encoder{i}")(out, train)
        out = get_nonlinearity(self.activation)(out)
        # D scores leave in ≥fp32 so the GAN losses accumulate full-precision
        sc = SpectralConv(1, (1, 1), padding=0, use_spect=True,
                          dtype=self.dtype, name="conv")(out, train)
        return sc.astype(jnp.promote_types(sc.dtype, jnp.float32))


def define_G(model_gen="AE", image_nc=3, pose_nc=18, ngf=64, img_f=256,
             encoder_layer=3, norm="batch", activation="LeakyReLU",
             use_spect=False, use_coord=False, output_nc=3, num_blocks=3,
             affine=True, nhead=2, num_CABs=2, num_TTBs=2, dtype=None):
    """Generator factory (networks.py:14-33). ``dtype`` is the compute
    dtype (bf16 runs the conv/attention FLOPs on the MXU half-precision;
    params/norms/spectral iteration stay fp32 — see base_function)."""
    if model_gen == "DPTN":
        return DPTNGenerator(image_nc, pose_nc, ngf, img_f, encoder_layer,
                             norm, activation, use_spect, use_coord, output_nc,
                             num_blocks, affine, nhead, num_CABs, num_TTBs,
                             dtype=dtype)
    if model_gen == "AE":
        return AEGenerator(image_nc, ngf, img_f, encoder_layer, norm,
                           activation, use_spect, use_coord, output_nc,
                           num_blocks, dtype=dtype)
    if model_gen == "DEC":
        return DECGenerator1(ngf, img_f, encoder_layer, norm, activation,
                             use_spect, output_nc, num_blocks, dtype=dtype)
    if model_gen == "FD":
        return FDGenerator(img_f, ngf, noise_nc=512, output_nc=3,
                           fuse_mode="add", dtype=dtype)
    if model_gen == "Pose":
        return PoseGenerator1(ngf, pose_nc, img_f, encoder_layer, norm,
                              activation, use_spect, use_coord, output_nc,
                              affine, nhead, num_CABs, num_TTBs, dtype=dtype)
    if model_gen == "PoseAE":
        return PoseAEGenerator(ngf, image_nc, pose_nc, img_f, encoder_layer,
                               norm, activation, use_spect, use_coord,
                               output_nc, affine, nhead, num_CABs, num_TTBs,
                               dtype=dtype)
    raise ValueError(f"generator {model_gen} not implemented")


def define_D(input_nc=3, ndf=32, img_f=128, layers=3, norm="none",
             activation="LeakyReLU", use_spect=True, dtype=None):
    """Discriminator factory (networks.py:36-38; AEModel uses ndf=32,
    img_f=128, AE_model.py:100)."""
    return ResDiscriminator(input_nc, ndf, img_f, layers, norm, activation,
                            use_spect, dtype=dtype)
