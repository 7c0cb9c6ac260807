"""FD-GAN generator + PatchGAN discriminator in flax (NHWC).

Parity: FD/fdgan/networks.py —
- CustomPoseGenerator (networks.py:62-192): 5-layer strided pose encoder to a
  1×1 pose code; cat/add fusion of (reid feature, pose code, noise); 5-layer
  transposed-conv decoder with 0–5 U-Net skip concats selected by the
  ``connect_layers`` table (networks.py:78-83).
- NLayerDiscriminator (networks.py:194-237): 3-layer PatchGAN, ndf=64.

Pre-activation ordering matches the reference exactly (activation BEFORE each
conv inside encode/decode blocks; the first encoder conv and the final logits
conv are bare). Norm layer is BatchNorm (affine) as in the default config.
Init: N(0, 0.02) convs, BN scale N(1, 0.02) (networks.py:13-21).
"""

import flax.linen as nn

from ...ops.fastconv import Conv as FastConv
import jax.numpy as jnp
from ...ops.norm import TorchBatchNorm

conv_init = nn.initializers.normal(0.02)


def _bn_gan(name, train):
    return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name,
                        scale_init=nn.initializers.normal(0.02, dtype=jnp.float32))


# connect_layers → per-decode-stage input channel multipliers (networks.py:78-83)
_INPUT_CHANNEL = [
    [8, 8, 4, 2, 1],
    [16, 8, 4, 2, 1],
    [16, 16, 4, 2, 1],
    [16, 16, 8, 2, 1],
    [16, 16, 8, 4, 1],
    [16, 16, 8, 4, 2],
]


class CustomPoseGenerator(nn.Module):
    pose_feature_nc: int = 128
    reid_feature_nc: int = 2048
    noise_nc: int = 56
    pose_nc: int = 18
    output_nc: int = 3
    dropout: float = 0.0
    fuse_mode: str = "cat"
    connect_layers: int = 0
    ngf: int = 64

    @nn.compact
    def __call__(self, posemap, reid_feature, noise, train: bool = False):
        """posemap (N,256,128,18); reid_feature (N,2048); noise (N,noise_nc)
        → fake image (N,256,128,3) in tanh [-1,1]."""
        assert 0 <= self.connect_layers <= 5
        ngf = self.ngf
        lrelu = lambda x: nn.leaky_relu(x, 0.2)  # noqa: E731

        def enc(x, out_c, name):
            x = lrelu(x)
            x = FastConv(out_c, (4, 4), (2, 2), padding=1, use_bias=False,
                        kernel_init=conv_init, name=f"{name}_conv")(x)
            return _bn_gan(f"{name}_bn", train)(x)

        # Encoder (networks.py:86-101)
        p1 = FastConv(ngf, (4, 4), (2, 2), padding=1, use_bias=False,
                     kernel_init=conv_init, name="en_conv1")(posemap)
        p2 = enc(p1, ngf * 2, "en_conv2")
        p3 = enc(p2, ngf * 4, "en_conv3")
        p4 = enc(p3, ngf * 8, "en_conv4")
        p5 = enc(p4, ngf * 8, "en_conv5")
        pe = lrelu(p5)
        # global (H/32, W/32) kernel → 1×1 pose code ((8,4) at 256×128,
        # networks.py:96-99; derived from input size so small test shapes work)
        k_avg = (posemap.shape[1] // 32, posemap.shape[2] // 32)
        pe = FastConv(self.pose_feature_nc, k_avg, padding="VALID",
                     use_bias=False, kernel_init=conv_init, name="en_avg_conv")(pe)
        pose_feature = _bn_gan("en_avg_bn", train)(pe)       # (N,1,1,pose_nc)

        # Fusion (networks.py:104-122,174-181)
        reid = reid_feature[:, None, None, :]
        z = noise[:, None, None, :]
        if self.fuse_mode == "cat":
            feat = jnp.concatenate([reid, pose_feature, z], axis=-1)
        elif self.fuse_mode == "add":
            ncm = max(self.pose_feature_nc, self.reid_feature_nc, self.noise_nc)
            feat = (nn.Dense(ncm, use_bias=False, kernel_init=conv_init,
                             name="W_reid")(reid_feature) +
                    nn.Dense(ncm, use_bias=False, kernel_init=conv_init,
                             name="W_pose")(pose_feature[:, 0, 0, :]) +
                    nn.Dense(ncm, use_bias=False, kernel_init=conv_init,
                             name="W_noise")(noise))[:, None, None, :]
        else:
            raise ValueError("fuse_mode must be cat|add")

        # de_avg: 1×1 → 8×4 (networks.py:105-109)
        y = nn.relu(feat)
        y = nn.ConvTranspose(ngf * 8, k_avg, padding="VALID", use_bias=False,
                             kernel_init=conv_init, name="de_avg_conv")(y)
        y = _bn_gan("de_avg_bn", train)(y)
        y = nn.Dropout(self.dropout, name="de_avg_drop")(y, deterministic=not train)

        def dec(x, skip, out_c, cn, name):
            if cn > 0:
                x = jnp.concatenate([x, skip], axis=-1)
            x = nn.relu(x)
            x = nn.ConvTranspose(out_c, (4, 4), (2, 2), padding="SAME",
                                 use_bias=False, kernel_init=conv_init,
                                 name=f"{name}_conv")(x)
            x = _bn_gan(f"{name}_bn", train)(x)
            x = nn.Dropout(self.dropout, name=f"{name}_drop")(x, deterministic=not train)
            return x, cn - 1 if cn > 0 else cn

        cn = self.connect_layers
        y, cn = dec(y, p5, ngf * 8, cn, "de_conv5")
        y, cn = dec(y, p4, ngf * 4, cn, "de_conv4")
        y, cn = dec(y, p3, ngf * 2, cn, "de_conv3")
        y, cn = dec(y, p2, ngf, cn, "de_conv2")
        if cn > 0:
            y = jnp.concatenate([y, p1], axis=-1)
        y = nn.relu(y)
        y = nn.ConvTranspose(self.output_nc, (4, 4), (2, 2), padding="SAME",
                             use_bias=False, kernel_init=conv_init,
                             name="de_conv1_conv")(y)
        return jnp.tanh(y)


class NLayerDiscriminator(nn.Module):
    """3-layer PatchGAN over (posemap ⊕ image) — channel order per
    FD/fdgan/model.py:160-161 torch.cat((posemap, image), dim=1)
    (networks.py:194-237)."""
    input_nc: int = 21
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = FastConv(self.ndf, (4, 4), (2, 2), padding=1,
                    kernel_init=conv_init, name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            y = FastConv(self.ndf * nf_mult, (4, 4), (2, 2), padding=1,
                        use_bias=False, kernel_init=conv_init, name=f"conv{n}")(y)
            y = _bn_gan(f"bn{n}", train)(y)
            y = nn.leaky_relu(y, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        y = FastConv(self.ndf * nf_mult, (4, 4), (1, 1), padding=1,
                    use_bias=False, kernel_init=conv_init,
                    name=f"conv{self.n_layers}")(y)
        y = _bn_gan(f"bn{self.n_layers}", train)(y)
        y = nn.leaky_relu(y, 0.2)
        return FastConv(1, (4, 4), (1, 1), padding=1,
                       kernel_init=conv_init, name="conv_out")(y)
