"""Torch-oracle parity for the flagship archs + reference checkpoint interop
(VERDICT r2 item 3).

Hand-built torch models reproduce the reference layouts (torchvision
Bottleneck resnet50, IBN-a resnet50, CC ``base.N`` sequential wrapping,
torchvision vgg19.features indices) so the weight importers are validated
against real torch numerics without torchvision in the image.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# hand-built torch reference models
# ---------------------------------------------------------------------------

class _TorchIBN(tnn.Module):
    """IBN-a split norm (CC/clustercontrast/models/resnet_ibn_a.py:54-67)."""

    def __init__(self, planes):
        super().__init__()
        half = planes // 2
        self.half = half
        self.IN = tnn.InstanceNorm2d(half, affine=True)
        self.BN = tnn.BatchNorm2d(planes - half)

    def forward(self, x):
        a, b = torch.split(x, self.half, 1)
        return torch.cat([self.IN(a.contiguous()), self.BN(b.contiguous())], 1)


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, ibn=False):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _TorchIBN(planes) if ibn else tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y)).relu()
        y = self.bn3(self.conv3(y))
        return (y + idt).relu()


class _TorchResNet50(tnn.Module):
    """torchvision-style resnet50 trunk with the CC modifications: layer4
    stride 1 (CC/clustercontrast/models/resnet.py:34-35) and optional IBN-a
    in stages 1-3 (resnet_ibn_a.py: ibn off when planes == 512)."""

    def __init__(self, ibn=False, last_stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        sizes = (3, 4, 6, 3)
        cin = 64
        layers = []
        for i, planes in enumerate([64, 128, 256, 512]):
            stride = 1 if i == 0 else (last_stride if i == 3 else 2)
            blocks = []
            for j in range(sizes[i]):
                blocks.append(_TorchBottleneck(
                    cin, planes, stride if j == 0 else 1,
                    ibn=ibn and planes != 512))
                cin = planes * 4
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(self.bn1(self.conv1(x)).relu())
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.rand(m.running_mean.shape,
                                            generator=g) - 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


def _feat_parity(ibn):
    from reid_gan_tpu.models.resnet import ReIDResNet, import_torch_resnet

    torch.manual_seed(1)
    tmodel = _TorchResNet50(ibn=ibn).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)

    jmodel = ReIDResNet(depth=50, ibn=ibn, cut_at_pooling=True,
                        pooling_type="avg", last_stride=1)
    x = jnp.zeros((2, 64, 32, 3))
    variables = jmodel.init(jax.random.PRNGKey(0), x, train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, unmatched = import_torch_resnet(
        sd, variables["params"], variables["batch_stats"])
    assert unmatched == [], unmatched[:10]

    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 32, 3).astype(np.float32)
    with torch.no_grad():
        fmap = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        ref = fmap.mean(dim=(2, 3)).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(jmodel.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(img), train=False)["feat"])
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_torch_import_parity_resnet50():
    """Bottleneck (flagship resnet50) oracle, last-stride 1."""
    _feat_parity(ibn=False)


def test_torch_import_parity_ibn50a():
    """IBN-a resnet50 — the 87.0-mAP recipe's arch (BASELINE.md)."""
    _feat_parity(ibn=True)


# ---------------------------------------------------------------------------
# reference-format CC checkpoint → cli.test --resume-torch
# ---------------------------------------------------------------------------

class _TorchResNet18Trunk(tnn.Module):
    def __init__(self, last_stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def block(cin, cout, stride):
            class B(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
                    self.bn1 = tnn.BatchNorm2d(cout)
                    self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
                    self.bn2 = tnn.BatchNorm2d(cout)
                    self.downsample = None
                    if stride != 1 or cin != cout:
                        self.downsample = tnn.Sequential(
                            tnn.Conv2d(cin, cout, 1, stride, bias=False),
                            tnn.BatchNorm2d(cout))

                def forward(self, x):
                    idt = x if self.downsample is None else self.downsample(x)
                    y = self.bn1(self.conv1(x)).relu()
                    return (self.bn2(self.conv2(y)) + idt).relu()
            return B()

        cin = 64
        layers = []
        for i, cout in enumerate([64, 128, 256, 512]):
            stride = 1 if i == 0 else (last_stride if i == 3 else 2)
            layers.append(tnn.Sequential(block(cin, cout, stride),
                                         block(cout, cout, 1)))
            cin = cout
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(self.bn1(self.conv1(x)).relu())
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _cc_state_dict(trunk, nfeat=512, gem_p=3.2, seed=0):
    """Wrap a trunk state dict in the CC checkpoint layout
    (``module.base.N`` sequential keys + feat_bn + gap.p,
    CC/clustercontrast/models/resnet.py:37-39)."""
    seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
           "layer3": "6", "layer4": "7"}
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for k, v in trunk.state_dict().items():
        head, rest = k.split(".", 1)
        sd[f"module.base.{seq[head]}.{rest}"] = v
    sd["module.gap.p"] = torch.tensor([gem_p])
    sd["module.feat_bn.weight"] = torch.rand(nfeat, generator=g) + 0.5
    sd["module.feat_bn.bias"] = torch.zeros(nfeat)       # frozen at 0
    sd["module.feat_bn.running_mean"] = torch.rand(nfeat, generator=g) - 0.5
    sd["module.feat_bn.running_var"] = torch.rand(nfeat, generator=g) + 0.5
    sd["module.feat_bn.num_batches_tracked"] = torch.tensor(7)
    return sd


def test_reference_checkpoint_resume_torch(tmp_path):
    """A CC-format ``.pth`` (module. prefix, base.N layout, state_dict
    wrapper, GeM p, feat_bn) loads through cli.test's --resume-torch path
    and reproduces the reference eval pipeline bit-for-float."""
    from reid_gan_tpu.cli.test import load_torch_reference_checkpoint
    from reid_gan_tpu.models import create as create_model

    torch.manual_seed(3)
    trunk = _TorchResNet18Trunk(last_stride=1).eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, seed=5)
    sd = _cc_state_dict(trunk)
    fpath = tmp_path / "checkpoint.pth.tar"
    torch.save({"state_dict": sd, "epoch": 49, "best_mAP": 0.87}, str(fpath))

    model = create_model("resnet18", norm=True, pooling_type="gem")
    dummy = jnp.zeros((2, 64, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=True)
    variables = load_torch_reference_checkpoint(str(fpath), variables)
    assert float(variables["params"]["gap"]["p"][0]) == pytest.approx(3.2)

    rng = np.random.RandomState(1)
    img = rng.rand(2, 64, 32, 3).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply(variables, jnp.asarray(img),
                                      train=False)["feat"])

    # reference eval pipeline: trunk → GeM(p) → feat_bn (eval, bias frozen
    # 0) → F.normalize (CC/clustercontrast/models/resnet.py:73-94)
    with torch.no_grad():
        fmap = trunk(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        p = 3.2
        pooled = fmap.clamp(min=1e-6).pow(p).mean(dim=(2, 3)).pow(1.0 / p)
        w = sd["module.feat_bn.weight"]
        mean = sd["module.feat_bn.running_mean"]
        var = sd["module.feat_bn.running_var"]
        bn = (pooled - mean) / torch.sqrt(var + 1e-5) * w
        ref = torch.nn.functional.normalize(bn, dim=1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# VGG19 tap extractor vs the torchvision module graph
# ---------------------------------------------------------------------------

def _torchvision_vgg19_features():
    """The exact torchvision vgg19 ``features`` Sequential (conv indices
    0,2,5,...,34) built by the standard make_layers recipe the reference's
    VGG19 tap extractor slices (CC/dual_gan/models/external_function.py:
    226-347)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    return tnn.Sequential(*layers)


def test_vgg19_tap_parity():
    from reid_gan_tpu.models.dual_gan.external_function import (
        VGG19,
        import_torch_vgg19,
    )

    torch.manual_seed(11)
    tfeat = _torchvision_vgg19_features().eval()
    sd = {f"features.{i}.{p}": v.detach().numpy()
          for i, m in enumerate(tfeat)
          for p, v in m.state_dict().items()}

    model = VGG19()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    params = import_torch_vgg19(sd, params)

    rng = np.random.RandomState(2)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        taps = model.apply({"params": params}, jnp.asarray(img))

    x = torch.from_numpy(img.transpose(0, 3, 1, 2))
    ref_taps = []
    with torch.no_grad():
        for m in tfeat:
            x = m(x)
            if isinstance(m, tnn.ReLU):
                ref_taps.append(x.numpy().transpose(0, 2, 3, 1))
    names = ["relu1_1", "relu1_2", "relu2_1", "relu2_2",
             "relu3_1", "relu3_2", "relu3_3", "relu3_4",
             "relu4_1", "relu4_2", "relu4_3", "relu4_4",
             "relu5_1", "relu5_2", "relu5_3", "relu5_4"]
    assert set(taps) == set(names)
    for name, ref in zip(names, ref_taps):
        np.testing.assert_allclose(np.asarray(taps[name]), ref,
                                   rtol=2e-3, atol=2e-4)
