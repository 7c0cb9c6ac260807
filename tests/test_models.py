"""Backbone tests: shapes, BN semantics, GeM parity, and numerical parity of
the torch-weight importer against a torch oracle (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from reid_gan_tpu.models import create, names, siamese_baseline
from reid_gan_tpu.models.resnet import FDResNet, ReIDResNet, import_torch_resnet


def test_factory_names():
    assert "resnet50" in names() and "resnet_ibn50a" in names()
    with pytest.raises(KeyError):
        create("nope")


def _init(model, shape=(2, 64, 32, 3), train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=train)
    return variables, x


def test_reid_resnet18_shapes():
    model = create("resnet18")
    variables, x = _init(model)
    out = model.apply(variables, x, train=False)
    assert out["feat"].shape == (2, 512)
    # eval features are L2-normalized (resnet.py:90-94)
    np.testing.assert_allclose(np.linalg.norm(out["feat"], axis=1), 1.0, atol=1e-4)


def test_reid_resnet_train_outputs():
    model = ReIDResNet(depth=18, norm=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out, new_state = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert out["feat"].shape == (2, 512)
    # last-stride 1: 64/16 = 4, 32/16 = 2 spatial
    assert out["gan_feat"].shape == (2, 4, 2, 512)
    # gan features are channel-normalized per position
    norms = np.linalg.norm(np.asarray(out["gan_feat"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # batch_stats updated in train mode
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_last_stride():
    m1 = ReIDResNet(depth=18, last_stride=1)
    m2 = ReIDResNet(depth=18, last_stride=2)
    x = jnp.zeros((1, 64, 32, 3))
    v1 = m1.init(jax.random.PRNGKey(0), x, train=True)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=True)
    o1, _ = m1.apply(v1, x, train=True, mutable=["batch_stats"])
    o2, _ = m2.apply(v2, x, train=True, mutable=["batch_stats"])
    assert o1["gan_feat"].shape[1] == 2 * o2["gan_feat"].shape[1]


def test_ibn_variant_runs():
    model = create("resnet_ibn50a")
    variables, x = _init(model, shape=(1, 64, 32, 3))
    out = model.apply(variables, x, train=False)
    assert out["feat"].shape == (1, 2048)


def test_gem_pooling_matches_numpy():
    from reid_gan_tpu.models.pooling import GeneralizedMeanPooling

    x = np.abs(np.random.RandomState(0).randn(2, 4, 4, 8)).astype(np.float32)
    gem = GeneralizedMeanPooling(p=3.0)
    v = gem.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(gem.apply(v, jnp.asarray(x)))
    ref = (np.clip(x, 1e-6, None) ** 3.0).mean(axis=(1, 2)) ** (1 / 3.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_siamese_baseline_shapes():
    model = siamese_baseline(depth=18)
    x = jnp.zeros((2, 64, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    f1, f2, logits = model.apply(variables, x, x, train=False)
    assert f1.shape == (2, 512)
    assert logits.shape == (2, 2)


# ---------------------------------------------------------------------------
# torch oracle for the weight importer (torchvision BasicBlock resnet18 layout)
# ---------------------------------------------------------------------------

class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
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
        y = self.bn2(self.conv2(y))
        return (y + idt).relu()


class _TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for i, cout in enumerate([64, 128, 256, 512]):
            blocks = []
            for j in range(2):
                stride = 1 if (i == 0 or j > 0) else 2
                blocks.append(_TorchBasicBlock(cin, cout, stride))
                cin = cout
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(self.bn1(self.conv1(x)).relu())
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3))


def test_torch_weight_import_parity():
    torch.manual_seed(0)
    tmodel = _TorchResNet18().eval()
    # randomize BN stats so the test exercises running-stat import
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    jmodel = FDResNet(depth=18, cut_at_pooling=True)
    x = jnp.zeros((2, 64, 32, 3))
    variables = jmodel.init(jax.random.PRNGKey(0), x, train=False)
    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, unmatched = import_torch_resnet(
        state_dict, variables["params"], variables["batch_stats"])
    assert unmatched == []

    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(jmodel.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(img), train=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
