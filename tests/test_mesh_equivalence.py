"""Sharded-vs-single-device equivalence of EVERY distributed train step.

The reference wraps every net in nn.DataParallel (CC/dual_gan/models/
base_function.py:93-102, FD/fdgan/model.py:67-70); the TPU-native contract is
that the same jitted step over an 8-device data mesh (replicated state,
sharded batch) computes the same update as one device. One test per mode:
train / train_all / train_all_bip / train_all_with_memory / gan / fdgan.
(The plain-USL step and eval extraction live in test_trainer.py /
test_evaluators.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.config import FDGANConfig, GANConfig
from reid_gan_tpu.engine.gan_trainers import (
    ClusterContrastWithGANTrainer,
    GANTrainer,
)
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.models.dual_gan.ae_model import AEModel
from reid_gan_tpu.ops.cluster_memory import init_gradient_memory, init_memory
import pytest

pytestmark = pytest.mark.slow   # multi-minute jit traces on 1-CPU hosts

H, W = 32, 16
GH, GW = 16, 8


class FakeLoader:
    def __init__(self, batch):
        self.batch = batch

    def next(self):
        return self.batch


def _batch(rng, b=8, k=4, group=2):
    pids = np.repeat(rng.randint(0, k, b // group), group)
    return {"img": rng.randint(0, 256, (b, H, W, 3), dtype=np.uint8),
            "pid": pids,
            "Xs": rng.randint(0, 256, (b, GH, GW, 3), dtype=np.uint8),
            "keypoints": rng.randint(0, 16, (b, 18, 2)).astype(np.float32),
            "old_size": np.full((b, 2), 16.0, np.float32),
            "index": np.arange(b)}


def _setup(mesh, model_gen, arch="resnet18", k=4, feat=512):
    rng = np.random.RandomState(0)
    if arch == "bip18":
        from reid_gan_tpu.models.resnet_variants import ResNetBip

        encoder = ResNetBip(depth=18, norm=True)
    else:
        encoder = create_model(arch, norm=True)
    enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((8, H, W, 3)),
                            train=True)
    gan = AEModel(GANConfig(model="AE", model_gen=model_gen), gan_height=GH,
                  gan_width=GW, num_feats=32, ngf=8, num_blocks=1,
                  reid_feat_dim=feat)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(k, feat).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=H, width=W, iters_per_epoch=4, num_instances=2,
        mesh=mesh)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))
    return trainer, state


def _assert_close(t1, t8, atol=2e-3):
    l1 = jax.tree_util.tree_leaves(t1)
    l8 = jax.tree_util.tree_leaves(t8)
    assert len(l1) == len(l8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=atol)


def _run_mode(mesh, mode, **kw):
    arch = kw.pop("arch", "resnet18")
    gen = kw.pop("model_gen")
    feat = 512
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    out = []
    for m in (None, mesh):
        trainer, state = _setup(m, gen, arch=arch, feat=feat)
        if mode == "train_all_with_memory":
            gmem = init_gradient_memory(np.asarray(state.memory.features))
            state, gmem, errs = trainer.run_epoch(
                state, 0, FakeLoader(batch), mode=mode, train_iters=1,
                print_freq=100, gmem=gmem, cluster_lr=0.1)
            out.append((state, errs, gmem))
        else:
            state, errs = trainer.run_epoch(state, 0, FakeLoader(batch),
                                            mode=mode, train_iters=1,
                                            print_freq=100, **kw)
            out.append((state, errs, None))
    (s1, e1, g1), (s8, e8, g8) = out
    for name in e1:
        assert abs(e1[name] - e8[name]) < 2e-3, (name, e1[name], e8[name])
    _assert_close(s1.enc_params, s8.enc_params)
    _assert_close(s1.memory.features, s8.memory.features)
    _assert_close(s1.gan.G["params"], s8.gan.G["params"])
    if g1 is not None:
        _assert_close(g1.clusters, g8.clusters)


def test_train_mode_sharded_equivalence(mesh):
    _run_mode(mesh, "train", model_gen="AE")


def test_train_all_mode_sharded_equivalence(mesh):
    _run_mode(mesh, "train_all", model_gen="Pose")


def test_train_all_bip_sharded_equivalence(mesh):
    _run_mode(mesh, "train_all_bip", model_gen="AE", arch="bip18")


def test_train_all_with_memory_sharded_equivalence(mesh):
    _run_mode(mesh, "train_all_with_memory", model_gen="Pose")


def test_gan_pretrainer_sharded_equivalence(mesh):
    rng = np.random.RandomState(2)
    batch = {"Xs": rng.randint(0, 256, (8, GH, GW, 3), dtype=np.uint8)}
    out = []
    for m in (None, mesh):
        gan = AEModel(GANConfig(model="AE", model_gen="AE"), gan_height=GH,
                      gan_width=GW, num_feats=32, ngf=8, num_blocks=1)
        gan_state = gan.init_state(jax.random.PRNGKey(0))
        t = GANTrainer(gan, mesh=m)
        gan_state, errs = t.train_gan(gan_state, 0, FakeLoader(batch),
                                      train_iters=1)
        out.append((gan_state, errs))
    (s1, e1), (s8, e8) = out
    assert abs(e1["G"] - e8["G"]) < 2e-3
    assert abs(e1["D"] - e8["D"]) < 2e-3
    _assert_close(s1.G["params"], s8.G["params"])
    _assert_close(s1.D["params"], s8.D["params"])


def test_fdgan_step_sharded_equivalence(mesh):
    from reid_gan_tpu.models.fdgan.model import FDGANModel

    rng = np.random.RandomState(3)

    def pair(pids):
        b = len(pids)
        return {"img": rng.randint(0, 256, (b, 64, 32, 3), dtype=np.uint8),
                "target": rng.randint(0, 256, (b, 64, 32, 3), dtype=np.uint8),
                "landmark": rng.randint(0, 30, (b, 18, 2)).astype(np.float32),
                "flip": rng.rand(b) < 0.5,
                "pid": np.asarray(pids)}

    b1, b2 = pair([1, 2, 3, 4, 5, 6, 7, 8]), pair([1, 9, 3, 10, 5, 11, 7, 12])
    cfg = FDGANConfig(stage=2, pose_feature_size=32, noise_size=8,
                      lambda_recon=10.0, lambda_veri=1.0, lambda_sp=1.0)
    out = []
    for m in (None, mesh):
        model = FDGANModel(cfg, height=64, width=32, depth=18, mesh=m)
        state = model.init_state(jax.random.PRNGKey(0))
        state, errors, fake = model.optimize_step(state, b1, b2,
                                                  jax.random.PRNGKey(1))
        out.append((state, errors))
    (s1, e1), (s8, e8) = out
    for name in e1:
        assert abs(float(e1[name]) - float(e8[name])) < 2e-3, name
    _assert_close(s1.G["params"], s8.G["params"])
    _assert_close(s1.E["params"], s8.E["params"])
    _assert_close(s1.Di["params"], s8.Di["params"])
    _assert_close(s1.Dp["params"], s8.Dp["params"])
