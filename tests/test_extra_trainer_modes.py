"""The two trainer modes that are dead code in the reference, implemented to
their intended semantics: train_all_with_memory (trainable cluster memory
refined by the GAN) and train_all_bip (bi-path encoder)."""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.config import GANConfig
from reid_gan_tpu.engine.gan_trainers import ClusterContrastWithGANTrainer
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


def test_train_all_with_memory_updates_clusters():
    rng = np.random.RandomState(0)
    encoder = create_model("resnet18", norm=True)
    enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((2, H, W, 3)),
                            train=True)
    gan = AEModel(GANConfig(model="AE", model_gen="Pose"), gan_height=GH,
                  gan_width=GW, num_feats=32, ngf=8, num_blocks=1,
                  reid_feat_dim=512)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(4, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(encoder, gan, height=H, width=W,
                                            iters_per_epoch=4, num_instances=2)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))
    gmem = init_gradient_memory(centers)
    before = np.asarray(gmem.clusters).copy()
    state, gmem, errs = trainer.run_epoch(
        state, 0, FakeLoader(_batch(rng)), mode="train_all_with_memory",
        train_iters=2, print_freq=100, gmem=gmem, cluster_lr=0.1)
    for key in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(errs[key]), key
    # the GAN reconstruction gradient must move the touched clusters
    assert not np.allclose(before, np.asarray(gmem.clusters))


def test_train_all_bip_dual_path():
    rng = np.random.RandomState(0)
    encoder = create_model("resnet_bip50", norm=True)
    enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((2, H, W, 3)),
                            train=True)
    gan = AEModel(GANConfig(model="AE", model_gen="AE"), gan_height=GH,
                  gan_width=GW, num_feats=32, ngf=8, num_blocks=1)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(4, 2048).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(encoder, gan, height=H, width=W,
                                            iters_per_epoch=4, num_instances=2)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))
    before = np.asarray(state.memory.features).copy()
    state, errs = trainer.run_epoch(
        state, 0, FakeLoader(_batch(rng)), mode="train_all_bip",
        train_iters=2, print_freq=100)
    for key in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(errs[key]), key
    assert not np.allclose(before, np.asarray(state.memory.features))
