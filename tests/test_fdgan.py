"""FD-GAN tests: generator/discriminator shapes, GAN loss semantics, one full
adversarial optimize step, stage-I Siamese trainer, CascadeEvaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reid_gan_tpu.config import FDGANConfig
from reid_gan_tpu.models.fdgan.losses import gan_loss_bce
from reid_gan_tpu.models.fdgan.model import FDGANModel, lambda_rule
from reid_gan_tpu.models.fdgan.networks import (
    CustomPoseGenerator,
    NLayerDiscriminator,
)

H, W = 64, 32  # 1/4-scale shapes for CPU tests (256×128 in production)


def _gen(connect_layers=0, fuse_mode="cat"):
    return CustomPoseGenerator(pose_feature_nc=32, reid_feature_nc=128,
                               noise_nc=8, dropout=0.1, ngf=8,
                               fuse_mode=fuse_mode,
                               connect_layers=connect_layers)


@pytest.mark.parametrize("cn", [0, 2, 5])
def test_generator_shapes_and_range(cn):
    g = _gen(connect_layers=cn)
    pose = jnp.zeros((2, H, W, 18))
    feat = jnp.zeros((2, 128))
    z = jnp.zeros((2, 8))
    v = g.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               pose, feat, z, train=True)
    out = g.apply(v, pose, feat, z, train=False)
    assert out.shape == (2, H, W, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_generator_add_fusion():
    g = _gen(fuse_mode="add")
    pose = jnp.zeros((1, H, W, 18))
    v = g.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               pose, jnp.zeros((1, 128)), jnp.zeros((1, 8)), train=True)
    out = g.apply(v, pose, jnp.zeros((1, 128)), jnp.zeros((1, 8)), train=False)
    assert out.shape == (1, H, W, 3)


def test_discriminator_patch_output():
    d = NLayerDiscriminator(input_nc=21, ndf=8)
    x = jnp.zeros((2, H, W, 21))
    v = d.init(jax.random.PRNGKey(0), x, train=True)
    out = d.apply(v, x, train=False)
    # n_layers=3 → 3 stride-2 convs (conv0 + 2), then two k4/s1/p1 convs:
    # 64→32→16→8→7→6 (FD/fdgan/networks.py:204-231)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] == H // 8 - 2 and out.shape[2] == W // 8 - 2


def test_gan_loss_hard_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
    loss = gan_loss_bce(jax.random.PRNGKey(0), logits, True, smooth=False)
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    ref = -np.log(p + 1e-12).mean()
    assert abs(float(loss) - ref) < 1e-4


def test_gan_loss_smooth_targets_bounded():
    logits = jnp.zeros((1000,))
    # at logit 0, BCE = -t·log(.5) − (1−t)·log(.5) = log2 regardless of t
    loss = gan_loss_bce(jax.random.PRNGKey(0), logits, True, smooth=True)
    assert abs(float(loss) - np.log(2)) < 1e-5
    # smoothing must differ from hard targets for nonzero logits
    logits = jnp.ones((1000,)) * 2.0
    ls = gan_loss_bce(jax.random.PRNGKey(0), logits, True, smooth=True)
    lh = gan_loss_bce(jax.random.PRNGKey(0), logits, True, smooth=False)
    assert float(ls) > float(lh)


def test_lambda_rule_linear_decay():
    assert lambda_rule(0, 50, 50) == 1.0
    assert lambda_rule(48, 50, 50) == 1.0
    assert lambda_rule(49, 50, 50) < 1.0
    assert abs(lambda_rule(99, 50, 50) - (1.0 - 51 / 51.0)) < 1e-9


def _fake_pair_batch(rng, b=2):
    return {
        "img": rng.randint(0, 256, (b, H, W, 3), dtype=np.uint8),
        "target": rng.randint(0, 256, (b, H, W, 3), dtype=np.uint8),
        "landmark": rng.randint(0, 30, (b, 18, 2)).astype(np.float32),
        "flip": rng.rand(b) < 0.5,
        "pid": np.array([1, 2][:b]),
    }


@pytest.mark.parametrize("stage", [1, 2])
def test_fdgan_optimize_step(stage):
    cfg = FDGANConfig(stage=stage, pose_feature_size=32, noise_size=8,
                      lambda_recon=10.0, lambda_veri=1.0, lambda_sp=1.0)
    model = FDGANModel(cfg, height=H, width=W, depth=18)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b1, b2 = _fake_pair_batch(rng), _fake_pair_batch(rng)
    b2["pid"] = b1["pid"].copy()  # one positive pair at least
    g_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.G["params"])]
    e_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.E["params"])]
    state, errors, fake = model.optimize_step(state, b1, b2,
                                              jax.random.PRNGKey(1))
    for k, v in errors.items():
        assert np.isfinite(float(v)), k
    assert fake.shape == (4, H, W, 3)
    g_after = jax.tree_util.tree_leaves(state.G["params"])
    assert any(not np.allclose(a, b) for a, b in zip(g_before, g_after))
    e_after = jax.tree_util.tree_leaves(state.E["params"])
    e_changed = any(not np.allclose(a, b) for a, b in zip(e_before, e_after))
    # stage 1 freezes E; stage 2 trains it (FD/fdgan/model.py:72-85,100-117)
    assert e_changed == (stage == 2)


def test_fdgan_lr_decay_applied():
    cfg = FDGANConfig(stage=1, pose_feature_size=32, noise_size=8, niter=5,
                      niter_decay=5)
    model = FDGANModel(cfg, height=H, width=W, depth=18)
    state = model.init_state(jax.random.PRNGKey(0))
    state = model.set_epoch_lr(state, 8)
    mult = lambda_rule(8, 5, 5)
    assert abs(float(state.opt_Dp.hyperparams["lr_"]) - cfg.lr * mult) < 1e-9
