"""dual_gan tests: generator flavors, GAN loss modes, hard-mix, AE/DPTN
engines, PTM attention shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reid_gan_tpu.config import GANConfig
from reid_gan_tpu.models.dual_gan.ae_model import AEModel, hard_mix
from reid_gan_tpu.models.dual_gan.dptn_model import DPTNModel
from reid_gan_tpu.models.dual_gan.external_function import (
    VGGLoss,
    cal_gradient_penalty,
    gan_loss,
)
from reid_gan_tpu.models.dual_gan.models import create_model, get_option_setter
from reid_gan_tpu.models.dual_gan.networks import define_D, define_G
from reid_gan_tpu.models.dual_gan.ptm import PCTM, PTM

H, W = 32, 16


def test_gan_loss_lsgan_per_sample():
    pred = jnp.asarray(np.random.RandomState(0).randn(4, 3, 3, 1))
    g = gan_loss(pred, True, is_disc=False, gan_mode="lsgan")
    assert g.shape == pred.shape  # per-sample for conf weighting
    d = gan_loss(pred, True, is_disc=True, gan_mode="lsgan")
    assert d.shape == ()
    np.testing.assert_allclose(float(d), float(((pred - 1) ** 2).mean()),
                               rtol=1e-6)


def test_gan_loss_hinge_wgangp():
    pred = jnp.asarray([1.5, -0.5])
    # hinge D real: relu(1 - pred).mean()
    assert abs(float(gan_loss(pred, True, True, "hinge")) -
               np.mean(np.maximum(0, 1 - np.array([1.5, -0.5])))) < 1e-6
    # wgangp G: -pred.mean()
    assert abs(float(gan_loss(pred, True, False, "wgangp")) + 0.5) < 1e-6


def test_gradient_penalty_finite():
    d = define_D(ndf=8, img_f=32)
    x = jnp.zeros((2, H, W, 3))
    v = d.init(jax.random.PRNGKey(0), x, train=True)

    def disc(img):
        return d.apply(v, img, train=False)

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)
    fake = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)
    gp, grads = cal_gradient_penalty(disc, jax.random.PRNGKey(1), real, fake)
    assert np.isfinite(float(gp)) and float(gp) >= 0


def test_hard_mix_selection():
    """anchor = group mean; in_id = farthest in-group, out_id = nearest
    out-group (AE_model.py:274-292)."""
    f = np.zeros((4, 3), np.float32)
    f[0] = [1, 0, 0]
    f[1] = [0.9, 0.1, 0]      # group 0: close pair
    f[2] = [0, 1, 0]
    f[3] = [0.9, 0.05, 0]     # group 1: sample 3 is near group 0's anchor
    fs = np.arange(4, dtype=np.float32)[:, None] * np.ones((4, 5), np.float32)
    mixed = np.asarray(hard_mix(jnp.asarray(fs), jnp.asarray(f), group_size=2,
                                lambda_fus=0.8))
    assert mixed.shape == (2, 5)
    # group 0 anchor ~[1,0,0]: farthest in-group is idx 1 (sim lower than 0);
    # nearest out-group is idx 3
    np.testing.assert_allclose(mixed[0], 0.8 * fs[1] + 0.2 * fs[3], atol=1e-5)


def test_ptm_pctm_shapes():
    x = jnp.zeros((2, 4, 2, 16))
    ptm = PTM(d_model=16, nhead=2, num_CABs=1, num_TTBs=1, dim_feedforward=16)
    v = ptm.init(jax.random.PRNGKey(0), x, x, x, train=True)
    out, _ = ptm.apply(v, x, x, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    pctm = PCTM(d_model=16, nhead=2, num_CABs=1, num_TTBs=1, dim_feedforward=16)
    v = pctm.init(jax.random.PRNGKey(0), x, x, train=True)
    out, _ = pctm.apply(v, x, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape


def _ae_cfg(**kw):
    return GANConfig(model="AE", model_gen=kw.pop("model_gen", "AE"),
                     gan_mode=kw.pop("gan_mode", "lsgan"), **kw)


def test_ae_model_optimize_step():
    cfg = _ae_cfg()
    model = AEModel(cfg, gan_height=H, gan_width=W, num_feats=32, ngf=8, num_blocks=1)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {"Xs": rng.randint(0, 256, (2, H, W, 3), dtype=np.uint8)}
    # host copies: the step donates its input state buffers
    g_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.G["params"])]
    state, errs, fake = model.optimize_parameters(state, batch,
                                                  jax.random.PRNGKey(1))
    assert fake.shape == (2, H, W, 3)
    assert np.isfinite(float(errs["G"])) and np.isfinite(float(errs["D"]))
    g_after = jax.tree_util.tree_leaves(state.G["params"])
    assert any(not np.allclose(a, b) for a, b in zip(g_before, g_after))


def test_ae_model_synthesize_fc():
    cfg = _ae_cfg()
    model = AEModel(cfg, gan_height=H, gan_width=W, num_feats=32, ngf=8, num_blocks=1)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(4, H, W, 3), jnp.float32)
    reid_f = jnp.asarray(rng.randn(4, 64), jnp.float32)
    out = model.synthesize_fc(state.G, xs, reid_f, group_size=2)
    assert out.shape == (2, H, W, 3)


def test_pose_ae_model_synthesize_p():
    cfg = _ae_cfg(model_gen="Pose")
    model = AEModel(cfg, gan_height=H, gan_width=W, num_feats=32, ngf=8,
                    num_blocks=1, reid_feat_dim=2048)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, H // 8, W // 8, 2048), jnp.float32)
    pose = jnp.asarray(rng.rand(2, H, W, 18), jnp.float32)
    out = model.synthesize_p(state.G, feats, pose)
    assert out.shape == (2, H, W, 3)


def test_dptn_model_step():
    cfg = GANConfig(model="DPTN", gan_mode="lsgan")
    model = DPTNModel(cfg, gan_height=H, gan_width=W, num_feats=32, ngf=8,
                      num_blocks=1)
    state = model.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "Xs": jnp.asarray(rng.rand(2, H, W, 3) * 2 - 1, jnp.float32),
        "Ps": jnp.asarray(rng.rand(2, H, W, 18), jnp.float32),
        "Xt": jnp.asarray(rng.rand(2, H, W, 3) * 2 - 1, jnp.float32),
        "Pt": jnp.asarray(rng.rand(2, H, W, 18), jnp.float32),
    }
    state, errs, fake = model.optimize_parameters(state, batch,
                                                  jax.random.PRNGKey(1))
    assert fake.shape == (2, H, W, 3)
    assert np.isfinite(float(errs["G"]))
    # negative synthesis
    neg = model.synthesize_pair(state.G, batch["Xs"], batch["Ps"], batch["Pt"])
    assert neg.shape == (2, H, W, 3)


def test_model_factory_and_option_setter():
    cfg = GANConfig(model="AE")
    get_option_setter("AE")(cfg)
    assert cfg.lambda_rec == 2.0 and cfg.lambda_g == 5.0  # AE defaults
    from reid_gan_tpu.models.dual_gan.models import find_model_using_name

    with pytest.raises(KeyError):
        find_model_using_name("nope")
    model = create_model(cfg, gan_height=H, gan_width=W, num_feats=32, ngf=8,
                         num_blocks=1)
    assert isinstance(model, AEModel)


def test_vgg_loss_runs():
    vgg = VGGLoss()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    content, style = vgg(x, y)
    assert np.isfinite(float(content)) and np.isfinite(float(style))
    c0, s0 = vgg(x, x)
    assert float(c0) < 1e-6 and float(s0) < 1e-6
