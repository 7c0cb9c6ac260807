"""One-step TRAIN parity oracles for the FD-GAN paths (VERDICT r4 next #5).

Proves the FD-GAN training dynamics against literal torch transcriptions of
the reference control flow, both sides in FLOAT64 with identical weights and
batches:

- stage I (``cli.fdgan_baseline``): one Siamese verification step — shared
  ResNet-50 base (train-mode BN) → EltwiseSubEmbed(square, BN, 2048→2) →
  CE → SGD(momentum 0.9, wd 5e-4) (FD/baseline.py:96-139,
  FD/reid/trainers.py:19-73).
- stage 2 (paper stage III, ``cli.fdgan_train``): one full Di → Dp → G
  adversarial iteration (FD/fdgan/model.py:149-229): E/Di BN-fixed but
  trainable, hard-label BCE (smooth off — the smooth path only changes the
  scalar the target tensor is filled with, losses.py:21-22), Dp train-mode
  BN through all three of its forwards, G loss vs the UPDATED
  discriminators, SGD for Di/Dp and a single Adam(0.5, 0.999) over G+E.

The jitted production step (FDGANModel._step) is driven directly with its
random preprocessing pinned to precomputed tensors (the reference preprocesses
in its DataLoader workers, FD/reid/utils/data/preprocessor.py:63-98).

Asserts: every reported loss equal to 1e-9; per-layer gradients of E, G, Di
and Dp allclose + cosine + norm-ratio; post-step G and Dp batch stats equal
(BN update ordering across forwards).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp
import optax

from test_joint_parity_oracle import _capture, _tree_allclose
from test_torch_interop import _TorchResNet50
from test_train_parity_oracle import _to64
from torch_gan_twins import TFDGen, TNLayerD

B = 8                 # pair batch: B/2 anchor pairs
H, W = 64, 32
NOISE = 56
PFEAT = 128
CN = 2                # connect_layers — exercises the U-Net skip concats
LAMBDA_RECON, LAMBDA_VERI, LAMBDA_SP = 100.0, 10.0, 10.0
LR = 1e-3


class _TorchFDSiamese(tnn.Module):
    """Torch twin of SiameseNet(FDResNet(cut_at_pooling), EltwiseSubEmbed):
    shared trunk, avg-pool, (f1-f2)^2 -> BN1d -> Linear."""

    def __init__(self, num_classes):
        super().__init__()
        self.trunk = _TorchResNet50(ibn=False, last_stride=2)
        self.embed_bn = tnn.BatchNorm1d(2048)
        self.embed_cls = tnn.Linear(2048, num_classes)

    def base(self, x):
        return self.trunk(x).mean(dim=(2, 3))

    def embed(self, f1, f2):
        return self.embed_cls(self.embed_bn((f1 - f2) ** 2))

    def forward(self, x1, x2):
        f1, f2 = self.base(x1), self.base(x2)
        return f1, f2, self.embed(f1, f2)


def _import_fd_siamese(sd, variables):
    """torch state-dict-shaped tree → SiameseNet variables (reuses the
    proven torchvision-layout resnet importer for the trunk)."""
    from reid_gan_tpu.models.resnet import import_torch_resnet

    trunk_sd = {k.replace("trunk.", "", 1): np.asarray(v)
                for k, v in sd.items() if k.startswith("trunk.")}
    base_p, base_s, unmatched = import_torch_resnet(
        trunk_sd, variables["params"]["base_model"],
        variables["batch_stats"]["base_model"])
    assert unmatched == [], unmatched[:5]
    p = dict(variables["params"])
    s = dict(variables["batch_stats"])
    p["base_model"], s["base_model"] = base_p, base_s
    em_p = {"bn": {"scale": np.asarray(sd["embed_bn.weight"]),
                   "bias": np.asarray(sd["embed_bn.bias"])},
            "classifier": {"kernel": np.asarray(sd["embed_cls.weight"]).T,
                           "bias": np.asarray(sd["embed_cls.bias"])}}
    em_s = dict(variables["batch_stats"].get("embed_model", {}))
    if "embed_bn.running_mean" in sd:
        em_s = {"bn": {"mean": np.asarray(sd["embed_bn.running_mean"]),
                       "var": np.asarray(sd["embed_bn.running_var"])}}
    p["embed_model"] = em_p
    s["embed_model"] = em_s
    return {"params": p, "batch_stats": s}


def _fd_gen(connect_layers=CN, drop=0.0):
    from reid_gan_tpu.models.fdgan.networks import CustomPoseGenerator

    return CustomPoseGenerator(pose_feature_nc=PFEAT, reid_feature_nc=2048,
                               noise_nc=NOISE, dropout=drop, fuse_mode="cat",
                               connect_layers=connect_layers)


def test_fd_generator_forward_matches_torch_twin():
    with jax.enable_x64(True):
        gen = _fd_gen()
        rng = np.random.RandomState(0)
        pose = rng.rand(2, H, W, 18)
        reid = rng.randn(2, 2048)
        noise = rng.randn(2, NOISE)
        v = _to64(gen.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.asarray(pose), jnp.asarray(reid),
                           jnp.asarray(noise), train=True))
        fake, _ = gen.apply(v, jnp.asarray(pose), jnp.asarray(reid),
                            jnp.asarray(noise), train=True,
                            mutable=["batch_stats"])

        twin = TFDGen(h=H, w=W, pose_feature_nc=PFEAT, reid_nc=2048,
                      noise_nc=NOISE, connect_layers=CN).double()
        twin.load_flax(jax.tree_util.tree_map(np.asarray, v))
        with torch.no_grad():
            tfk = twin(torch.from_numpy(pose.transpose(0, 3, 1, 2)),
                       torch.from_numpy(reid), torch.from_numpy(noise))
        np.testing.assert_allclose(np.asarray(fake),
                                   tfk.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-9, atol=1e-11)


def test_nlayer_discriminator_forward_matches_torch_twin():
    from reid_gan_tpu.models.fdgan.networks import NLayerDiscriminator

    with jax.enable_x64(True):
        d = NLayerDiscriminator(input_nc=21)
        rng = np.random.RandomState(1)
        x = rng.rand(2, H, W, 21) * 2 - 1
        v = _to64(d.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True))
        pred, bs = d.apply(v, jnp.asarray(x), train=True,
                           mutable=["batch_stats"])

        twin = TNLayerD(input_nc=21).double()
        twin.load_flax(jax.tree_util.tree_map(np.asarray, v))
        with torch.no_grad():
            tp = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)), train=True)
        np.testing.assert_allclose(np.asarray(pred),
                                   tp.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-9, atol=1e-11)
        _tree_allclose("Dp stats", bs["batch_stats"], twin.export_stats())


@pytest.mark.slow
def test_siamese_stage1_step_matches_torch_oracle(monkeypatch):
    """One stage-I verification step through the REAL jitted SiameseTrainer
    step (engine/fdgan.py) vs torch: train-mode BN through the shared trunk
    on both pair halves, CE, SGD(momentum, coupled wd)."""
    from reid_gan_tpu.engine import fdgan as fdgan_engine
    from reid_gan_tpu.engine.fdgan import SiameseTrainer
    from reid_gan_tpu.models.multi_branch import siamese_baseline

    MEAN = np.array([0.485, 0.456, 0.406])
    STD = np.array([0.229, 0.224, 0.225])
    rng = np.random.RandomState(3)
    img1 = rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8)
    img2 = rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8)
    targets = rng.randint(0, 2, B).astype(np.int32)

    monkeypatch.setattr(
        fdgan_engine, "fd_train_augment",
        lambda key, img: (img.astype(jnp.float64) / 255.0
                          - jnp.asarray(MEAN)) / jnp.asarray(STD))

    torch.manual_seed(1)
    tmodel = _TorchFDSiamese(num_classes=2).double()
    sd = {n: v.detach().numpy().copy()
          for n, v in tmodel.state_dict().items()}

    with jax.enable_x64(True):
        model = siamese_baseline(depth=50)
        v_tpl = _to64(model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((B, H, W, 3), jnp.float64),
                                 jnp.zeros((B, H, W, 3), jnp.float64),
                                 train=True))
        variables = _import_fd_siamese(sd, v_tpl)

        trainer = SiameseTrainer(model, lr=0.01, momentum=0.9,
                                 weight_decay=5e-4)
        trainer.tx = optax.chain(_capture(), trainer.tx)
        # numpy snapshot BEFORE the donating jitted step consumes the arrays
        variables_np = jax.tree_util.tree_map(np.asarray, variables)
        state = trainer.init_state(variables)
        new_state, loss, logits = trainer._step(
            state, jnp.asarray(img1), jnp.asarray(img2),
            jnp.asarray(targets), jax.random.PRNGKey(0))
        j_loss = float(loss)
        j_grads = jax.tree_util.tree_map(np.asarray,
                                         new_state.opt_state[0]["g"])
        j_logits = np.asarray(logits)

    tmodel.train()
    x1 = (torch.from_numpy(img1.transpose(0, 3, 1, 2)).double() / 255.0
          - torch.tensor(MEAN).view(1, 3, 1, 1)) \
        / torch.tensor(STD).view(1, 3, 1, 1)
    x2 = (torch.from_numpy(img2.transpose(0, 3, 1, 2)).double() / 255.0
          - torch.tensor(MEAN).view(1, 3, 1, 1)) \
        / torch.tensor(STD).view(1, 3, 1, 1)
    opt = torch.optim.SGD(tmodel.parameters(), lr=0.01, momentum=0.9,
                          weight_decay=5e-4)
    opt.zero_grad()
    _, _, t_logits = tmodel(x1, x2)
    t_loss = tF.cross_entropy(t_logits,
                              torch.from_numpy(targets.astype(np.int64)))
    t_loss.backward()
    t_grads = {n: p.grad.detach().numpy().copy()
               for n, p in tmodel.named_parameters() if p.grad is not None}
    opt.step()

    np.testing.assert_allclose(j_loss, float(t_loss.detach()), rtol=1e-9)
    np.testing.assert_allclose(j_logits, t_logits.detach().numpy(),
                               rtol=1e-8, atol=1e-11)
    with jax.enable_x64(True):
        zeros = {"params": jax.tree_util.tree_map(np.zeros_like,
                                                  variables_np["params"]),
                 "batch_stats": variables_np["batch_stats"]}
        g_tree = _import_fd_siamese(t_grads, zeros)["params"]
    n = _tree_allclose("stage-I grads", j_grads, g_tree,
                       rtol=1e-6, atol=5e-12)
    assert n >= 160


@pytest.mark.slow
def test_fdgan_stage2_step_matches_torch_oracle():
    """One full stage-2 (paper stage III) Di → Dp → G iteration through the
    REAL jitted FDGANModel._step vs the literal torch transcription."""
    from reid_gan_tpu.config import FDGANConfig
    from reid_gan_tpu.models.fdgan.model import FDGANModel, FDGANState

    rng = np.random.RandomState(5)
    half = B // 2
    origin = rng.randn(B, H, W, 3) * 0.5
    target = rng.randn(B, H, W, 3) * 0.5
    posemap = (rng.rand(B, H, W, 18) > 0.9).astype(np.float64)
    labels = np.asarray([1, 0, 1, 0], np.int32)[:half]
    noise_half = rng.randn(half, NOISE)
    noise = np.concatenate([noise_half, noise_half])

    cfg = FDGANConfig(stage=2, lr=LR, lambda_recon=LAMBDA_RECON,
                      lambda_veri=LAMBDA_VERI, lambda_sp=LAMBDA_SP,
                      smooth_label=False, drop=0.0, connect_layers=CN,
                      fuse_mode="cat", noise_size=NOISE,
                      pose_feature_size=PFEAT)

    torch.manual_seed(2)
    tE = _TorchFDSiamese(num_classes=2).double()
    tDi = _TorchFDSiamese(num_classes=1).double()
    sd_E = {n: v.detach().numpy().copy() for n, v in tE.state_dict().items()}
    sd_Di = {n: v.detach().numpy().copy()
             for n, v in tDi.state_dict().items()}

    with jax.enable_x64(True):
        model = FDGANModel(cfg, height=H, width=W, depth=50, smooth=False)
        model.tx_G = optax.chain(_capture(), model.tx_G)
        model.tx_Di = optax.chain(_capture(), model.tx_Di)
        model.tx_Dp = optax.chain(_capture(), model.tx_Dp)
        st0 = model.init_state(jax.random.PRNGKey(0))
        E = _import_fd_siamese(sd_E, _to64(st0.E))
        Di = _import_fd_siamese(sd_Di, _to64(st0.Di))
        G = _to64(st0.G)
        Dp = _to64(st0.Dp)
        g_params = {"G": G["params"], "E": E["params"]}
        state = FDGANState(
            E=E, G=G, Di=Di, Dp=Dp,
            opt_G=model.tx_G.init(g_params),
            opt_Di=model.tx_Di.init(Di["params"]),
            opt_Dp=model.tx_Dp.init(Dp["params"]),
            step=jnp.zeros((), jnp.int32))

        # twins + numpy snapshots BEFORE the (donating) jitted step
        twin_G = TFDGen(h=H, w=W, pose_feature_nc=PFEAT, reid_nc=2048,
                        noise_nc=NOISE, connect_layers=CN).double()
        twin_G.load_flax(jax.tree_util.tree_map(np.asarray, G))
        twin_Dp = TNLayerD(input_nc=21).double()
        twin_Dp.load_flax(jax.tree_util.tree_map(np.asarray, Dp))
        E_np = jax.tree_util.tree_map(np.asarray, E)
        Di_np = jax.tree_util.tree_map(np.asarray, Di)

        # pin the random preprocessing (the reference's lives in DataLoader
        # workers; the step's own RNG draws are unused with smooth=False and
        # drop=0)
        model._preprocess = lambda key, b1, b2: (
            jnp.asarray(origin), jnp.asarray(target), jnp.asarray(posemap),
            jnp.asarray(labels), jnp.asarray(noise))

        new_state, errors, _fake = model._step(state, {}, {},
                                               jax.random.PRNGKey(0))
        j = {k: float(v) for k, v in errors.items()}
        j_g_grads = jax.tree_util.tree_map(np.asarray,
                                           new_state.opt_G[0]["g"])
        j_di_grads = jax.tree_util.tree_map(np.asarray,
                                            new_state.opt_Di[0]["g"])
        j_dp_grads = jax.tree_util.tree_map(np.asarray,
                                            new_state.opt_Dp[0]["g"])
        j_g_bs = jax.tree_util.tree_map(np.asarray, new_state.G["batch_stats"])
        j_dp_bs = jax.tree_util.tree_map(np.asarray,
                                         new_state.Dp["batch_stats"])

    # ------------------------------------------------------------ torch side
    # E/Di BN-fixed (reset_model_status stage 2: train() + set_bn_fix) —
    # eval-mode BN everywhere in both, grads still flowing
    tE.eval()
    tDi.eval()
    o_t = torch.from_numpy(origin.transpose(0, 3, 1, 2))
    t_t = torch.from_numpy(target.transpose(0, 3, 1, 2))
    pm_t = torch.from_numpy(posemap.transpose(0, 3, 1, 2))
    z_t = torch.from_numpy(noise)
    y_t = torch.from_numpy(labels.astype(np.int64))

    opt_G = torch.optim.Adam(
        list(twin_G.parameters()) + list(tE.parameters()),
        lr=LR * 0.1, betas=(0.5, 0.999))
    opt_Di = torch.optim.SGD(tDi.parameters(), lr=LR, momentum=0.9,
                             weight_decay=1e-4)
    opt_Dp = torch.optim.SGD(twin_Dp.parameters(), lr=LR, momentum=0.9,
                             weight_decay=1e-4)

    # forward (model.py:149-157)
    f1, f2 = tE.base(o_t[:half]), tE.base(o_t[half:])
    id_score = tE.embed(f1, f2)
    a_id = torch.cat([f1, f2])
    fake = twin_G(pm_t, a_id, z_t)

    # Di step (model.py:175-186, 216-219)
    opt_Di.zero_grad()
    _, _, pred_real = tDi(o_t, t_t)
    _, _, pred_fake = tDi(o_t, fake.detach())
    t_Di = 0.5 * (tF.binary_cross_entropy_with_logits(
        pred_real, torch.ones_like(pred_real))
        + tF.binary_cross_entropy_with_logits(
            pred_fake, torch.zeros_like(pred_fake)))
    t_Di.backward()
    t_di_grads = {n: p.grad.detach().numpy().copy()
                  for n, p in tDi.named_parameters() if p.grad is not None}
    opt_Di.step()

    # Dp step (model.py:159-173, 221-223) — posemap-first channel order
    opt_Dp.zero_grad()
    pr = twin_Dp(torch.cat([pm_t, t_t], dim=1), train=True)
    pf = twin_Dp(torch.cat([pm_t, fake.detach()], dim=1), train=True)
    t_Dp = 0.5 * (tF.binary_cross_entropy_with_logits(
        pr, torch.ones_like(pr))
        + tF.binary_cross_entropy_with_logits(pf, torch.zeros_like(pf)))
    t_Dp.backward()
    # CLONE: the later t_G.backward() accumulates into Dp's .grad in place
    # (the reference never freezes Dp during backward_G; optimizer_G simply
    # doesn't step it)
    t_dp_grads = jax.tree_util.tree_map(lambda t: t.detach().clone(),
                                        twin_Dp.grads())
    opt_Dp.step()

    # G step vs the UPDATED discriminators (model.py:188-214, 225-228)
    opt_G.zero_grad()
    loss_v = tF.cross_entropy(id_score, y_t)
    loss_r = tF.l1_loss(fake, t_t)
    mask = torch.from_numpy(labels.astype(bool))
    fake_1, fake_2 = fake[:half], fake[half:]
    loss_sp = tF.l1_loss(fake_1[mask], fake_2[mask])
    _, _, pred_fake_Di = tDi(o_t, fake)
    pred_fake_Dp = twin_Dp(torch.cat([pm_t, fake], dim=1), train=True)
    gan_di = tF.binary_cross_entropy_with_logits(
        pred_fake_Di, torch.ones_like(pred_fake_Di))
    gan_dp = tF.binary_cross_entropy_with_logits(
        pred_fake_Dp, torch.ones_like(pred_fake_Dp))
    t_G = (gan_di + gan_dp + loss_r * LAMBDA_RECON + loss_v * LAMBDA_VERI
           + loss_sp * LAMBDA_SP)
    t_G.backward()
    t_g_grads = twin_G.grads()
    t_e_grads = {n: p.grad.detach().numpy().copy()
                 for n, p in tE.named_parameters() if p.grad is not None}
    opt_G.step()

    # ------------------------------------------------------------- asserts
    for name, want in (("G", t_G), ("D_i", t_Di), ("D_p", t_Dp),
                       ("G_v", loss_v), ("G_r", loss_r), ("G_sp", loss_sp),
                       ("G_gan_Di", gan_di), ("G_gan_Dp", gan_dp)):
        np.testing.assert_allclose(j[name], float(want.detach()), rtol=1e-9,
                                   err_msg=name)

    n = _tree_allclose("G grads", j_g_grads["G"], t_g_grads,
                       rtol=1e-7, atol=5e-12)
    assert n > 20
    n = _tree_allclose("Dp grads", j_dp_grads, t_dp_grads,
                       rtol=1e-7, atol=5e-12)
    assert n > 10

    with jax.enable_x64(True):
        zeros_di = {"params": jax.tree_util.tree_map(np.zeros_like,
                                                     Di_np["params"]),
                    "batch_stats": Di_np["batch_stats"]}
        di_tree = _import_fd_siamese(t_di_grads, zeros_di)["params"]
        zeros_e = {"params": jax.tree_util.tree_map(np.zeros_like,
                                                    E_np["params"]),
                   "batch_stats": E_np["batch_stats"]}
        e_tree = _import_fd_siamese(t_e_grads, zeros_e)["params"]
    n = _tree_allclose("Di grads", j_di_grads, di_tree,
                       rtol=1e-6, atol=5e-12)
    assert n >= 160
    n = _tree_allclose("E grads", j_g_grads["E"], e_tree,
                       rtol=1e-6, atol=5e-12)
    assert n >= 160

    _tree_allclose("post-step G batch stats", j_g_bs, twin_G.export_stats(),
                   rtol=1e-8, atol=1e-12)
    _tree_allclose("post-step Dp batch stats", j_dp_bs,
                   twin_Dp.export_stats(), rtol=1e-8, atol=1e-12)
