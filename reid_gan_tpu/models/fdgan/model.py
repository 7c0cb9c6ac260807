"""FDGANModel — the 4-network adversarial engine as one jitted train step.

Parity: FD/fdgan/model.py —
- nets: net_E (Siamese encoder + verifier), net_G (CustomPoseGenerator),
  net_Di (Siamese identity D), net_Dp (pose PatchGAN) (model.py:39-49).
- staged freezing (model.py:72-85): stage 1 ('--stage 1', paper stage II):
  E fully eval, Di BN-fixed; stage 2 (paper stage III): E+Di BN-fixed but
  trainable. BN-fix maps to applying those nets with train=False while still
  taking gradients.
- optimization order (model.py:216-229): Di step, Dp step (both on detached
  fake), then G step against the UPDATED discriminators — reproduced by
  sequencing the three updates inside one jit program (the G loss recomputes
  the generator forward against the new D params; the reference reuses the
  same fake tensor, which is numerically identical since G/E params and RNG
  are unchanged).
- losses (model.py:159-214): smoothed GANLoss with 1/10001 random real/fake
  label flip for D; G = GAN_Di + GAN_Dp + λ_recon·L1 + λ_veri·CE +
  λ_sp·same-pose-L1.
- optimizers (model.py:100-117): Adam(0.5, 0.999) for G(+E in stage 2), SGD
  momentum 0.9 wd 1e-4 for Di/Dp; stage-1 lrs ×(0.1, 0.01, 1). LambdaLR
  linear decay 1 − max(0, e+2−niter)/(niter_decay+1) (networks.py:37-42).
  (The reference's stage-2 'lr_mult' group keys are never consumed by
  FD/train.py — all G-optimizer groups run at lr·0.1 — so we do the same.)
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...ops.pose import render_pose_peaks
from ...ops.transforms import (
    normalize,
    random_erasing,
    random_hflip,
    to_float,
)
from .losses import gan_loss_bce
from .networks import CustomPoseGenerator, NLayerDiscriminator
from ..embedding import EltwiseSubEmbed
from ..multi_branch import SiameseNet
from ..resnet import FDResNet


class FDGANState(NamedTuple):
    E: Any            # {params, batch_stats}
    G: Any
    Di: Any
    Dp: Any
    opt_G: Any
    opt_Di: Any
    opt_Dp: Any
    step: jnp.ndarray


def _siamese(num_classes, depth=50):
    nfeat = 2048 if depth >= 50 else 512
    return SiameseNet(
        base_model=FDResNet(depth=depth, cut_at_pooling=True),
        embed_model=EltwiseSubEmbed(nonlinearity="square", use_batch_norm=True,
                                    use_classifier=True, num_features=nfeat,
                                    num_classes=num_classes))


def lambda_rule(epoch, niter, niter_decay):
    return 1.0 - max(0, epoch + 2 - niter) / float(niter_decay + 1)


class FDGANModel:
    """Functional engine. Build, then drive with train_epoch/optimize_step."""

    def __init__(self, cfg, height=256, width=128, depth=50, smooth=None,
                 mesh=None):
        self.cfg = cfg
        self.mesh = mesh   # 1-D data mesh; the reference wraps all four nets
        # in nn.DataParallel (FD/fdgan/model.py:67-70) — here the state is
        # replicated and the pair batch sharded over the data axis.
        self.height, self.width = height, width
        self.stage = cfg.stage
        self.smooth = cfg.smooth_label if smooth is None else smooth
        self.noise_size = cfg.noise_size
        self.feat_dim = 2048 if depth >= 50 else 512

        self.net_E = _siamese(num_classes=2, depth=depth)
        self.net_Di = _siamese(num_classes=1, depth=depth)
        self.net_G = CustomPoseGenerator(
            pose_feature_nc=cfg.pose_feature_size, reid_feature_nc=self.feat_dim,
            noise_nc=cfg.noise_size, dropout=cfg.drop,
            fuse_mode=cfg.fuse_mode, connect_layers=cfg.connect_layers)
        self.net_Dp = NLayerDiscriminator(input_nc=3 + 18)

        lr = cfg.lr
        if self.stage == 1:
            g_lr, di_lr, dp_lr = lr * 0.1, lr * 0.01, lr
        else:
            g_lr, di_lr, dp_lr = lr * 0.1, lr, lr
        self.tx_G = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.5, b2=0.999)
        )(learning_rate=g_lr)
        sgd = lambda lr_: optax.chain(  # noqa: E731
            optax.add_decayed_weights(1e-4),
            optax.sgd(lr_, momentum=0.9))
        self.tx_Di = optax.inject_hyperparams(sgd)(lr_=di_lr)
        self.tx_Dp = optax.inject_hyperparams(sgd)(lr_=dp_lr)
        self._base_lrs = (g_lr, di_lr, dp_lr)
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))

    # ------------------------------------------------------------------ init
    def init_state(self, key):
        h, w = self.height, self.width
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jnp.zeros((2, h, w, 3))
        pose = jnp.zeros((2, h, w, 18))
        noise = jnp.zeros((2, self.noise_size))
        feat = jnp.zeros((2, self.feat_dim))
        E = self.net_E.init(k1, img, img, train=False)
        Di = self.net_Di.init(k2, img, img, train=False)
        G = self.net_G.init({"params": k3, "dropout": k3}, pose, feat, noise,
                            train=True)
        Dp = self.net_Dp.init(k4, jnp.concatenate([pose, img], -1), train=True)
        E, G, Di, Dp = self._bootstrap(E, G, Di, Dp)

        def g_params(E, G):
            return {"G": G["params"], **({"E": E["params"]} if self.stage == 2 else {})}

        state = FDGANState(
            E=E, G=G, Di=Di, Dp=Dp,
            opt_G=self.tx_G.init(g_params(E, G)),
            opt_Di=self.tx_Di.init(Di["params"]),
            opt_Dp=self.tx_Dp.init(Dp["params"]),
            step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ...parallel.mesh import replicate

            state = replicate(self.mesh, state)
        return state

    def _bootstrap(self, E, G, Di, Dp):
        """Stage bootstrap consuming the ``net*_pretrain`` config paths —
        this is what chains the three-stage FD-GAN recipe
        (FD/README.md:47-111) end to end.

        Parity: FD/fdgan/model.py:51-63 —
        - stage 1 (paper stage II): load the stage-I baseline checkpoint
          (``cli.fdgan_baseline`` output, a SiameseNet variables dict) into
          net_E; initialize net_Di from the SAME dict with the verifier
          classifier sliced to its positive row (torch
          ``classifier.weight[1]`` → flax Dense ``kernel[:, 1:2]``,
          ``bias[1:2]``), so Di starts as a copy of the trained verifier
          specialised to a 1-logit real/fake head. net_G/net_Dp keep their
          fresh init (reference re-runs init_weights on them, model.py:52-53).
        - stage 2 (paper stage III): load all four nets from the stage-1
          run's per-net files (model.py:60-63).
        """
        from ...utils.serialization import load_checkpoint

        cfg = self.cfg
        if self.stage == 1:
            if cfg.netE_pretrain:
                E = load_checkpoint(cfg.netE_pretrain, target=E)
                Di = self._di_from_e(E, Di)
        elif self.stage == 2:
            for name, path, tgt in (("E", cfg.netE_pretrain, E),
                                    ("G", cfg.netG_pretrain, G),
                                    ("Di", cfg.netDi_pretrain, Di),
                                    ("Dp", cfg.netDp_pretrain, Dp)):
                if path:
                    loaded = load_checkpoint(path, target=tgt)
                    if name == "E":
                        E = loaded
                    elif name == "G":
                        G = loaded
                    elif name == "Di":
                        Di = loaded
                    else:
                        Dp = loaded
        return E, G, Di, Dp

    @staticmethod
    def _di_from_e(E, Di):
        """net_Di ← net_E with the classifier positive-row slice
        (FD/fdgan/model.py:56-58). Both nets are SiameseNets with identical
        structure except the classifier Dense (2 logits vs 1): torch's
        ``weight[1]`` (out-row 1) is flax's ``kernel[:, 1:2]``."""
        from flax import serialization as flax_ser

        sd = jax.tree_util.tree_map(np.asarray, flax_ser.to_state_dict(E))
        cls = sd["params"]["embed_model"]["classifier"]
        sd["params"]["embed_model"]["classifier"] = {
            "kernel": cls["kernel"][:, 1:2], "bias": cls["bias"][1:2]}
        return flax_ser.from_state_dict(Di, sd)

    def set_epoch_lr(self, state, epoch):
        """LambdaLR linear decay, stepped per epoch (networks.py:37-42).
        FUNCTIONAL: returns a new state (survives restore/donation)."""
        mult = lambda_rule(epoch, self.cfg.niter, self.cfg.niter_decay)
        g, di, dp = self._base_lrs
        return state._replace(
            opt_G=state.opt_G._replace(hyperparams=dict(
                state.opt_G.hyperparams,
                learning_rate=jnp.asarray(g * mult))),
            opt_Di=state.opt_Di._replace(hyperparams=dict(
                state.opt_Di.hyperparams, lr_=jnp.asarray(di * mult))),
            opt_Dp=state.opt_Dp._replace(hyperparams=dict(
                state.opt_Dp.hyperparams, lr_=jnp.asarray(dp * mult))))

    # ----------------------------------------------------------- preprocess
    def _preprocess(self, key, batch1, batch2):
        """Device-side set_input (FD/fdgan/model.py:127-146) + the worker-side
        transforms of FD/reid/utils/data/preprocessor.py:63-98: origin gets
        the train aug (random-erase + flip + normalize), target gets the plain
        transform, posemaps are rendered from landmarks and flipped jointly
        with the target."""
        k_e1, k_e2, k_p1, k_p2, k_n = jax.random.split(key, 5)
        pose_aug = getattr(self.cfg, "pose_aug", "no")

        def origin_aug(k, img_u8):
            ke, kf = jax.random.split(k)
            x = to_float(img_u8)
            fill = jax.random.uniform(ke, (x.shape[0], 1, 1, 3))
            x = random_erasing(ke, x, p=0.5, sl=0.02, sh=0.2, r1=0.3, fill=fill)
            x, _ = random_hflip(kf, x)
            return normalize(x)

        def target_and_pose(k, img_u8, landmark, flip):
            t = normalize(to_float(img_u8))
            n = landmark.shape[0]
            # --pose-aug (FD/reid/utils/data/preprocessor.py:114-131):
            # 'erase' drops one random channel per sample; 'gauss' draws
            # σ ∈ {4,5,6} per sample
            if pose_aug == "erase":
                idx = jax.random.randint(k, (n,), 0, landmark.shape[1])
                pm = jax.vmap(lambda lm, i: render_pose_peaks(
                    lm, height=self.height, width=self.width, sigma=5.0,
                    erase_index=i))(landmark, idx)
            elif pose_aug == "gauss":
                sig = jax.random.randint(k, (n,), 4, 7).astype(jnp.float32)
                pm = jax.vmap(lambda lm, s: render_pose_peaks(
                    lm, height=self.height, width=self.width,
                    sigma=s))(landmark, sig)
            else:
                pm = jax.vmap(lambda lm: render_pose_peaks(
                    lm, height=self.height, width=self.width,
                    sigma=5.0))(landmark)
            pm = jnp.transpose(pm, (0, 2, 3, 1))           # (N,H,W,18)
            flip4 = flip[:, None, None, None]
            t = jnp.where(flip4, t[:, :, ::-1, :], t)
            pm = jnp.where(flip4, pm[:, :, ::-1, :], pm)
            return t, pm

        o1 = origin_aug(k_e1, batch1["img"])
        o2 = origin_aug(k_e2, batch2["img"])
        t1, pm1 = target_and_pose(k_p1, batch1["target"], batch1["landmark"],
                                  batch1["flip"])
        t2, pm2 = target_and_pose(k_p2, batch2["target"], batch2["landmark"],
                                  batch2["flip"])
        labels = (batch1["pid"] == batch2["pid"]).astype(jnp.int32)
        m4 = labels[:, None, None, None].astype(jnp.float32)
        pm2 = pm1 * m4 + pm2 * (1 - m4)                    # pose sharing
        t2 = t1 * m4 + t2 * (1 - m4)
        origin = jnp.concatenate([o1, o2])
        target = jnp.concatenate([t1, t2])
        posemap = jnp.concatenate([pm1, pm2])
        noise = jax.random.normal(k_n, (labels.shape[0], self.noise_size))
        noise = jnp.concatenate([noise, noise])
        return origin, target, posemap, labels, noise

    # ------------------------------------------------------------- the step
    def _make_step(self):
        cfg = self.cfg
        stage = self.stage
        smooth = self.smooth

        def fwd_G(params_GE, E_bs, G_bs, origin, posemap, noise, key):
            """E features + id_score + fake; G BN/dropout in train mode."""
            b = origin.shape[0]
            e_vars = {"params": params_GE.get("E", E_bs["params"]),
                      "batch_stats": E_bs["batch_stats"]}
            f1, f2, id_score = self.net_E.apply(e_vars, origin[: b // 2],
                                                origin[b // 2:], train=False)
            if stage == 1:
                f1, f2 = jax.lax.stop_gradient((f1, f2))
                id_score = jax.lax.stop_gradient(id_score)
            a_id = jnp.concatenate([f1, f2])
            fake, mut = self.net_G.apply(
                {"params": params_GE["G"], "batch_stats": G_bs["batch_stats"]},
                posemap, a_id, noise, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return fake, id_score, mut["batch_stats"]

        def step(state, batch1, batch2, key):
            keys = jax.random.split(key, 8)
            origin, target, posemap, labels, noise = self._preprocess(
                keys[0], batch1, batch2)
            b = origin.shape[0]

            def g_params_of(state):
                p = {"G": state.G["params"]}
                if stage == 2:
                    p["E"] = state.E["params"]
                return p

            # forward once for the D steps (fake detached)
            fake_d, _, _ = fwd_G(g_params_of(state), state.E, state.G,
                                 origin, posemap, noise, keys[1])
            fake_d = jax.lax.stop_gradient(fake_d)
            # random D label flips: 1/10001 when smooth, drawn INDEPENDENTLY
            # per discriminator (model.py:160/177 each call
            # random.choice(rand_list))
            flip_di = (jax.random.uniform(keys[2], ()) < (1.0 / 10001.0)) & smooth
            flip_dp = (jax.random.uniform(jax.random.fold_in(keys[2], 1), ())
                       < (1.0 / 10001.0)) & smooth

            # --- Di step (model.py:175-186); Di BN fixed → train=False
            def di_loss_fn(di_params):
                di_vars = {"params": di_params,
                           "batch_stats": state.Di["batch_stats"]}
                _, _, pred_real = self.net_Di.apply(di_vars, origin, target,
                                                    train=False)
                _, _, pred_fake = self.net_Di.apply(di_vars, origin, fake_d,
                                                    train=False)
                lr_ = gan_loss_bce(keys[3], pred_real, True, smooth)
                lf_ = gan_loss_bce(keys[4], pred_fake, False, smooth)
                lr_sw = gan_loss_bce(keys[3], pred_fake, True, smooth)
                lf_sw = gan_loss_bce(keys[4], pred_real, False, smooth)
                loss = jnp.where(flip_di, lr_sw + lf_sw, lr_ + lf_) * 0.5
                return loss

            loss_Di, di_grads = jax.value_and_grad(di_loss_fn)(state.Di["params"])
            di_updates, opt_Di = self.tx_Di.update(di_grads, state.opt_Di,
                                                   state.Di["params"])
            di_params = optax.apply_updates(state.Di["params"], di_updates)

            # --- Dp step (model.py:159-173); Dp full train mode. Channel
            # order is POSEMAP FIRST (model.py:160-161 torch.cat((posemap,
            # target/fake), dim=1)) — load-bearing for reference-checkpoint
            # interop.
            real_pose = jnp.concatenate([posemap, target], axis=-1)
            fake_pose = jnp.concatenate([posemap, fake_d], axis=-1)

            def dp_loss_fn(dp_params):
                dp_vars = {"params": dp_params,
                           "batch_stats": state.Dp["batch_stats"]}
                pred_real, mut = self.net_Dp.apply(dp_vars, real_pose,
                                                   train=True,
                                                   mutable=["batch_stats"])
                pred_fake, mut = self.net_Dp.apply(
                    {"params": dp_params, "batch_stats": mut["batch_stats"]},
                    fake_pose, train=True, mutable=["batch_stats"])
                lr_ = gan_loss_bce(keys[5], pred_real, True, smooth)
                lf_ = gan_loss_bce(keys[6], pred_fake, False, smooth)
                lr_sw = gan_loss_bce(keys[5], pred_fake, True, smooth)
                lf_sw = gan_loss_bce(keys[6], pred_real, False, smooth)
                loss = jnp.where(flip_dp, lr_sw + lf_sw, lr_ + lf_) * 0.5
                return loss, mut["batch_stats"]

            (loss_Dp, dp_bs), dp_grads = jax.value_and_grad(
                dp_loss_fn, has_aux=True)(state.Dp["params"])
            dp_updates, opt_Dp = self.tx_Dp.update(dp_grads, state.opt_Dp,
                                                   state.Dp["params"])
            dp_params = optax.apply_updates(state.Dp["params"], dp_updates)

            # --- G step against UPDATED discriminators (model.py:188-214)
            def g_loss_fn(params_GE):
                fake, id_score, g_bs = fwd_G(params_GE, state.E, state.G,
                                             origin, posemap, noise, keys[1])
                loss_v = optax.softmax_cross_entropy_with_integer_labels(
                    id_score, labels).mean()
                loss_r = jnp.abs(fake - target).mean()
                # same-pose L1 over positive pairs only: mean over the
                # selected elements (model.py:193-194)
                fake_1, fake_2 = fake[: b // 2], fake[b // 2:]
                mask_f = labels.astype(jnp.float32)[:, None, None, None]
                per_img_elems = fake_1.shape[1] * fake_1.shape[2] * fake_1.shape[3]
                num = jnp.sum(jnp.abs(fake_1 - fake_2) * mask_f)
                den = jnp.maximum(jnp.sum(mask_f) * per_img_elems, 1.0)
                loss_sp = num / den
                _, _, pred_fake_Di = self.net_Di.apply(
                    {"params": di_params, "batch_stats": state.Di["batch_stats"]},
                    origin, fake, train=False)
                # Dp stays in FULL train mode for the G forward too
                # (model.py:73-85 only BN-fixes E/Di; backward_G's
                # net_Dp(cat((posemap, fake))) is a train-mode forward whose
                # BN normalizes with batch stats and updates running stats a
                # third time this step)
                pred_fake_Dp, dp_mut = self.net_Dp.apply(
                    {"params": dp_params, "batch_stats": dp_bs},
                    jnp.concatenate([posemap, fake], -1), train=True,
                    mutable=["batch_stats"])
                loss_gan_di = gan_loss_bce(keys[7], pred_fake_Di, True, False)
                loss_gan_dp = gan_loss_bce(keys[7], pred_fake_Dp, True, False)
                loss_G = (loss_gan_di + loss_gan_dp +
                          loss_r * cfg.lambda_recon +
                          loss_v * cfg.lambda_veri +
                          loss_sp * cfg.lambda_sp)
                aux = {"G_v": loss_v, "G_r": loss_r, "G_sp": loss_sp,
                       "G_gan_Di": loss_gan_di, "G_gan_Dp": loss_gan_dp,
                       "g_bs": g_bs, "fake": fake,
                       "dp_bs": jax.lax.stop_gradient(dp_mut["batch_stats"])}
                return loss_G, aux

            (loss_G, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params_of(state))
            g_updates, opt_G = self.tx_G.update(g_grads, state.opt_G,
                                                g_params_of(state))
            new_g = optax.apply_updates(g_params_of(state), g_updates)

            new_state = FDGANState(
                E={"params": new_g.get("E", state.E["params"]),
                   "batch_stats": state.E["batch_stats"]},
                G={"params": new_g["G"], "batch_stats": aux["g_bs"]},
                Di={"params": di_params, "batch_stats": state.Di["batch_stats"]},
                Dp={"params": dp_params, "batch_stats": aux["dp_bs"]},
                opt_G=opt_G, opt_Di=opt_Di, opt_Dp=opt_Dp,
                step=state.step + 1)
            errors = {"G": loss_G, "D_i": loss_Di, "D_p": loss_Dp,
                      "G_v": aux["G_v"], "G_r": aux["G_r"], "G_sp": aux["G_sp"],
                      "G_gan_Di": aux["G_gan_Di"], "G_gan_Dp": aux["G_gan_Dp"]}
            return new_state, errors, aux["fake"]

        return step

    def optimize_step(self, state, batch1, batch2, key):
        """One adversarial iteration: Di → Dp → G (model.py:216-229)."""
        def to_host(b):
            return {"img": np.asarray(b["img"]),
                    "target": np.asarray(b["target"]),
                    "landmark": np.asarray(b["landmark"], np.float32),
                    "flip": np.asarray(b["flip"], bool),
                    "pid": np.asarray(b["pid"], np.int32)}

        b1, b2 = to_host(batch1), to_host(batch2)
        if self.mesh is not None:
            from ...parallel.mesh import shard_batch

            b1, b2 = shard_batch(self.mesh, (b1, b2))
        else:
            b1 = {k: jnp.asarray(v) for k, v in b1.items()}
            b2 = {k: jnp.asarray(v) for k, v in b2.items()}
        return self._step(state, b1, b2, key)
