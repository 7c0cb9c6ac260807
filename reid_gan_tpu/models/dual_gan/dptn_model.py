"""DPTNModel — dual-task pose transformer engine (parity:
CC/dual_gan/models/DPTN_model.py): source→source self-reconstruction +
source→target transfer branches, t_s_ratio-weighted L1(+VGG)+GAN losses
(:184-214), negative synthesis by flipping the batch (:146-155)."""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .external_function import VGGLoss, cal_gradient_penalty, gan_loss
from .networks import define_D, define_G


class DPTNState(NamedTuple):
    G: Any
    D: Any
    opt_G: Any
    opt_D: Any
    step: jnp.ndarray


class DPTNModel:
    def __init__(self, cfg, gan_height=128, gan_width=64, num_feats=256, ngf=64,
                 layers_g=3, num_blocks=3, dis_layers=3,
                 use_spect_g=False, use_spect_d=True, norm="batch",
                 vgg_params=None, reid_feat_dim=2048, dtype=None):
        self.cfg = cfg
        self.h, self.w = gan_height, gan_width
        self.gan_mode = cfg.gan_mode
        self.t_s_ratio = cfg.t_s_ratio
        self.dtype = dtype
        self.net_G = define_G("DPTN", image_nc=3, pose_nc=cfg.pose_channels,
                              ngf=ngf, img_f=num_feats, encoder_layer=layers_g,
                              norm=norm, activation="LeakyReLU",
                              use_spect=use_spect_g, output_nc=3,
                              num_blocks=num_blocks, dtype=dtype)
        self.net_D = define_D(input_nc=3, ndf=32, img_f=128, layers=dis_layers,
                              use_spect=use_spect_d, dtype=dtype)
        self.use_vgg = cfg.use_vgg
        self.vgg = VGGLoss(vgg_params) if cfg.use_vgg else None
        self.tx_G = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.5))(
                learning_rate=cfg.gan_lr)
        self.tx_D = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.5))(
                learning_rate=cfg.gan_lr * cfg.ratio_g2d)
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        img = jnp.zeros((2, self.h, self.w, 3))
        pose = jnp.zeros((2, self.h, self.w, self.cfg.pose_channels))
        G = self.net_G.init(k1, img, pose, pose, train=True)
        G = {"params": G["params"], "batch_stats": G.get("batch_stats", {})}
        D = self.net_D.init(k2, img, train=True)
        D = {"params": D["params"], "batch_stats": D.get("batch_stats", {})}
        return DPTNState(G=G, D=D, opt_G=self.tx_G.init(G["params"]),
                         opt_D=self.tx_D.init(D["params"]),
                         step=jnp.zeros((), jnp.int32))

    def synthesize(self, G, source, source_pose, target_pose, is_train=False,
                   train=False):
        """DPTN_model.py:139-144."""
        return self.net_G.apply(
            {"params": G["params"], "batch_stats": G["batch_stats"]},
            source, source_pose, target_pose, is_train=is_train, train=train)

    def synthesize_pair(self, G, source, source_pose, target_pose):
        """Negative synthesis: flipped sources rendered into this batch's
        target poses (DPTN_model.py:146-155)."""
        fake_n, _ = self.synthesize(G, source[::-1], source_pose[::-1],
                                    target_pose, is_train=False)
        return jax.lax.stop_gradient(fake_n)

    def _g_loss_basic(self, D, fake, target, use_d):
        cfg = self.cfg
        loss_app = jnp.abs(fake - target).mean() * cfg.lambda_rec
        loss_ad = 0.0
        if use_d:
            pred = self.net_D.apply(
                {"params": D["params"], "batch_stats": D["batch_stats"]},
                fake, train=False)
            la = gan_loss(pred, True, False, self.gan_mode)
            loss_ad = (la.mean() if la.ndim > 0 else la) * cfg.lambda_g
        loss_style = loss_content = 0.0
        if self.use_vgg:
            content, style = self.vgg(fake, target)
            loss_style = style * cfg.lambda_style
            loss_content = content * cfg.lambda_content
        return loss_app, loss_ad, loss_style, loss_content

    def _make_step(self):
        r = self.t_s_ratio

        def step(state, batch, key):
            src, ps = batch["Xs"], batch["Ps"]
            tgt, pt = batch["Xt"], batch["Pt"]

            def fwd(g_params, g_bs):
                (fake_t, fake_s), mut = self.net_G.apply(
                    {"params": g_params, "batch_stats": g_bs}, src, ps, pt,
                    is_train=True, train=True, mutable=["batch_stats"])
                return fake_t, fake_s, mut["batch_stats"]

            fake_t, fake_s, _ = fwd(state.G["params"], state.G["batch_stats"])

            # D step on target branch (DPTN_model.py:179-183)
            def d_loss_fn(d_params):
                fa = jax.lax.stop_gradient(fake_t)
                pr, bs1 = self.net_D.apply(
                    {"params": d_params, "batch_stats": state.D["batch_stats"]},
                    tgt, train=True, mutable=["batch_stats"])
                pf, bs2 = self.net_D.apply(
                    {"params": d_params, "batch_stats": bs1["batch_stats"]},
                    fa, train=True, mutable=["batch_stats"])
                loss = (gan_loss(pr, True, True, self.gan_mode) +
                        gan_loss(pf, False, True, self.gan_mode)) * 0.5
                if self.gan_mode == "wgangp":
                    def disc(x):
                        return self.net_D.apply(
                            {"params": d_params,
                             "batch_stats": state.D["batch_stats"]}, x,
                            train=False)
                    gp, _ = cal_gradient_penalty(disc, key, tgt, fa)
                    loss = loss + gp
                return loss, bs2["batch_stats"]

            (loss_D, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.D["params"])
            d_updates, opt_D = self.tx_D.update(d_grads, state.opt_D,
                                                state.D["params"])
            d_params = optax.apply_updates(state.D["params"], d_updates)
            D_new = {"params": d_params, "batch_stats": d_bs}

            # G step (DPTN_model.py:200-211)
            def g_loss_fn(g_params):
                ft, fs, g_bs = fwd(g_params, state.G["batch_stats"])
                at, adt, st, ct = self._g_loss_basic(D_new, ft, tgt, True)
                as_, _, ss, cs = self._g_loss_basic(D_new, fs, src, False)
                loss = (r * (at + st + ct) + (1 - r) * (as_ + ss + cs) + adt)
                return loss, (g_bs, ft)

            (loss_G, (g_bs, fake_out)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.G["params"])
            g_updates, opt_G = self.tx_G.update(g_grads, state.opt_G,
                                                state.G["params"])
            g_params = optax.apply_updates(state.G["params"], g_updates)

            new_state = DPTNState(G={"params": g_params, "batch_stats": g_bs},
                                  D=D_new, opt_G=opt_G, opt_D=opt_D,
                                  step=state.step + 1)
            return new_state, {"G": loss_G, "D": loss_D}, fake_out

        return step

    def optimize_parameters(self, state, batch, key):
        dev = {k: jnp.asarray(batch[k]) for k in ("Xs", "Ps", "Xt", "Pt")}
        return self._step(state, dev, key)
