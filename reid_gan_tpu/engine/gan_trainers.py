"""Joint GAN + re-ID trainers.

Parity:
- ClusterContrastWithGANTrainer.train — hard-mix synthetic negatives
  re-encoded in eval mode feeding the memory's extended logits
  (CC/clustercontrast/trainers.py:52-98)
- .train_all — joint backward of loss_cl(+conf weights) + loss_G with the
  interleaved D step (CC/clustercontrast/trainers_b.py:617-814, the intended
  full implementation per SURVEY.md C7)
- .train_reid — memory-only warmup (trainers_b.py:1087-1138)
- GANTrainer.train_gan — standalone GAN pretraining
  (CC/clustercontrast/trainers.py:273-335)

Each mode is one jitted program: augmentation → encoder → GAN synthesis →
D step → joint G+encoder update → memory bank update.
"""

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.cluster_memory import MemoryState, memory_loss, update_memory
from ..ops.pose import cords_to_map as _cords_to_map
from ..ops.transforms import diff_transform, gan_input_transform, reid_augment
from ..parallel.mesh import replicate, shard_batch
from ..utils import AverageMeter
from .trainers import make_optimizer


class JointState(NamedTuple):
    enc_params: Any
    enc_batch_stats: Any
    enc_opt: Any
    gan: Any                 # AEState
    memory: MemoryState
    step: jnp.ndarray


class ClusterContrastWithGANTrainer:
    def __init__(self, encoder, gan, height=256, width=128, temp=0.05,
                 momentum=0.2, use_hard=False, lr=3.5e-4, weight_decay=5e-4,
                 step_size=20, iters_per_epoch=400, num_instances=16,
                 cl_temp=0.05, mesh=None):
        self.encoder = encoder
        self.gan = gan                      # AEModel engine
        self.mesh = mesh                    # 1-D data mesh (DataParallel
        #   replacement: CC/dual_gan/models/base_function.py:93-102 wraps
        #   every net in nn.DataParallel; here state is replicated, the
        #   batch sharded, and XLA inserts the gradient psum)
        self.temp = temp
        self.momentum = momentum
        self.use_hard = use_hard
        self.group_size = num_instances
        self.cl_temp = cl_temp
        self.h, self.w = height, width
        self.tx = make_optimizer(lr, weight_decay, step_size, iters_per_epoch)
        self._steps = {}

    def init_state(self, enc_variables, gan_state, memory):
        state = JointState(
            enc_params=enc_variables["params"],
            enc_batch_stats=enc_variables["batch_stats"],
            enc_opt=self.tx.init(enc_variables["params"]),
            gan=gan_state, memory=memory,
            step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    def set_memory(self, state, memory):
        if self.mesh is not None:
            memory = replicate(self.mesh, memory)
        return state._replace(memory=memory)

    # ------------------------------------------------------------- enc fwd
    def _enc(self, params, batch_stats, x, train):
        out = self.encoder.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=train,
            mutable=["batch_stats"] if train else False,
            **({} if train else {"test_all": True}))
        if train:
            out, mut = out
            return out["feat"], out["gan_feat"], mut["batch_stats"]
        return out["feat"], out["gan_feat"], batch_stats

    # --------------------------------------------------------------- modes
    def _make_train_step(self):
        """'train' mode: GAN frozen, hard-mix synthesis extends the negatives
        (trainers.py:52-98)."""
        gan = self.gan
        group_size = self.group_size

        def step(state, batch, seed):
            k_aug, k_g = jax.random.split(jax.random.PRNGKey(seed))
            x = reid_augment(k_aug, batch["img"], height=self.h, width=self.w,
                             train=True)
            targets = batch["pid"]
            xs = gan_input_transform(batch["Xs"], self.gan.h, self.gan.w)

            def loss_fn(params):
                f_out, _, bs = self._enc(params, state.enc_batch_stats, x, True)
                # G runs in TRAIN mode: torch nets default to train and the
                # reference never switches the GAN to eval in the joint path
                # (trainers.py:52-98), so its BN normalizes with batch stats
                # and updates running stats on every synthesize_fc forward.
                fc_image, g_bs = gan.synthesize_fc(
                    state.gan.G, xs, jax.lax.stop_gradient(f_out), group_size,
                    train=True, mutable=True)
                # re-encode generated images in eval mode (trainers.py:66-70)
                f_ex, _, _ = self._enc(params, bs,
                                       diff_transform(fc_image, self.h, self.w),
                                       False)
                losses, _ = memory_loss(f_out, targets, state.memory,
                                        temp=self.temp,
                                        ex_f=jax.lax.stop_gradient(f_ex),
                                        group_size=group_size)
                return losses.mean(), (bs, f_out, g_bs)

            (loss, (bs, f_out, g_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.enc_params)
            updates, enc_opt = self.tx.update(grads, state.enc_opt,
                                              state.enc_params)
            params = optax.apply_updates(state.enc_params, updates)
            memory = update_memory(state.memory, f_out, targets,
                                   self.momentum, self.use_hard,
                                   group_size=self.group_size)
            gan_state = state.gan._replace(
                G={"params": state.gan.G["params"],
                   "batch_stats": jax.lax.stop_gradient(g_bs)})
            new = state._replace(enc_params=params, enc_batch_stats=bs,
                                 enc_opt=enc_opt, memory=memory,
                                 gan=gan_state, step=state.step + 1)
            return new, {"loss": loss}

        return step

    def _make_train_all_step(self):
        """'train_all' mode: joint (loss_cl·conf + loss_G) backward with the
        interleaved D step (trainers_b.py:617-814).

        Single-forward structure: the encoder and generator each run their
        forward ONCE, captured as `jax.vjp` linearizations; the D step trains
        on stop_gradient(fake) from that same forward, then the joint
        cotangents (dloss/df_out from the conf-weighted memory loss,
        dloss/dfake from loss_G vs the UPDATED D) are pulled back through the
        saved VJPs. Mathematically identical to re-running the forwards
        inside a value_and_grad (same linearization point, fake0 ≡
        stop_gradient(fake)) but ~25% cheaper per step — profiled on a v5e
        chip at batch 64: enc fwd 7.0 ms + G fwd 4.6 ms of duplicate work
        eliminated from a 40 ms step."""
        gan = self.gan

        def step(state, batch, seed, conf_mask):
            k_aug, k_d, k_g = jax.random.split(jax.random.PRNGKey(seed), 3)
            x = reid_augment(k_aug, batch["img"], height=self.h, width=self.w,
                             train=True)
            targets = batch["pid"]
            xs = gan_input_transform(batch["Xs"], self.gan.h, self.gan.w)
            if "keypoints" in batch:
                # render posemaps INSIDE the step: one jit dispatch per iter
                # and the rendering is sharded with the batch under a mesh
                pm = jax.vmap(lambda c, o: _cords_to_map(
                    c, o, gan.h, gan.w))(batch["keypoints"],
                                         batch["old_size"])
                ps = jnp.transpose(pm, (0, 2, 3, 1))
            else:
                ps = batch["Ps"]

            # --- the ONLY encoder forward (with VJP for the joint pullback)
            def enc_fn(enc_params):
                f_out, f_gan, bs = self._enc(enc_params,
                                             state.enc_batch_stats, x, True)
                return (f_out, f_gan), bs

            ((f_out, f_gan), enc_vjp, bs) = jax.vjp(
                enc_fn, state.enc_params, has_aux=True)
            f_gan0 = jax.lax.stop_gradient(f_gan)

            # --- the ONLY generator forward (conditioning detached,
            #     trainers_b.py:756: synthesize_p(f_out.detach())). G runs in
            #     TRAIN mode — torch modules default to train and the
            #     reference never calls .eval() on the GAN nets in the joint
            #     path (trainers_b.py:617-814), so BN normalizes with batch
            #     stats and its running stats update once per step; the
            #     updated stats ride out as vjp aux and land in the new state.
            def g_fn(g_params):
                G = {"params": g_params,
                     "batch_stats": state.gan.G["batch_stats"]}
                fake, g_bs = gan.synthesize_p(G, f_gan0, ps, train=True,
                                              mutable=True)
                return fake, g_bs

            fake, g_vjp, g_bs = jax.vjp(g_fn, state.gan.G["params"],
                                        has_aux=True)
            g_bs = jax.lax.stop_gradient(g_bs)
            fake0 = jax.lax.stop_gradient(fake)

            # --- joint G + encoder head FIRST (the reference computes
            #     get_loss_G and loss_cl BEFORE backward_D,
            #     trainers_b.py:704-760, with net_D frozen — so loss_G's
            #     value AND pullback use the PRE-update discriminator, whose
            #     train-mode spectral power iteration persists into the D
            #     step's stats; proven against a torch transcription at fp64
            #     by tests/test_joint_parity_oracle.py)
            def head_fn(f_out_in, fake_in):
                loss_G, d_bs0 = gan.get_loss_G_train(state.gan.D, fake_in, xs)
                losses_cl, _ = memory_loss(f_out_in, targets, state.memory,
                                           temp=self.temp)
                loss_cl = (losses_cl * conf_mask).mean()
                return loss_cl + loss_G, (loss_cl, loss_G, d_bs0)

            (loss, head_vjp, (loss_cl, loss_G, d_bs0)) = jax.vjp(
                head_fn, f_out, fake, has_aux=True)

            # --- D step (trainers_b.py:764-767) on detached fake, starting
            #     from the G-forward's persisted spectral u/sigma
            def d_loss_fn(d_params):
                return gan.d_loss(d_params, d_bs0, xs, fake0, k_d)

            (loss_D, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.gan.D["params"])
            d_updates, opt_D = gan.tx_D.update(d_grads, state.gan.opt_D,
                                               state.gan.D["params"])
            d_params = optax.apply_updates(state.gan.D["params"], d_updates)
            D_new = {"params": d_params, "batch_stats": d_bs}

            # --- joint cotangents (trainers_b.py:769-774 loss.backward())
            df_out, dfake = head_vjp(jnp.ones_like(loss))
            (enc_grads,) = enc_vjp((df_out, jnp.zeros_like(f_gan)))
            (g_grads,) = g_vjp(dfake)
            enc_updates, enc_opt = self.tx.update(enc_grads, state.enc_opt,
                                                  state.enc_params)
            enc_params = optax.apply_updates(state.enc_params, enc_updates)
            g_updates, opt_G = gan.tx_G.update(g_grads, state.gan.opt_G,
                                               state.gan.G["params"])
            g_params = optax.apply_updates(state.gan.G["params"], g_updates)

            # feed the parallel CM_gan bank with the pooled GAN conditioning
            # features (reference trainers.py:161-169 passes
            # gan_inputs=f_gan.detach(); cm.py:99-103 momentum-updates the
            # twin bank) — a no-op when the bank is empty
            memory = update_memory(state.memory, f_out, targets,
                                   self.momentum, self.use_hard,
                                   gan_x=jnp.mean(f_gan0, axis=(1, 2)),
                                   group_size=self.group_size)
            gan_state = state.gan._replace(
                G={"params": g_params, "batch_stats": g_bs},
                D=D_new, opt_G=opt_G, opt_D=opt_D, step=state.gan.step + 1)
            new = state._replace(enc_params=enc_params, enc_batch_stats=bs,
                                 enc_opt=enc_opt, gan=gan_state, memory=memory,
                                 step=state.step + 1)
            return new, {"loss": loss, "loss_cl": loss_cl, "G": loss_G,
                         "D": loss_D}

        return step

    def _make_train_reid_step(self):
        """'train_reid' warmup: memory loss only (trainers_b.py:1087-1138)."""

        def step(state, batch, seed):
            x = reid_augment(jax.random.PRNGKey(seed), batch["img"],
                             height=self.h, width=self.w, train=True)
            targets = batch["pid"]

            def loss_fn(params):
                f_out, _, bs = self._enc(params, state.enc_batch_stats, x, True)
                losses, _ = memory_loss(f_out, targets, state.memory,
                                        temp=self.temp)
                return losses.mean(), (bs, f_out)

            (loss, (bs, f_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.enc_params)
            updates, enc_opt = self.tx.update(grads, state.enc_opt,
                                              state.enc_params)
            params = optax.apply_updates(state.enc_params, updates)
            memory = update_memory(state.memory, f_out, targets,
                                   self.momentum, self.use_hard,
                                   group_size=self.group_size)
            new = state._replace(enc_params=params, enc_batch_stats=bs,
                                 enc_opt=enc_opt, memory=memory,
                                 step=state.step + 1)
            return new, {"loss": loss}

        return step

    def _make_train_all_with_memory_step(self):
        """'train_all_with_memoery' mode: TRAINABLE cluster memory
        (ClusterMemory_Gradient, cm.py:140-193) jointly refined by the GAN —
        images are synthesized from each sample's cluster centroid and the
        reconstruction gradient updates the centroids with per-row-normalized
        SGD. The reference path (trainers_b.py:976-1085) calls missing GAN
        methods and cannot run as shipped (SURVEY.md §2.3); this is the
        intended semantics built from its live pieces."""
        from ..ops.cluster_memory import (
            gradient_memory_loss,
            update_gradient_clusters,
        )

        gan = self.gan

        def step(state, gmem, batch, seed, cluster_lr):
            k_aug, k_d = jax.random.split(jax.random.PRNGKey(seed))
            x = reid_augment(k_aug, batch["img"], height=self.h, width=self.w,
                             train=True)
            targets = batch["pid"]
            xs = gan_input_transform(batch["Xs"], self.gan.h, self.gan.w)
            if "keypoints" in batch:
                # render posemaps INSIDE the step: one jit dispatch per iter
                # and the rendering is sharded with the batch under a mesh
                pm = jax.vmap(lambda c, o: _cords_to_map(
                    c, o, gan.h, gan.w))(batch["keypoints"],
                                         batch["old_size"])
                ps = jnp.transpose(pm, (0, 2, 3, 1))
            else:
                ps = batch["Ps"]
            h8, w8 = gan.h // 8, gan.w // 8

            def render_from_clusters(g_params, clusters):
                cf = clusters * jax.lax.rsqrt(
                    jnp.sum(clusters * clusters, -1, keepdims=True) + 1e-12)
                feats = cf[targets]
                fmap = jnp.broadcast_to(
                    feats[:, None, None, :],
                    (feats.shape[0], h8, w8, feats.shape[1]))
                G = {"params": g_params,
                     "batch_stats": state.gan.G["batch_stats"]}
                # train-mode BN (torch default; the joint path never evals
                # the GAN) — the single render per step, whose stats and
                # detached images feed both the joint loss and the D step
                return gan.synthesize_p(G, fmap, ps, train=True, mutable=True)

            # joint loss FIRST, against the PRE-update frozen D (reference
            # house pattern — get_loss_G precedes backward_D in every
            # trainers_b joint mode); the D step then trains on the detached
            # render from this same single G forward
            def joint_loss_fn(packed):
                enc_params, g_params, clusters = packed
                f_out, _, bs = self._enc(enc_params, state.enc_batch_stats,
                                         x, True)
                fake, g_bs = render_from_clusters(g_params, clusters)
                loss_G, d_bs0 = gan.get_loss_G_train(state.gan.D, fake, xs)
                loss_cl, _ = gradient_memory_loss(
                    f_out, targets, gmem._replace(clusters=clusters),
                    temp=self.temp)
                return loss_cl + loss_G, (bs, jax.lax.stop_gradient(g_bs),
                                          jax.lax.stop_gradient(fake),
                                          d_bs0, loss_cl, loss_G)

            (loss, (bs, g_bs, fake0, d_bs0, loss_cl, loss_G)), grads = \
                jax.value_and_grad(joint_loss_fn, has_aux=True)(
                    (state.enc_params, state.gan.G["params"], gmem.clusters))
            enc_grads, g_grads, cluster_grads = grads

            # D step on the detached render, starting from the G-forward's
            # persisted spectral u/sigma
            def d_loss_fn(d_params):
                return gan.d_loss(d_params, d_bs0, xs, fake0, k_d)

            (loss_D, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.gan.D["params"])
            d_updates, opt_D = gan.tx_D.update(d_grads, state.gan.opt_D,
                                               state.gan.D["params"])
            d_params = optax.apply_updates(state.gan.D["params"], d_updates)
            D_new = {"params": d_params, "batch_stats": d_bs}
            enc_updates, enc_opt = self.tx.update(enc_grads, state.enc_opt,
                                                  state.enc_params)
            enc_params = optax.apply_updates(state.enc_params, enc_updates)
            g_updates, opt_G = gan.tx_G.update(g_grads, state.gan.opt_G,
                                               state.gan.G["params"])
            g_params = optax.apply_updates(state.gan.G["params"], g_updates)
            # per-row-normalized SGD on the touched cluster rows
            # (cm.py update_clusters:184-193)
            touched = jnp.zeros(gmem.clusters.shape[0], bool).at[targets].set(True)
            gmem = update_gradient_clusters(gmem, cluster_grads, touched,
                                            cluster_lr=cluster_lr)

            gan_state = state.gan._replace(
                G={"params": g_params, "batch_stats": g_bs},
                D=D_new, opt_G=opt_G, opt_D=opt_D, step=state.gan.step + 1)
            new = state._replace(enc_params=enc_params, enc_batch_stats=bs,
                                 enc_opt=enc_opt, gan=gan_state,
                                 step=state.step + 1)
            return new, gmem, {"loss": loss, "loss_cl": loss_cl, "G": loss_G,
                               "D": loss_D}

        return step

    def _make_train_all_bip_step(self):
        """'train_all_bip' mode: bi-path encoder trained with the memory loss
        on BOTH unfused paths (encoder called with fuse=False,
        resnet_bip.py:90-130) plus the standard GAN step on the GAN inputs.
        The reference path (trainers_b.py:816-974) calls missing GAN methods;
        this is the intended semantics from its live pieces."""
        gan = self.gan

        def step(state, batch, seed):
            k_aug, k_d = jax.random.split(jax.random.PRNGKey(seed))
            x = reid_augment(k_aug, batch["img"], height=self.h, width=self.w,
                             train=True)
            targets = batch["pid"]
            xs = gan_input_transform(batch["Xs"], self.gan.h, self.gan.w)

            # joint loss FIRST, against the PRE-update frozen D (the
            # reference house pattern, trainers_b.py:861-929: get_loss_G
            # precedes backward_D; the D step then trains on the detached
            # fake from this same single G forward)
            def joint_loss_fn(packed):
                enc_params, g_params = packed
                out, mut = self.encoder.apply(
                    {"params": enc_params,
                     "batch_stats": state.enc_batch_stats},
                    x, train=True, fuse=False, mutable=["batch_stats"])
                f1, f2 = out["feat"], out["feat2"]
                l1, _ = memory_loss(f1, targets, state.memory, temp=self.temp)
                l2, _ = memory_loss(f2, targets, state.memory, temp=self.temp)
                loss_cl = 0.5 * (l1.mean() + l2.mean())
                G = {"params": g_params,
                     "batch_stats": state.gan.G["batch_stats"]}
                fake, g_bs = gan.apply_G(G, xs, train=True, mutable=True)
                loss_G, d_bs0 = gan.get_loss_G_train(state.gan.D, fake, xs)
                fused = f1 + f2
                return loss_cl + loss_G, (mut["batch_stats"],
                                          jax.lax.stop_gradient(g_bs),
                                          jax.lax.stop_gradient(fake),
                                          d_bs0, fused, loss_cl, loss_G)

            (loss, (bs, g_bs, fake0, d_bs0, fused, loss_cl, loss_G)), grads = \
                jax.value_and_grad(joint_loss_fn, has_aux=True)(
                    (state.enc_params, state.gan.G["params"]))
            enc_grads, g_grads = grads

            # D step on the detached fake, starting from the G-forward's
            # persisted spectral u/sigma
            def d_loss_fn(d_params):
                return gan.d_loss(d_params, d_bs0, xs, fake0, k_d)

            (loss_D, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.gan.D["params"])
            d_updates, opt_D = gan.tx_D.update(d_grads, state.gan.opt_D,
                                               state.gan.D["params"])
            d_params = optax.apply_updates(state.gan.D["params"], d_updates)
            D_new = {"params": d_params, "batch_stats": d_bs}
            enc_updates, enc_opt = self.tx.update(enc_grads, state.enc_opt,
                                                  state.enc_params)
            enc_params = optax.apply_updates(state.enc_params, enc_updates)
            g_updates, opt_G = gan.tx_G.update(g_grads, state.gan.opt_G,
                                               state.gan.G["params"])
            g_params = optax.apply_updates(state.gan.G["params"], g_updates)

            memory = update_memory(state.memory, fused, targets,
                                   self.momentum, self.use_hard,
                                   group_size=self.group_size)
            gan_state = state.gan._replace(
                G={"params": g_params, "batch_stats": g_bs},
                D=D_new, opt_G=opt_G, opt_D=opt_D, step=state.gan.step + 1)
            new = state._replace(enc_params=enc_params, enc_batch_stats=bs,
                                 enc_opt=enc_opt, gan=gan_state, memory=memory,
                                 step=state.step + 1)
            return new, {"loss": loss, "loss_cl": loss_cl, "G": loss_G,
                         "D": loss_D}

        return step

    def _get_step(self, mode):
        if mode not in self._steps:
            maker = {"train": self._make_train_step,
                     "train_all": self._make_train_all_step,
                     "train_reid": self._make_train_reid_step,
                     "train_all_bip": self._make_train_all_bip_step,
                     "train_all_with_memory": self._make_train_all_with_memory_step,
                     }[mode]
            # NOTE: the bip / learnable-memory steps run WITHOUT buffer
            # donation — donating state buffers that were produced by other
            # compiled programs (the clustering-phase extractor) trips an
            # INVALID_ARGUMENT runtime bug on the experimental axon TPU
            # backend (bisected: same program + same data pass undonated).
            donate = (0,) if mode in ("train", "train_all", "train_reid") else ()
            self._steps[mode] = jax.jit(maker(), donate_argnums=donate)
        return self._steps[mode]

    def run_epoch(self, state, epoch, data_loader, mode="train_all",
                  train_iters=400, print_freq=10, base_seed=0,
                  conf_weight=None, gmem=None, cluster_lr=0.1):
        """Drive one epoch in the given mode. ``conf_weight``: optional
        (N_dataset,) host array of per-sample confidence weights
        (trainers_b.py:719-722). ``gmem``: GradientMemoryState for
        'train_all_with_memory' (returned updated as a third value)."""
        step = self._get_step(mode)
        meters = {}
        batch_time, data_time = AverageMeter(), AverageMeter()
        errs_buf = []   # device scalars; fetched in one sync per print window
        end = window_start = time.time()
        if self.mesh is not None and gmem is not None:
            gmem = replicate(self.mesh, gmem)

        def drain(buf):
            if not buf:
                return
            stacked = np.asarray(jnp.stack(
                [jnp.stack(list(e.values())) for e in buf]))  # one sync
            names = list(buf[0].keys())
            for row in stacked:
                for k, v in zip(names, row):
                    meters.setdefault(k, AverageMeter()).update(float(v))
        for i in range(train_iters):
            batch = data_loader.next()
            data_time.update(time.time() - end)
            dev = {"img": np.asarray(batch["img"]),
                   "pid": np.asarray(batch["pid"], np.int32)}
            if "Xs" in batch:
                dev["Xs"] = np.asarray(batch["Xs"])
            render_pose = ("keypoints" in batch and
                           mode in ("train_all", "train_all_with_memory"))
            if render_pose:
                dev["keypoints"] = np.asarray(batch["keypoints"], np.float32)
                dev["old_size"] = np.asarray(batch["old_size"], np.float32)
            cm = None
            if mode == "train_all":
                if conf_weight is not None:
                    cm = np.asarray(conf_weight[np.asarray(batch["index"])],
                                    np.float32)
                else:
                    cm = np.ones(len(batch["pid"]), np.float32)
                dev["conf"] = cm
            if self.mesh is not None:
                dev = shard_batch(self.mesh, dev)
            else:
                dev = {k: jnp.asarray(v) for k, v in dev.items()}
            seed = np.int32((base_seed + epoch * train_iters + i)
                            & 0x7FFFFFFF)
            if mode == "train_all":
                cm = dev.pop("conf")
                state, errs = step(state, dev, seed, cm)
            elif mode == "train_all_with_memory":
                state, gmem, errs = step(state, gmem, dev, seed,
                                         jnp.asarray(cluster_lr, jnp.float32))
            else:
                state, errs = step(state, dev, seed)
            errs_buf.append(errs)
            end = time.time()
            if (i + 1) % print_freq == 0:
                drain(errs_buf)
                errs_buf = []
                now = time.time()
                batch_time.update((now - window_start) / print_freq,
                                  n=print_freq)
                window_start = end = now
                msg = "\t".join(f"{k} {m.val:.3f} ({m.avg:.3f})"
                                for k, m in meters.items())
                print(f"Epoch: [{epoch}][{i + 1}/{train_iters}]\t"
                      f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                      f"Data {data_time.val:.3f} ({data_time.avg:.3f})\t{msg}")
        drain(errs_buf)
        avg = {k: m.avg for k, m in meters.items()}
        if mode == "train_all_with_memory":
            return state, gmem, avg
        return state, avg


class GANTrainer:
    """Standalone GAN pretraining (trainers.py:273-335)."""

    def __init__(self, gan, print_freq=100, mesh=None):
        self.gan = gan
        self.print_freq = print_freq
        self.mesh = mesh

    def train_gan(self, gan_state, epoch, gan_loader, train_iters=400,
                  base_seed=0):
        meters = {}
        errs_buf = []

        def drain(buf):
            if not buf:
                return
            stacked = np.asarray(jnp.stack(
                [jnp.stack(list(e.values())) for e in buf]))  # one sync
            names = list(buf[0].keys())
            for row in stacked:
                for k, v in zip(names, row):
                    meters.setdefault(k, AverageMeter()).update(float(v))

        if self.mesh is not None:
            gan_state = replicate(self.mesh, gan_state)
        for i in range(train_iters):
            batch = gan_loader.next()
            dev = {"Xs": np.asarray(batch["Xs"])}
            if "Ps" in batch:
                dev["Ps"] = np.asarray(batch["Ps"])
            if self.mesh is not None:
                dev = shard_batch(self.mesh, dev)
            else:
                dev = {k: jnp.asarray(v) for k, v in dev.items()}
            # uint8 staging: the resize+normalize runs fused inside the
            # jitted GAN step (ae_model._make_step) — one device program
            # per iteration, like every other trainer
            key = jax.random.PRNGKey(base_seed + epoch * train_iters + i)
            gan_state, errs, _ = self.gan._step(gan_state, dev, key)
            errs_buf.append(errs)
            if (i + 1) % self.print_freq == 0:
                drain(errs_buf)
                errs_buf = []
                msg = "  ".join(f"{k}: {m.avg:.3f}" for k, m in meters.items())
                print(f"GAN Epoch: [{epoch}][{i + 1}/{train_iters}]  {msg}")
        drain(errs_buf)
        return gan_state, {k: m.avg for k, m in meters.items()}
