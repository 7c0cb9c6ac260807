"""Joint GAN+reID trainer tests: all three modes step correctly, the GAN
pretrainer runs, and the joint CLI completes a debug epoch end-to-end."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reid_gan_tpu.config import GANConfig
from reid_gan_tpu.engine.gan_trainers import (
    ClusterContrastWithGANTrainer,
    GANTrainer,
)
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.models.dual_gan.ae_model import AEModel
from reid_gan_tpu.ops.cluster_memory import init_memory

pytestmark = pytest.mark.slow   # multi-minute jit traces on 1-CPU hosts

H, W = 32, 16        # reid input
GH, GW = 16, 8       # gan input


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches
        self.i = 0

    def next(self):
        b = self.batches[self.i % len(self.batches)]
        self.i += 1
        return b


def _setup(model_gen="AE", k=4, b=8, group=2):
    rng = np.random.RandomState(0)
    encoder = create_model("resnet18", norm=True)
    x = jnp.zeros((b, H, W, 3))
    enc_vars = encoder.init(jax.random.PRNGKey(0), x, train=True)
    cfg = GANConfig(model="AE", model_gen=model_gen)
    gan = AEModel(cfg, gan_height=GH, gan_width=GW, num_feats=32, ngf=8,
                  num_blocks=1, reid_feat_dim=512)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(k, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    memory = init_memory(centers)
    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=H, width=W, iters_per_epoch=4,
        num_instances=group)
    state = trainer.init_state(enc_vars, gan_state, memory)
    # P×K-structured pids so hard_mix groups are single-id
    pids = np.repeat(rng.randint(0, k, b // group), group)
    batch = {"img": rng.randint(0, 256, (b, H, W, 3), dtype=np.uint8),
             "pid": pids,
             "Xs": rng.randint(0, 256, (b, GH, GW, 3), dtype=np.uint8),
             "keypoints": rng.randint(0, 16, (b, 18, 2)).astype(np.float32),
             "old_size": np.full((b, 2), 16.0, np.float32),
             "index": np.arange(b)}
    return trainer, state, batch


def test_train_reid_mode():
    trainer, state, batch = _setup()
    loader = FakeLoader([batch])
    state, errs = trainer.run_epoch(state, 0, loader, mode="train_reid",
                                    train_iters=2, print_freq=100)
    assert np.isfinite(errs["loss"])


def test_train_mode_hard_mix_negatives():
    trainer, state, batch = _setup(model_gen="AE")
    loader = FakeLoader([batch])
    before = np.asarray(state.memory.features).copy()
    state, errs = trainer.run_epoch(state, 0, loader, mode="train",
                                    train_iters=2, print_freq=100)
    assert np.isfinite(errs["loss"])
    assert not np.allclose(before, np.asarray(state.memory.features))


def test_train_all_mode_joint():
    trainer, state, batch = _setup(model_gen="Pose")
    loader = FakeLoader([batch])
    g_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.gan.G["params"])]
    e_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.enc_params)]
    state, errs = trainer.run_epoch(state, 0, loader, mode="train_all",
                                    train_iters=2, print_freq=100)
    for key in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(errs[key]), key
    g_after = jax.tree_util.tree_leaves(state.gan.G["params"])
    e_after = jax.tree_util.tree_leaves(state.enc_params)
    assert any(not np.allclose(a, b) for a, b in zip(g_before, g_after))
    assert any(not np.allclose(a, b) for a, b in zip(e_before, e_after))


def test_train_all_conf_weight_masks_loss():
    trainer, state, batch = _setup(model_gen="Pose")
    loader = FakeLoader([batch])
    conf = np.zeros(len(batch["pid"]), np.float32)  # all masked → loss_cl = 0
    state, errs = trainer.run_epoch(state, 0, loader, mode="train_all",
                                    train_iters=1, print_freq=100,
                                    conf_weight=conf)
    assert abs(errs["loss_cl"]) < 1e-6


def test_gan_pretrainer():
    cfg = GANConfig(model="AE", model_gen="AE")
    gan = AEModel(cfg, gan_height=GH, gan_width=GW, num_feats=32, ngf=8, num_blocks=1)
    gan_state = gan.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    loader = FakeLoader([{"Xs": rng.randint(0, 256, (2, GH, GW, 3),
                                            dtype=np.uint8)}])
    t = GANTrainer(gan)
    gan_state, errs = t.train_gan(gan_state, 0, loader, train_iters=2)
    assert np.isfinite(errs["G"]) and np.isfinite(errs["D"])


def test_joint_cli_debug_epoch(tmp_path):
    from reid_gan_tpu.cli.train_gan_usl import main

    best = main([
        "--dataset", "synthetic", "--data-dir", str(tmp_path),
        "--arch", "resnet18", "--height", "64", "--width", "32",
        "--gan-height", "32", "--gan-width", "16",
        "--batch-size", "8", "--num-instances", "4",
        "--eps", "0.7", "--k1", "8", "--k2", "3",
        "--cluster-backend", "dbscan",
        "--model", "AE", "--model-gen", "Pose",
        "--workers", "2", "--eval-step", "1",
        "--debug", "--logs-dir", str(tmp_path / "logs"),
        "--save-dir", str(tmp_path / "ckpt"),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    assert 0.0 <= best <= 1.0
    assert (tmp_path / "ckpt" / "experiment" / "latest_net_G.msgpack").exists()


def test_train_all_vjp_equals_double_forward():
    """The single-forward jax.vjp restructure of train_all (r3) must produce
    the SAME updated encoder/G/D parameters as the original double-forward
    formulation (no-grad enc+G forward for the D step, then a
    value_and_grad over a joint loss that re-runs both forwards —
    trainers_b.py:617-814 structure). Same linearization point =>
    identical gradients up to float reassociation."""
    import optax

    from reid_gan_tpu.engine.gan_trainers import (
        _cords_to_map,
        gan_input_transform,
        memory_loss,
        reid_augment,
    )

    trainer, state, batch = _setup(model_gen="Pose")
    gan = trainer.gan
    seed, conf_mask = 7, jnp.ones(batch["img"].shape[0], jnp.float32)

    # --- reference: the old double-forward step (same RNG derivation) ---
    def old_step(state):
        k_aug, k_d, k_g = jax.random.split(jax.random.PRNGKey(seed), 3)
        x = reid_augment(k_aug, batch["img"], height=trainer.h,
                         width=trainer.w, train=True)
        targets = batch["pid"]
        xs = gan_input_transform(batch["Xs"], gan.h, gan.w)
        pm = jax.vmap(lambda c, o: _cords_to_map(c, o, gan.h, gan.w))(
            batch["keypoints"], batch["old_size"])
        ps = jnp.transpose(pm, (0, 2, 3, 1))

        _, f_gan0, _ = trainer._enc(state.enc_params, state.enc_batch_stats,
                                    x, True)
        f_gan0 = jax.lax.stop_gradient(f_gan0)
        fake0 = jax.lax.stop_gradient(gan.synthesize_p(
            state.gan.G, f_gan0, ps, train=True, mutable=True)[0])

        # joint loss against the PRE-update frozen D (the r5 reference-order
        # semantics: get_loss_G precedes backward_D, trainers_b.py:704-767)
        def joint_loss_fn(packed):
            enc_params, g_params = packed
            f_out, f_gan, bs = trainer._enc(enc_params, state.enc_batch_stats,
                                            x, True)
            G = {"params": g_params,
                 "batch_stats": state.gan.G["batch_stats"]}
            fake, _ = gan.synthesize_p(G, jax.lax.stop_gradient(f_gan), ps,
                                       train=True, mutable=True)
            loss_G, d_bs0 = gan.get_loss_G_train(state.gan.D, fake, xs)
            losses_cl, _ = memory_loss(f_out, targets, state.memory,
                                       temp=trainer.temp)
            loss_cl = (losses_cl * conf_mask).mean()
            return loss_cl + loss_G, d_bs0

        (_, d_bs0), (enc_grads, g_grads) = jax.value_and_grad(
            joint_loss_fn, has_aux=True)(
                (state.enc_params, state.gan.G["params"]))

        # D step on the detached fake, from the G-forward's persisted stats
        def d_loss_fn(d_params):
            return gan.d_loss(d_params, d_bs0, xs, fake0, k_d)

        (loss_D, d_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.gan.D["params"])
        d_updates, opt_D = gan.tx_D.update(d_grads, state.gan.opt_D,
                                           state.gan.D["params"])
        d_params = optax.apply_updates(state.gan.D["params"], d_updates)

        enc_updates, _ = trainer.tx.update(enc_grads, state.enc_opt,
                                           state.enc_params)
        enc_params = optax.apply_updates(state.enc_params, enc_updates)
        g_updates, _ = gan.tx_G.update(g_grads, state.gan.opt_G,
                                       state.gan.G["params"])
        g_params = optax.apply_updates(state.gan.G["params"], g_updates)
        return (enc_params, g_params, d_params,
                enc_grads, g_grads, d_grads)

    (ref_enc, ref_g, ref_d,
     ref_enc_g, ref_g_g, ref_d_g) = jax.jit(old_step)(state)

    new_state, _ = jax.jit(trainer._make_train_all_step())(
        state, {k: jnp.asarray(v) for k, v in batch.items()}, seed, conf_mask)

    # Under train-mode BN (reference semantics), params feeding straight
    # into a BatchNorm (conv biases etc.) have MATHEMATICALLY zero gradient
    # (BN subtracts the batch mean), so their computed grads are pure float
    # noise and Adam's step-1 g/|g| turns that noise into ±lr sign flips
    # that legitimately differ between the two compiled programs. Compare
    # only elements whose reference gradient is genuinely nonzero.
    for name, got, want, ref_grad in (
            ("enc", new_state.enc_params, ref_enc, ref_enc_g),
            ("G", new_state.gan.G["params"], ref_g, ref_g_g),
            ("D", new_state.gan.D["params"], ref_d, ref_d_g)):
        flat_got = jax.tree_util.tree_leaves(got)
        flat_want = jax.tree_util.tree_leaves(want)
        flat_grad = jax.tree_util.tree_leaves(ref_grad)
        assert len(flat_got) == len(flat_want) == len(flat_grad)
        compared = 0
        for a, b, g in zip(flat_got, flat_want, flat_grad):
            a, b, g = np.asarray(a), np.asarray(b), np.asarray(g)
            mask = np.abs(g) > 1e-5
            compared += int(mask.sum())
            np.testing.assert_allclose(a[mask], b[mask],
                                       atol=5e-5, rtol=1e-4,
                                       err_msg=f"{name} params diverge")
        assert compared > 0, f"{name}: no live-gradient elements compared"
