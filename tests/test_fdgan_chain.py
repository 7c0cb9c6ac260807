"""FD-GAN three-stage chaining (parity: FD/fdgan/model.py:51-63 and the
recipe of FD/README.md:47-111): the stage-I baseline checkpoint boots
stage 1 (net_E load + Di-from-E classifier positive-row init), and the
stage-1 per-net saves boot stage 2."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def _save_baseline_ckpt(tmp_path, depth=18, h=64, w=32, seed=7):
    from reid_gan_tpu.models import siamese_baseline
    from reid_gan_tpu.utils.serialization import save_checkpoint

    model = siamese_baseline(depth=depth)
    dummy = jnp.zeros((2, h, w, 3))
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy, train=True)
    path = str(tmp_path / "baseline.msgpack")
    save_checkpoint(variables, fpath=path)
    return variables, path


def _small_cfg(**kw):
    from reid_gan_tpu.config import FDGANConfig

    return FDGANConfig(pose_feature_size=32, noise_size=8, **kw)


def test_stage1_bootstrap_di_from_e(tmp_path):
    """Stage-1 init loads netE_pretrain into E and builds Di from E with the
    classifier positive-row slice (FD/fdgan/model.py:51-58)."""
    from reid_gan_tpu.models.fdgan.model import FDGANModel

    variables, path = _save_baseline_ckpt(tmp_path)
    model = FDGANModel(_small_cfg(stage=1, netE_pretrain=path),
                       height=64, width=32, depth=18)
    state = model.init_state(jax.random.PRNGKey(0))

    # net_E equals the baseline checkpoint bitwise
    assert _leaves_equal(state.E["params"], variables["params"])
    assert _leaves_equal(state.E["batch_stats"], variables["batch_stats"])
    # net_Di shares E's base model + embed BN...
    assert _leaves_equal(state.Di["params"]["base_model"],
                         variables["params"]["base_model"])
    assert _leaves_equal(state.Di["params"]["embed_model"]["bn"],
                         variables["params"]["embed_model"]["bn"])
    # ...and its 1-logit head is the positive row of E's verifier
    e_cls = variables["params"]["embed_model"]["classifier"]
    di_cls = state.Di["params"]["embed_model"]["classifier"]
    np.testing.assert_array_equal(np.asarray(di_cls["kernel"]),
                                  np.asarray(e_cls["kernel"])[:, 1:2])
    np.testing.assert_array_equal(np.asarray(di_cls["bias"]),
                                  np.asarray(e_cls["bias"])[1:2])


def test_stage2_bootstrap_loads_all_four(tmp_path):
    """Stage-2 init loads all four nets from per-net files
    (FD/fdgan/model.py:60-63)."""
    from reid_gan_tpu.models.fdgan.model import FDGANModel
    from reid_gan_tpu.utils.serialization import save_networks

    donor = FDGANModel(_small_cfg(stage=1), height=64, width=32, depth=18)
    donor_state = donor.init_state(jax.random.PRNGKey(3))
    save_networks({"E": donor_state.E, "G": donor_state.G,
                   "Di": donor_state.Di, "Dp": donor_state.Dp},
                  str(tmp_path / "nets"), "latest")

    p = lambda n: str(tmp_path / "nets" / f"latest_net_{n}.msgpack")  # noqa
    model = FDGANModel(
        _small_cfg(stage=2, netE_pretrain=p("E"), netG_pretrain=p("G"),
                   netDi_pretrain=p("Di"), netDp_pretrain=p("Dp")),
        height=64, width=32, depth=18)
    state = model.init_state(jax.random.PRNGKey(99))  # different key: must
    for net in ("E", "G", "Di", "Dp"):                # come from the files
        assert _leaves_equal(getattr(state, net), getattr(donor_state, net))


@pytest.mark.slow
def test_three_stage_chain_e2e(tmp_path):
    """baseline CLI → fdgan_train --stage 1 → fdgan_train --stage 2, each
    consuming the previous stage's checkpoints; stage-1 training must leave
    net_E bitwise at the baseline weights (E is frozen in stage 1)."""
    from reid_gan_tpu.cli.fdgan_baseline import main as baseline_main
    from reid_gan_tpu.cli.fdgan_train import main as train_main
    from reid_gan_tpu.utils.serialization import load_checkpoint

    common = ["--dataset", "synthetic", "--data-dir", str(tmp_path),
              "--height", "64", "--width", "32", "--workers", "2", "--debug"]
    baseline_main(common + [
        "--batch-size", "8", "--lr", "0.01", "--eval-step", "1",
        "--logs-dir", str(tmp_path / "logs_b"),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    ckpt = tmp_path / "logs_b" / "checkpoint.msgpack"
    assert ckpt.exists()

    stage1 = train_main(common + [
        "--batch-size", "4", "--stage", "1",
        "--pose-feature-size", "32", "--noise-size", "8",
        "--netE-pretrain", str(ckpt),
        "--save-step", "1",
        "--logs-dir", str(tmp_path / "logs_s1"),
        "--save-dir", str(tmp_path / "ckpt_s1"),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    baseline_vars = load_checkpoint(str(ckpt))
    assert _leaves_equal(stage1.E["params"], baseline_vars["params"])

    s1dir = tmp_path / "ckpt_s1" / "experiment"
    stage2 = train_main(common + [
        "--batch-size", "4", "--stage", "2",
        "--pose-feature-size", "32", "--noise-size", "8",
        "--netE-pretrain", str(s1dir / "latest_net_E.msgpack"),
        "--netG-pretrain", str(s1dir / "latest_net_G.msgpack"),
        "--netDi-pretrain", str(s1dir / "latest_net_Di.msgpack"),
        "--netDp-pretrain", str(s1dir / "latest_net_Dp.msgpack"),
        "--save-step", "1",
        "--logs-dir", str(tmp_path / "logs_s2"),
        "--save-dir", str(tmp_path / "ckpt_s2"),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    assert stage2 is not None
    for net in ("E", "G", "Di", "Dp"):
        assert (tmp_path / "ckpt_s2" / "experiment" /
                f"latest_net_{net}.msgpack").exists()
