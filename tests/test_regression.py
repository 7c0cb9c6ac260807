"""Regression benchmark that can FAIL (VERDICT r1 item 4).

The plain-synthetic validations saturate at mAP 1.0, so broken learning
dynamics (momentum, use_hard, conf-weights) were invisible. These tests run
the REAL pipeline on ``synthetic_hard`` — overlapping appearance clusters,
strong camera nuisance, imbalanced cameras — where first-epoch pseudo-labels
are imperfect and the mAP trajectory must climb (reference trajectory shape:
53.8→76.9→85.5→87.0, CC/examples/logs/log.txt:469-2289), plus direct
sensitivity checks that each memory knob observably reaches the compute.

The full-scale (N≈13k) variant with the Jaccard-vs-23s timing assert runs on
TPU hardware: scripts/validate_hard_synthetic.py.
"""

import os.path as osp
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # multi-minute jit traces on 1-CPU hosts


def _epoch_maps(log_path):
    """Per-epoch eval mAPs from the training log."""
    txt = open(log_path).read()
    return [float(v) / 100.0
            for v in re.findall(r"model mAP: *([\d.]+)%", txt)]


@pytest.fixture(scope="module")
def hard_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("hard"))


def test_usl_trajectory_on_hard_synthetic(hard_root):
    """4 USL epochs on synthetic_hard must (a) start imperfect — the problem
    actually discriminates — and (b) climb like the reference trajectory
    (53.8→87.0 shape). Catastrophic dynamics breakage (mis-wired
    pseudo-labels, dead memory loss, broken optimizer/extraction) leaves mAP
    near the untrained level and fails (b). Measured healthy run:
    29.6→48.1→47.7→49.9; per-knob sensitivity (momentum/use_hard/conf) is
    asserted by the dedicated wiring tests below — per-epoch re-clustering
    partially rescues a broken bank, so a trajectory alone cannot
    discriminate those knobs."""
    from reid_gan_tpu.cli.train_usl import main

    logs = osp.join(hard_root, "logs_traj")
    best = main([
        "--dataset", "synthetic_hard", "--data-dir", hard_root,
        "--arch", "resnet18", "--height", "64", "--width", "32",
        "--batch-size", "32", "--num-instances", "4",
        "--eps", "0.6", "--k1", "15", "--k2", "4",
        "--momentum", "0.1",
        "--workers", "2", "--epochs", "4", "--iters", "25",
        "--eval-step", "1", "--logs-dir", logs,
    ], mesh=False)   # single-device: the mesh path has its own suite
    sys.stdout = sys.__stdout__
    maps = _epoch_maps(osp.join(logs, "log.txt"))
    assert len(maps) == 4, maps
    # hardness: the one-epoch encoder must NOT saturate (measured 0.296)
    assert maps[0] < 0.45, f"first epoch mAP {maps[0]:.3f} — too easy"
    # learning: the trajectory must climb well clear of its start
    assert best >= 0.45, f"final best mAP {best:.3f} < 0.45 — learning broke"
    assert best >= maps[0] + 0.10, (maps, best)


def test_memory_momentum_reaches_bank(hard_root):
    """Two trainers differing ONLY in momentum must produce different banks
    after one identical step (the knob must reach update_memory)."""
    from reid_gan_tpu.engine.trainers import ClusterContrastTrainer
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.ops.cluster_memory import init_memory

    rng = np.random.RandomState(0)
    model = create_model("resnet18", norm=True)
    centers = rng.randn(4, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    img = rng.randint(0, 256, (8, 64, 32, 3), dtype=np.uint8)
    targets = np.repeat(np.arange(4, dtype=np.int32), 2)

    banks = {}
    for m in (0.1, 0.9):
        # fresh init per trainer: the jitted step donates its state
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((8, 64, 32, 3)), train=True)
        tr = ClusterContrastTrainer(model, height=64, width=32, momentum=m)
        state = tr.init_state(variables, init_memory(centers))
        state, _ = tr._step(state, jnp.asarray(img), jnp.asarray(targets),
                            np.int32(0))
        banks[m] = np.asarray(state.memory.features)
    moved_lo = np.abs(banks[0.1][:4] - centers).max()
    moved_hi = np.abs(banks[0.9][:4] - centers).max()
    assert moved_lo > 1e-4 and moved_hi > 1e-6
    # momentum 0.1 must move the bank much further than 0.9
    assert moved_lo > 3 * moved_hi, (moved_lo, moved_hi)


def test_use_hard_changes_update(hard_root):
    """use_hard=True (CM_Hard min-similarity update, cm.py:58-70) must yield
    a different bank than the plain sequential fold."""
    from reid_gan_tpu.engine.trainers import ClusterContrastTrainer
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.ops.cluster_memory import init_memory

    rng = np.random.RandomState(1)
    model = create_model("resnet18", norm=True)
    centers = rng.randn(4, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    img = rng.randint(0, 256, (8, 64, 32, 3), dtype=np.uint8)
    targets = np.repeat(np.arange(4, dtype=np.int32), 2)

    banks = {}
    for hard in (False, True):
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((8, 64, 32, 3)), train=True)
        tr = ClusterContrastTrainer(model, height=64, width=32,
                                    use_hard=hard)
        state = tr.init_state(variables, init_memory(centers))
        state, _ = tr._step(state, jnp.asarray(img), jnp.asarray(targets),
                            np.int32(0))
        banks[hard] = np.asarray(state.memory.features)
    assert np.abs(banks[True] - banks[False]).max() > 1e-5


def test_conf_weights_scale_the_memory_loss(hard_root):
    """In the joint ``train_all`` step, zero confidence weights must zero the
    contrastive term and change the encoder update vs all-ones weights
    (reference: conf-weighted CE, gan_trainers train_all)."""
    from reid_gan_tpu.config import GANConfig
    from reid_gan_tpu.engine.gan_trainers import ClusterContrastWithGANTrainer
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.models.dual_gan.ae_model import AEModel
    from reid_gan_tpu.ops.cluster_memory import init_memory

    rng = np.random.RandomState(2)
    b, group, k = 8, 2, 4
    H, W, GH, GW = 32, 16, 16, 8
    encoder = create_model("resnet18", norm=True)
    centers = rng.randn(k, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    batch = {"img": rng.randint(0, 256, (b, H, W, 3), dtype=np.uint8),
             "pid": np.repeat(rng.randint(0, k, b // group), group),
             "Xs": rng.randint(0, 256, (b, GH, GW, 3), dtype=np.uint8),
             "keypoints": rng.randint(0, 8, (b, 18, 2)).astype(np.float32),
             "old_size": np.full((b, 2), 8.0, np.float32),
             "index": np.arange(b)}

    class _Loader:
        def next(self):
            return batch

    results = {}
    for w in (1.0, 0.0):
        enc_vars = encoder.init(jax.random.PRNGKey(0),
                                jnp.zeros((b, H, W, 3)), train=True)
        gan = AEModel(GANConfig(model="AE", model_gen="Pose"), gan_height=GH,
                      gan_width=GW, num_feats=32, ngf=8, num_blocks=1,
                      reid_feat_dim=512)
        gan_state = gan.init_state(jax.random.PRNGKey(1))
        tr = ClusterContrastWithGANTrainer(encoder, gan, height=H, width=W,
                                           iters_per_epoch=4,
                                           num_instances=group)
        state = tr.init_state(enc_vars, gan_state, init_memory(centers))
        conf = np.full(b, w, np.float32)
        state, errs = tr.run_epoch(state, 0, _Loader(), mode="train_all",
                                   train_iters=1, print_freq=100,
                                   conf_weight=conf)
        results[w] = (errs, state)
    assert results[1.0][0]["loss_cl"] > 1e-3
    assert abs(results[0.0][0]["loss_cl"]) < 1e-6, \
        "zero conf weights must zero the contrastive loss"
    p1 = jax.tree_util.tree_leaves(results[1.0][1].enc_params)
    p0 = jax.tree_util.tree_leaves(results[0.0][1].enc_params)
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(p1, p0))
    assert diff > 1e-6, "conf weights had no effect on the encoder update"
