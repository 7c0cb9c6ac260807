"""Fast-tier smoke coverage of every joint-GAN trainer mode (VERDICT r3 #8).

The full joint-mode suites (test_gan_trainers / test_extra_trainer_modes /
test_mesh_equivalence) are slow-marked; this file runs ONE tiny-shape step
per mode (resnet18 at 32x16, micro GAN) plus one sharded-vs-single
equivalence of the flagship train_all mode, so a regression in any joint
path fails `pytest -m "not slow"`.

Also asserts the reference's train-mode GAN BatchNorm semantics: torch nets
default to train mode and the joint path never calls .eval() on the GAN
(CC/clustercontrast/trainers_b.py:617-814), so G's BN running stats must
update on every joint step (VERDICT r3 weak #1 / next #1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.config import GANConfig
from reid_gan_tpu.engine.gan_trainers import ClusterContrastWithGANTrainer
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.models.dual_gan.ae_model import AEModel
from reid_gan_tpu.ops.cluster_memory import init_gradient_memory, init_memory

H, W = 32, 16
GH, GW = 16, 8
K, B, GROUP = 4, 8, 2


def _batch(rng):
    pids = np.repeat(rng.randint(0, K, B // GROUP), GROUP)
    return {"img": rng.randint(0, 256, (B, H, W, 3), dtype=np.uint8),
            "pid": pids.astype(np.int32),
            "Xs": rng.randint(0, 256, (B, GH, GW, 3), dtype=np.uint8),
            "keypoints": rng.randint(0, 16, (B, 18, 2)).astype(np.float32),
            "old_size": np.full((B, 2), 16.0, np.float32),
            "index": np.arange(B)}


def _setup(model_gen, arch="resnet18", mesh=None):
    rng = np.random.RandomState(0)
    if arch == "bip18":
        from reid_gan_tpu.models.resnet_variants import ResNetBip

        encoder = ResNetBip(depth=18, norm=True)
    else:
        encoder = create_model(arch, norm=True)
    enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)),
                            train=True)
    gan = AEModel(GANConfig(model="AE", model_gen=model_gen), gan_height=GH,
                  gan_width=GW, num_feats=32, ngf=8, num_blocks=1,
                  reid_feat_dim=512)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(K, 512).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=H, width=W, iters_per_epoch=4,
        num_instances=GROUP, mesh=mesh)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))
    return trainer, state


def _g_stats(state):
    return [np.asarray(x).copy()
            for x in jax.tree_util.tree_leaves(state.gan.G["batch_stats"])]


def _assert_stats_changed(before, state):
    after = jax.tree_util.tree_leaves(state.gan.G["batch_stats"])
    assert len(before) == len(after) and len(before) > 0
    changed = sum(not np.allclose(a, np.asarray(b))
                  for a, b in zip(before, after))
    assert changed > 0, "G BatchNorm running stats frozen across a joint step"


def _dev(batch, keys):
    return {k: jnp.asarray(batch[k]) for k in keys}


def test_smoke_train_all_updates_g_batch_stats():
    trainer, state = _setup("Pose")
    batch = _batch(np.random.RandomState(1))
    before = _g_stats(state)
    step = trainer._get_step("train_all")
    state, errs = step(state, _dev(batch, ("img", "pid", "Xs", "keypoints",
                                           "old_size")),
                       np.int32(7), jnp.ones(B, jnp.float32))
    for k in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(float(errs[k])), k
    _assert_stats_changed(before, state)


def test_smoke_train_hard_mix():
    trainer, state = _setup("AE")
    batch = _batch(np.random.RandomState(2))
    before = _g_stats(state)
    mem_before = np.asarray(state.memory.features).copy()
    step = trainer._get_step("train")
    state, errs = step(state, _dev(batch, ("img", "pid", "Xs")), np.int32(3))
    assert np.isfinite(float(errs["loss"]))
    assert not np.allclose(mem_before, np.asarray(state.memory.features))
    _assert_stats_changed(before, state)


def test_smoke_train_reid():
    trainer, state = _setup("Pose")
    batch = _batch(np.random.RandomState(3))
    step = trainer._get_step("train_reid")
    state, errs = step(state, _dev(batch, ("img", "pid")), np.int32(5))
    assert np.isfinite(float(errs["loss"]))


def test_smoke_train_all_bip():
    trainer, state = _setup("AE", arch="bip18")
    batch = _batch(np.random.RandomState(4))
    before = _g_stats(state)
    step = trainer._get_step("train_all_bip")
    state, errs = step(state, _dev(batch, ("img", "pid", "Xs")), np.int32(9))
    for k in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(float(errs[k])), k
    _assert_stats_changed(before, state)


def test_smoke_train_all_with_memory():
    trainer, state = _setup("Pose")
    batch = _batch(np.random.RandomState(5))
    gmem = init_gradient_memory(
        np.random.RandomState(6).randn(K, 512).astype(np.float32))
    clusters_before = np.asarray(gmem.clusters).copy()
    before = _g_stats(state)
    step = trainer._get_step("train_all_with_memory")
    state, gmem, errs = step(state, gmem,
                             _dev(batch, ("img", "pid", "Xs", "keypoints",
                                          "old_size")),
                             np.int32(11), jnp.asarray(0.1, jnp.float32))
    for k in ("loss", "loss_cl", "G", "D"):
        assert np.isfinite(float(errs[k])), k
    assert not np.allclose(clusters_before, np.asarray(gmem.clusters))
    _assert_stats_changed(before, state)


def test_smoke_train_all_sharded_matches_single(mesh):
    """Tiny-shape sharded-vs-single equivalence of the flagship mode in the
    fast tier (full-size variants live in test_mesh_equivalence.py)."""
    from reid_gan_tpu.parallel.mesh import shard_batch

    batch = _batch(np.random.RandomState(7))
    keys = ("img", "pid", "Xs", "keypoints", "old_size")
    results = []
    for m in (None, mesh):
        trainer, state = _setup("Pose", mesh=m)
        step = trainer._get_step("train_all")
        dev = ({k: np.asarray(batch[k]) for k in keys} if m is None
               else shard_batch(m, {k: np.asarray(batch[k]) for k in keys}))
        if m is None:
            dev = {k: jnp.asarray(v) for k, v in dev.items()}
        state, _ = step(state, dev, np.int32(13), jnp.ones(B, jnp.float32))
        results.append(state)
    s1, s8 = results
    for name, a, b in (("enc", s1.enc_params, s8.enc_params),
                       ("G", s1.gan.G, s8.gan.G),
                       ("D", s1.gan.D, s8.gan.D),
                       ("mem", s1.memory.features, s8.memory.features)):
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32), atol=2e-3,
                                       err_msg=f"{name} diverges under mesh")


def test_conf_weight_pose_conditioned(tmp_path):
    """compute_conf_weight must render each sample's reconstruction from its
    REAL pose (reference get_gan_loader passes pose_file=train_pose_dir,
    ...infomap.py:166-186,384-428): supplying the pose annotations must
    change the per-sample L1 ranking and hence the blocked set, vs the
    zero-posemap fallback."""
    from reid_gan_tpu.cli.train_gan_usl import compute_conf_weight
    from reid_gan_tpu.config import Config
    from reid_gan_tpu.data.datasets import create as create_dataset

    rng = np.random.RandomState(0)
    ds = create_dataset("synthetic", str(tmp_path), num_ids=8, num_cams=2,
                        imgs_per_id=4, height=64, width=32, verbose=False)
    cfg = Config()
    cfg.data.gan_height, cfg.data.gan_width = GH, GW
    cfg.data.batch_size, cfg.data.workers, cfg.data.num_instances = 8, 2, 4
    gan = AEModel(GANConfig(model="AE", model_gen="Pose"), gan_height=GH,
                  gan_width=GW, num_feats=32, ngf=8, num_blocks=1,
                  reid_feat_dim=64)
    gan_state = gan.init_state(jax.random.PRNGKey(3))
    centers = rng.randn(8, 64).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    memory = init_memory(centers)
    pseudo = list(ds.train)

    conf_zero = compute_conf_weight(gan, gan_state, pseudo, memory, cfg,
                                    pose_file=None)
    conf_pose = compute_conf_weight(gan, gan_state, pseudo, memory, cfg,
                                    pose_file=ds.train_pose_dir)
    n = len(pseudo)
    block = n // cfg.data.num_instances
    assert (conf_zero == 0).sum() == block and (conf_pose == 0).sum() == block
    assert not np.array_equal(conf_zero, conf_pose)
