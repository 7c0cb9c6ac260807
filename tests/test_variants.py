"""Backbone variants (bip/bipd/mp), DSBN transform, FeatureDatabase, aux-loss
ops, gradient memory."""

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.models import create
from reid_gan_tpu.models.dsbn import convert_bn, convert_dsbn, select_domain
from reid_gan_tpu.ops.losses import (
    cl_loss,
    contrastive_loss,
    distance_wb,
    intra_cl,
    match_loss,
)
from reid_gan_tpu.ops.cluster_memory import (
    gradient_memory_loss,
    init_gradient_memory,
    update_gradient_clusters,
)

X = jnp.zeros((2, 64, 32, 3))


def _train_out(model, **kw):
    v = model.init(jax.random.PRNGKey(0), X, train=True)
    out, _ = model.apply(v, X, train=True, mutable=["batch_stats"], **kw)
    return v, out


def test_resnet_bip_fused_and_dual():
    m = create("resnet_bip50")
    v, out = _train_out(m)
    assert out["feat"].shape == (2, 2048)
    out2, _ = m.apply(v, X, train=True, fuse=False, mutable=["batch_stats"])
    assert out2["feat"].shape == (2, 2048) and out2["feat2"].shape == (2, 2048)


def test_resnet_bipd_decoupled():
    m = create("resnet_bipd50")
    v, out = _train_out(m)
    assert out["feat"].shape == (2, 2048)
    assert out["gan_feat"].shape[-1] == 2048  # spatial p2 branch
    eval_out = m.apply(v, X, train=False)
    np.testing.assert_allclose(np.linalg.norm(eval_out["feat"], axis=1), 1.0,
                               atol=1e-4)


def test_resnet_mp_parts():
    m = create("resnet_mp50")
    v, out = _train_out(m)
    for k in ("feat", "feat_g", "feat_p1", "feat_p2", "gan_feat"):
        assert k in out
    assert out["gan_feat"].shape[-1] == 256
    assert "pred" not in out            # predictor off by default


def test_resnet_mp_predictor():
    """need_predictor builds the SimSiam 2-layer MLP
    (resnet_mp.py:81-83,195-197: Linear(d,2d) → BN → ReLU → Linear(2d,d),
    no last BN) and returns its output during training."""
    m = create("resnet_mp50", need_predictor=True)
    v, out = _train_out(m)
    d = out["feat"].shape[-1]
    assert out["pred"].shape == (out["feat"].shape[0], d)
    pp = v["params"]["predictor"]
    assert pp["fc1"]["kernel"].shape == (d, 2 * d)
    assert pp["fc2"]["kernel"].shape == (2 * d, d)
    assert "bias" not in pp["fc1"] and "bias" not in pp["fc2"]
    # eval keeps the predictor params in the tree but not the output
    assert "pred" not in m.apply(v, jnp.zeros((2, 64, 32, 3)), train=False)


def test_dsbn_roundtrip():
    m = create("resnet18")
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    ds = convert_dsbn(v, num_domains=2)
    v0 = select_domain(ds, 0)
    out = m.apply(v0, X, train=False)
    assert out["feat"].shape == (2, 512)
    back = convert_bn(ds, use_target=True)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(v)


def test_feature_database(tmp_path):
    from reid_gan_tpu.engine.feature_extraction import FeatureDatabase

    path = str(tmp_path / "feats.h5")
    with FeatureDatabase(path, "w") as db:
        db["a"] = np.arange(4, dtype=np.float32)
        db["b"] = np.ones((2, 2), np.float32)
        db["a"] = np.arange(4, dtype=np.float32) * 2  # overwrite
    with FeatureDatabase(path, "r") as db:
        assert len(db) == 2
        np.testing.assert_array_equal(db["a"], np.arange(4) * 2)


def test_aux_losses_finite(rng):
    q = jnp.asarray(rng.randn(8, 16), jnp.float32)
    k = jnp.asarray(rng.randn(8, 16), jnp.float32)
    assert np.isfinite(float(contrastive_loss(q, k)))
    assert np.isfinite(float(intra_cl(q, k, group_size=2)))
    assert np.isfinite(float(cl_loss(q, jnp.concatenate([k, k]), group_size=2)))
    # self-contrastive loss is minimal when q == k
    same = float(contrastive_loss(q, q))
    diff = float(contrastive_loss(q, jnp.asarray(rng.randn(8, 16), jnp.float32)))
    assert same < diff


def test_match_loss_metrics(rng):
    g1 = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32),
          "k": jnp.asarray(rng.randn(2, 2, 3, 4), jnp.float32)}
    g2 = jax.tree_util.tree_map(lambda x: x + 0.01, g1)
    for metric in ("ours", "mse", "cos"):
        v = float(match_loss(g2, g1, metric))
        assert np.isfinite(v) and v >= 0
    # identical gradients → zero distance
    assert float(match_loss(g1, g1, "ours")) < 1e-5
    assert float(distance_wb(g1["w"], g1["w"])) < 1e-5


def test_gradient_memory(rng):
    centers = rng.randn(4, 8).astype(np.float32)
    state = init_gradient_memory(centers)
    x = jnp.asarray(rng.randn(6, 8), jnp.float32)
    y = jnp.asarray(rng.randint(0, 4, 6), jnp.int32)
    loss, _ = gradient_memory_loss(x, y, state)
    assert np.isfinite(float(loss))

    def f(clusters):
        s = state._replace(clusters=clusters)
        l, _ = gradient_memory_loss(x, y, s)
        return l

    # gradient flows to clusters? No — forward detaches normalized clusters
    # (cm.py:163: normed_clusters.detach()); updates come from the GAN loss.
    g = jax.grad(f)(state.clusters)
    assert float(jnp.abs(g).max()) == 0.0
    # SGD update with row normalization
    grads = jnp.asarray(rng.randn(4, 8), jnp.float32)
    mask = jnp.asarray([True, False, True, False])
    new = update_gradient_clusters(state, grads, mask, cluster_lr=0.1)
    assert not np.allclose(np.asarray(new.clusters), centers)


def test_factory_accepts_cli_kwargs():
    """Every registered arch must accept the uniform kwargs the CLIs pass
    (the reference's examples call models.create(arch, num_features=...,
    norm=..., dropout=..., pooling_type=...) for every arch) — resnet_mp50
    used to crash on num_features at the CLI."""
    from reid_gan_tpu.models import create, names

    for name in names():
        create(name, num_features=0, norm=True, dropout=0.0,
               pooling_type="gem", dtype=None)
