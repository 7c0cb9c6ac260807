"""End-to-end evaluator tests on the synthetic dataset, incl. the sharded-vs-
single-device equivalence check (SURVEY.md §4.4)."""

import numpy as np
import pytest

from reid_gan_tpu.data.datasets import create as create_dataset
from reid_gan_tpu.data.loader import DataLoader, Preprocessor
from reid_gan_tpu.engine.evaluators import (
    Evaluator,
    FeatureExtractor,
    extract_features,
    pairwise_distance,
)
from reid_gan_tpu.models import create as create_model

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    ds = create_dataset("synthetic", str(root), num_ids=6, num_cams=3, imgs_per_id=3)
    model = create_model("resnet18")
    x = jnp.zeros((1, 64, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return ds, model, variables


def _loader(ds, split):
    pre = Preprocessor(split, mode="reid", height=64, width=32)
    return DataLoader(pre, batch_size=8, drop_last=False, num_workers=2)


def test_extract_features(setup):
    ds, model, variables = setup
    ex = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                          dtype=jnp.float32)
    feats, labels = extract_features(ex, _loader(ds, ds.query), print_freq=1000)
    assert len(feats) == len(ds.query)
    f0 = next(iter(feats.values()))
    assert f0.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(f0), 1.0, atol=1e-3)


def test_extract_features_bounded_drain(setup):
    """max_pending=1 (drain every batch) must equal the default window —
    the rolling drain changes memory residency, never results."""
    ds, model, variables = setup
    ex = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                          dtype=jnp.float32)
    f_win, l_win = extract_features(ex, _loader(ds, ds.query), print_freq=1000)
    f_one, l_one = extract_features(ex, _loader(ds, ds.query), print_freq=1000,
                                    max_pending=1)
    assert l_win == l_one
    assert list(f_win) == list(f_one)
    for k in f_win:
        np.testing.assert_array_equal(f_win[k], f_one[k])


def test_evaluator_end_to_end(setup):
    ds, model, variables = setup
    ex = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                          dtype=jnp.float32)
    pre = Preprocessor(ds.query + ds.gallery, mode="reid", height=64, width=32)
    loader = DataLoader(pre, batch_size=8, drop_last=False, num_workers=2)
    ev = Evaluator(ex)
    scores, mAP = ev.evaluate(loader, ds.query, ds.gallery, cmc_flag=True)
    assert 0.0 <= mAP <= 1.0
    assert scores.shape == (100,)
    # synthetic ids are color-separable: a random resnet should still beat chance
    assert mAP > 1.0 / 6


def test_evaluator_rerank_path(setup):
    ds, model, variables = setup
    ex = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                          dtype=jnp.float32)
    pre = Preprocessor(ds.query + ds.gallery, mode="reid", height=64, width=32)
    loader = DataLoader(pre, batch_size=8, drop_last=False, num_workers=2)
    ev = Evaluator(ex)
    out = ev.evaluate(loader, ds.query, ds.gallery, cmc_flag=False, rerank=True)
    assert 0.0 <= out <= 1.0


def test_sharded_extraction_matches_single_device(setup, mesh):
    """The same program over an 8-device mesh must produce identical features
    (the DataParallel-equivalence guarantee, SURVEY.md §5.8)."""
    ds, model, variables = setup
    ex1 = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                           dtype=jnp.float32)
    ex8 = FeatureExtractor(model, variables, height=64, width=32, batch_size=8,
                           mesh=mesh, dtype=jnp.float32)
    img = (np.random.RandomState(0).rand(8, 64, 32, 3) * 255).astype(np.uint8)
    f1 = ex1(img)
    f8 = ex8(img)
    np.testing.assert_allclose(f1, f8, atol=2e-5)


def test_pairwise_distance_from_dict(setup):
    feats = {f"f{i}": np.random.RandomState(i).randn(16).astype(np.float32)
             for i in range(10)}
    query = [(f"f{i}", i, 0) for i in range(4)]
    gallery = [(f"f{i}", i, 1) for i in range(4, 10)]
    dist, x, y = pairwise_distance(feats, query, gallery)
    assert dist.shape == (4, 6)
    ref = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(dist, ref, rtol=1e-4, atol=1e-4)
