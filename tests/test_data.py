"""Synthetic dataset + sampler + loader integration tests (SURVEY.md §4.3)."""

import numpy as np
import pytest

from reid_gan_tpu.data import IterLoader
from reid_gan_tpu.data.datasets import create
from reid_gan_tpu.data.loader import DataLoader, PoseAnnotations, Preprocessor
from reid_gan_tpu.data.sampler import (
    RandomIdentitySampler,
    RandomMultipleGallerySampler,
    RandomPairSampler,
    ShardedSampler,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return create("synthetic", str(root), num_ids=8, num_cams=3, imgs_per_id=4)


def test_synthetic_scan(dataset):
    assert len(dataset.train) > 0
    assert len(dataset.query) == 8
    assert len(dataset.gallery) == 8
    pids = {pid for _, pid, _ in dataset.train}
    assert pids == set(range(8))  # relabeled to 0..n-1
    cams = {cam for _, _, cam in dataset.train}
    assert cams <= {0, 1, 2}


def test_pose_annotations(dataset):
    ann = PoseAnnotations(dataset.train_pose_dir)
    import os.path as osp
    name = osp.basename(dataset.train[0][0])
    assert name in ann
    kp = ann[name]
    assert kp.shape == (18, 2)


def test_pxk_sampler_structure(dataset):
    k = 4
    sampler = RandomMultipleGallerySampler(dataset.train, num_instances=k, seed=0)
    idx = list(sampler)
    pids = [dataset.train[i][1] for i in idx]
    # every aligned K-group is single-pid
    for s in range(0, len(pids) - k + 1, k):
        assert len(set(pids[s:s + k])) == 1


def test_identity_sampler(dataset):
    sampler = RandomIdentitySampler(dataset.train, num_instances=3, seed=0)
    idx = list(sampler)
    assert len(idx) == len(sampler)
    pids = [dataset.train[i][1] for i in idx]
    for s in range(0, len(pids), 3):
        assert len(set(pids[s:s + 3])) == 1


def test_sharded_sampler(dataset):
    base = RandomIdentitySampler(dataset.train, num_instances=2, seed=0)
    full = list(base)
    base.rng = np.random.RandomState(0)  # reset for identical permutation
    shard0 = list(ShardedSampler(RandomIdentitySampler(dataset.train, 2, seed=0), 0, 2))
    shard1 = list(ShardedSampler(RandomIdentitySampler(dataset.train, 2, seed=0), 1, 2))
    assert sorted(shard0 + shard1) == sorted(full)


def test_pair_sampler(dataset):
    sampler = RandomPairSampler(dataset.train, neg_pos_ratio=2, seed=0)
    pairs = list(sampler)
    assert len(pairs) == len(sampler)
    pid = lambda i: dataset.train[i][1]  # noqa: E731
    for j in range(0, len(pairs), 3):
        a, p = pairs[j]
        assert pid(a) == pid(p)
        for a2, n in pairs[j + 1:j + 3]:
            assert a2 == a and pid(n) != pid(a)


def test_loader_reid_mode(dataset):
    pre = Preprocessor(dataset.train, mode="reid", height=64, width=32, seed=0)
    loader = DataLoader(pre, batch_size=8, shuffle=True, seed=0, num_workers=2)
    batch = next(iter(loader))
    assert batch["img"].shape == (8, 64, 32, 3)
    assert batch["img"].dtype == np.uint8
    assert batch["pid"].shape == (8,)
    assert len(batch["fname"]) == 8


def test_loader_with_gan_mode(dataset):
    pre = Preprocessor(dataset.train, mode="with_gan", height=64, width=32,
                       gan_height=32, gan_width=16,
                       pose_file=dataset.train_pose_dir, flip_all=True, seed=0)
    loader = DataLoader(pre, batch_size=4, num_workers=2)
    batch = next(iter(loader))
    assert batch["Xs"].shape == (4, 32, 16, 3)
    assert batch["keypoints"].shape == (4, 18, 2)
    assert batch["gt_label"].shape == (4,)
    assert batch["old_size"].shape == (4, 2)


def test_loader_fdgan_pair_mode(dataset):
    pre = Preprocessor(dataset.train, mode="fdgan_pose", height=64, width=32,
                       pid_imgs=dataset.pid_imgs, pose_root=dataset.poses_dir, seed=0)
    sampler = RandomPairSampler(dataset.train, neg_pos_ratio=1, seed=0)
    loader = DataLoader(pre, sampler=sampler, batch_size=4, num_workers=2)
    b1, b2 = next(iter(loader))
    assert b1["img"].shape == (4, 64, 32, 3)
    assert b1["target"].shape == (4, 64, 32, 3)
    assert b1["landmark"].shape == (4, 18, 2)
    assert b2["img"].shape == (4, 64, 32, 3)


def test_iterloader_wraps(dataset):
    pre = Preprocessor(dataset.train, mode="reid", height=32, width=16)
    loader = DataLoader(pre, batch_size=16, num_workers=2)
    it = IterLoader(loader, length=5)
    it.new_epoch()
    for _ in range(12):  # > one epoch: must wrap silently
        batch = it.next()
        assert batch["img"].shape[0] == 16


def test_loader_propagates_worker_errors(dataset):
    """A decode failure must fail the epoch loudly, not truncate it
    (a missing file in the reference's DataLoader raises in the worker and
    kills the run — silent truncation would corrupt pseudo-label training)."""

    class Boom(Preprocessor):
        def __getitem__(self, index):
            if index == 5:
                raise FileNotFoundError("synthetic decode failure")
            return super().__getitem__(index)

    pre = Boom(dataset.train, mode="reid", height=32, width=16)
    loader = DataLoader(pre, batch_size=4, num_workers=2, shuffle=False)
    with pytest.raises(FileNotFoundError, match="synthetic decode failure"):
        for _ in loader:
            pass


def test_iterloader_close_joins_workers(dataset):
    """close() mid-epoch stops the producer; no worker touches the dataset
    afterwards (bench_loader deletes its tempdir right after closing)."""
    calls = []

    class Recording(Preprocessor):
        def __getitem__(self, index):
            calls.append(index)
            return super().__getitem__(index)

    pre = Recording(dataset.train, mode="reid", height=32, width=16)
    loader = DataLoader(pre, batch_size=4, num_workers=2, prefetch=1)
    it = IterLoader(loader, length=100)
    it.new_epoch()
    it.next()
    it.close()
    n_after_close = len(calls)
    import time as _t
    _t.sleep(0.3)
    assert len(calls) == n_after_close  # producer fully stopped
    assert it.iter is None


def test_image_cache_decodes_once_and_respects_budget(dataset):
    """The decoded-uint8 RAM cache (VERDICT r3 #3): identical arrays to a
    direct decode, one decode per (path, size), streaming fallback past the
    budget."""
    from reid_gan_tpu.data import loader as loader_mod
    from reid_gan_tpu.data.loader import ImageCache, _decode

    fname = dataset.train[0][0]
    direct_img, direct_sz = _decode(fname, 64, 32)

    cache = ImageCache(budget_bytes=1 << 20)
    calls = {"n": 0}
    orig = loader_mod._decode

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    loader_mod._decode = counting
    try:
        a1, s1 = cache.get(fname, 64, 32)
        a2, s2 = cache.get(fname, 64, 32)
        assert calls["n"] == 1            # second hit served from RAM
        assert a1 is a2
        np.testing.assert_array_equal(a1, direct_img)
        np.testing.assert_array_equal(s1, direct_sz)
        # different size = different cache entry
        cache.get(fname, 32, 16)
        assert calls["n"] == 2

        # budget exhaustion -> streaming fallback (decode every time,
        # nothing new inserted)
        tiny = ImageCache(budget_bytes=0)
        calls["n"] = 0
        tiny.get(fname, 64, 32)
        tiny.get(fname, 64, 32)
        assert calls["n"] == 2 and len(tiny) == 0
    finally:
        loader_mod._decode = orig


def test_loader_uses_shared_cache(dataset):
    """Two epochs over the same Preprocessor decode each file once."""
    from reid_gan_tpu.data.loader import ImageCache

    cache = ImageCache()
    pre = Preprocessor(list(dataset.train), mode="reid", height=64, width=32,
                       cache=cache)
    loader = DataLoader(pre, batch_size=4, num_workers=2, drop_last=False)
    n1 = sum(len(b["pid"]) for b in loader)
    assert len(cache) == len(dataset.train)
    used_after_first = cache.used
    n2 = sum(len(b["pid"]) for b in loader)
    assert n1 == n2 == len(dataset.train)
    assert cache.used == used_after_first  # epoch 2 inserted nothing new


def test_packed_batch_matches_per_item(tmp_path):
    """The vectorized packed-batch path must be field-for-field identical to
    the per-item collate path (flip draws excepted — both are fresh RNG)."""
    from reid_gan_tpu.data.loader import ImageCache, Preprocessor, _collate

    ds = create("synthetic", str(tmp_path), num_ids=8, num_cams=2,
                imgs_per_id=4, height=64, width=32)
    train = list(ds.train)
    idx = [3, 0, 7, 5]
    kw = dict(mode="with_gan", height=64, width=32, gan_height=32,
              gan_width=16, pose_file=ds.train_pose_dir)
    packed_pre = Preprocessor(train, cache=ImageCache(1 << 30), **kw)
    item_pre = Preprocessor(train, cache=None, **kw)
    assert packed_pre.batchable()
    got = packed_pre.get_batch(idx)
    want = _collate([item_pre[i] for i in idx])
    assert set(got) == set(want)
    for key in want:
        if key in ("flip", "gan_flip"):
            continue
        if isinstance(want[key], list):
            assert got[key] == want[key], key
        else:
            np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_packed_batch_respects_cache_budget(tmp_path):
    """Over-budget datasets must fall back to per-item streaming."""
    from reid_gan_tpu.data.loader import ImageCache, Preprocessor

    ds = create("synthetic", str(tmp_path), num_ids=8, num_cams=2,
                imgs_per_id=4, height=64, width=32)
    pre = Preprocessor(list(ds.train), mode="reid", height=64, width=32,
                       cache=ImageCache(budget_bytes=100))
    assert not pre.batchable()

    # packed keeps a second resident copy (cache + packed array), so the
    # gate bills the dataset TWICE against the budget (ADVICE r4 medium):
    # budget in [need, 2*need) must stream, >= 2*need may pack
    need = len(ds.train) * 64 * 32 * 3
    mid = Preprocessor(list(ds.train), mode="reid", height=64, width=32,
                       cache=ImageCache(budget_bytes=need + need // 2))
    assert not mid.batchable()
    big = Preprocessor(list(ds.train), mode="reid", height=64, width=32,
                       cache=ImageCache(budget_bytes=4 * need))
    assert big.batchable()


def test_packed_only_gan_flips_match_per_item(tmp_path):
    """only_gan + flip_all: get_batch must mirror the per-item path's
    hard-coded flip=False (ADVICE r4 low #2)."""
    from reid_gan_tpu.data.loader import ImageCache, Preprocessor

    ds = create("synthetic", str(tmp_path), num_ids=4, num_cams=2,
                imgs_per_id=2, height=64, width=32)
    pre = Preprocessor(list(ds.train), mode="only_gan", gan_height=32,
                       gan_width=16, flip_all=True, cache=ImageCache(1 << 30))
    assert pre.batchable()
    got = pre.get_batch([0, 1, 2, 3])
    assert not got["gan_flip"].any()
    assert not pre[0]["gan_flip"]
