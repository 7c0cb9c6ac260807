"""Golden-value tests for CMC/mAP (SURVEY.md §4.1) — oracle is an independent
numpy re-derivation of CC/clustercontrast/evaluation_metrics/ranking.py plus
sklearn's average_precision_score for AP bit-parity."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score

from reid_gan_tpu.engine.metrics import accuracy, average_precision, cmc, mean_ap


def test_average_precision_matches_sklearn():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(5, 50)
        y_true = rng.rand(n) < 0.3
        if not y_true.any():
            y_true[0] = True
        y_score = np.round(rng.rand(n), 2)  # ties on purpose
        ours = average_precision(y_true, y_score)
        ref = average_precision_score(y_true, y_score)
        assert abs(ours - ref) < 1e-12


def test_cmc_perfect_ranking():
    # 3 queries, 4 gallery; distances put the correct match first
    qids = np.array([0, 1, 2])
    gids = np.array([0, 1, 2, 3])
    qcams = np.zeros(3, int)
    gcams = np.ones(4, int)
    dist = np.ones((3, 4))
    for i in range(3):
        dist[i, i] = 0.0
    res = cmc(dist, qids, gids, qcams, gcams, topk=4, first_match_break=True)
    assert np.allclose(res, 1.0)
    assert abs(mean_ap(dist, qids, gids, qcams, gcams) - 1.0) < 1e-12


def test_cmc_second_rank():
    qids = np.array([0])
    gids = np.array([1, 0])
    dist = np.array([[0.1, 0.2]])
    res = cmc(dist, qids, gids, np.zeros(1, int), np.ones(2, int),
              topk=2, first_match_break=True)
    assert np.allclose(res, [0.0, 1.0])
    # AP for single positive at rank 2 = 1/2
    assert abs(mean_ap(dist, qids, gids, np.zeros(1, int), np.ones(2, int)) - 0.5) < 1e-12


def test_same_cam_same_id_filtered():
    # the only gallery match shares cam+id with the query → query invalid
    qids = np.array([0])
    gids = np.array([0])
    dist = np.zeros((1, 1))
    with pytest.raises(RuntimeError):
        cmc(dist, qids, gids, np.zeros(1, int), np.zeros(1, int))


def test_market1501_mode_multi_gallery():
    # 1 query, 3 same-id gallery at ranks 1,3 and a distractor at rank 2
    qids = np.array([7])
    gids = np.array([7, 3, 7])
    dist = np.array([[0.1, 0.2, 0.3]])
    res = cmc(dist, qids, gids, np.zeros(1, int), np.ones(3, int),
              topk=3, separate_camera_set=False, single_gallery_shot=False,
              first_match_break=True)
    assert np.allclose(res, [1.0, 1.0, 1.0])
    ap = mean_ap(dist, qids, gids, np.zeros(1, int), np.ones(3, int))
    # precision at ranks of the two positives: 1/1 and 2/3
    assert abs(ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-12


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    target = np.array([1, 0, 0])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert abs(top1 - 2.0 / 3.0) < 1e-12
    assert abs(top2 - 1.0) < 1e-12
