"""Evaluation metrics: CMC curves and mean average precision.

Parity: {FD/reid,CC/clustercontrast}/evaluation_metrics/ranking.py:18-115
(the two files are diff-identical, SURVEY.md C13). mAP uses our own
average-precision (sort + cumsum over distinct score thresholds) which is
bit-comparable with sklearn.average_precision_score — verified in
tests/test_metrics.py — removing the sklearn native dependency
(SURVEY.md §2.4). ``accuracy`` mirrors FD/reid/evaluation_metrics/
classification.py:6-19.
"""

from collections import defaultdict

import numpy as np

from ..utils import to_numpy


def average_precision(y_true, y_score):
    """AP = Σ (R_n − R_{n−1}) · P_n over distinct decreasing thresholds."""
    y_true = np.asarray(y_true, bool)
    y_score = np.asarray(y_score, np.float64)
    order = np.argsort(-y_score, kind="stable")
    y = y_true[order]
    s = y_score[order]
    # last index of each tied-score group
    distinct = np.where(np.diff(s))[0]
    thresh_idx = np.r_[distinct, y.size - 1]
    tps = np.cumsum(y)[thresh_idx].astype(np.float64)
    total_pos = tps[-1]
    if total_pos == 0:
        return 0.0
    precision = tps / (thresh_idx + 1)
    recall = tps / total_pos
    return float(np.sum(np.diff(np.r_[0.0, recall]) * precision))


def _default_ids_cams(m, n, query_ids, gallery_ids, query_cams, gallery_cams):
    if query_ids is None:
        query_ids = np.arange(m)
    if gallery_ids is None:
        gallery_ids = np.arange(n)
    if query_cams is None:
        query_cams = np.zeros(m, np.int32)
    if gallery_cams is None:
        gallery_cams = np.ones(n, np.int32)
    return (np.asarray(query_ids), np.asarray(gallery_ids),
            np.asarray(query_cams), np.asarray(gallery_cams))


def _unique_sample(ids_dict, num, rng):
    mask = np.zeros(num, dtype=bool)
    for indices in ids_dict.values():
        mask[rng.choice(indices)] = True
    return mask


def cmc(distmat, query_ids=None, gallery_ids=None,
        query_cams=None, gallery_cams=None, topk=100,
        separate_camera_set=False, single_gallery_shot=False,
        first_match_break=False, seed=None):
    """Cumulative Matching Characteristics
    (parity: CC/clustercontrast/evaluation_metrics/ranking.py:18-79, with the
    same allshots / cuhk03 / market1501 mode switches)."""
    distmat = to_numpy(distmat)
    m, n = distmat.shape
    query_ids, gallery_ids, query_cams, gallery_cams = _default_ids_cams(
        m, n, query_ids, gallery_ids, query_cams, gallery_cams)
    indices = np.argsort(distmat, axis=1)
    matches = gallery_ids[indices] == query_ids[:, None]
    rng = np.random.RandomState(seed)
    ret = np.zeros(topk)
    num_valid_queries = 0
    for i in range(m):
        # drop same-id same-cam gallery entries
        valid = ((gallery_ids[indices[i]] != query_ids[i]) |
                 (gallery_cams[indices[i]] != query_cams[i]))
        if separate_camera_set:
            valid &= gallery_cams[indices[i]] != query_cams[i]
        if not np.any(matches[i, valid]):
            continue
        if single_gallery_shot:
            repeat = 10
            gids = gallery_ids[indices[i][valid]]
            inds = np.where(valid)[0]
            ids_dict = defaultdict(list)
            for j, x in zip(inds, gids):
                ids_dict[x].append(j)
        else:
            repeat = 1
        for _ in range(repeat):
            if single_gallery_shot:
                sampled = valid & _unique_sample(ids_dict, len(valid), rng)
                index = np.nonzero(matches[i, sampled])[0]
            else:
                index = np.nonzero(matches[i, valid])[0]
            delta = 1.0 / (len(index) * repeat)
            for j, k in enumerate(index):
                if k - j >= topk:
                    break
                if first_match_break:
                    ret[k - j] += 1
                    break
                ret[k - j] += delta
        num_valid_queries += 1
    if num_valid_queries == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / num_valid_queries


def mean_ap(distmat, query_ids=None, gallery_ids=None,
            query_cams=None, gallery_cams=None):
    """mAP over valid queries
    (parity: CC/clustercontrast/evaluation_metrics/ranking.py:82-115)."""
    distmat = to_numpy(distmat)
    m, n = distmat.shape
    query_ids, gallery_ids, query_cams, gallery_cams = _default_ids_cams(
        m, n, query_ids, gallery_ids, query_cams, gallery_cams)
    indices = np.argsort(distmat, axis=1)
    matches = gallery_ids[indices] == query_ids[:, None]
    aps = []
    for i in range(m):
        valid = ((gallery_ids[indices[i]] != query_ids[i]) |
                 (gallery_cams[indices[i]] != query_cams[i]))
        y_true = matches[i, valid]
        y_score = -distmat[i][indices[i]][valid]
        if not np.any(y_true):
            continue
        aps.append(average_precision(y_true, y_score))
    if not aps:
        raise RuntimeError("No valid query")
    return float(np.mean(aps))


def accuracy(output, target, topk=(1,)):
    """Top-k precision of logits vs integer targets
    (parity: FD/reid/evaluation_metrics/classification.py:6-19)."""
    output = to_numpy(output)
    target = to_numpy(target)
    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    ret = []
    for k in topk:
        ret.append(float(correct[:, :k].any(axis=1).mean()))
    return ret
