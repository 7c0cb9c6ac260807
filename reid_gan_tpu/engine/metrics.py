"""Evaluation metrics: CMC curves and mean average precision.

Parity: {FD/reid,CC/clustercontrast}/evaluation_metrics/ranking.py:18-115
(the two files are diff-identical, SURVEY.md C13). mAP uses the exact
distinct-threshold average precision of sklearn.average_precision_score —
verified bit-equal in tests/test_metrics.py — removing the sklearn native
dependency (SURVEY.md §2.4). ``accuracy`` mirrors
FD/reid/evaluation_metrics/classification.py:6-19.

The reference evaluates with an O(m) interpreted Python loop over queries
(ranking.py:40-76). Here both CMC and mAP come out of ONE chunked rank pass:
argsort → valid/match masks → scatter-compact to valid-rank positions →
cumsum statistics. The same algorithm has two backends:

- numpy (host, query-chunked, int32/float32 — no (m·n) int64 temporaries);
- a jitted JAX kernel (``rank_metrics(..., backend="jax")``) that runs the
  whole pass on the accelerator, where the distance matrix already lives.

The ``single_gallery_shot`` (cuhk03) mode is a vectorized 10-repeat
group-argmax sampling pass (``_sgs_rank_metrics_numpy``). The reference
per-query loops survive only as parity oracles ``_cmc_loop``/
``_mean_ap_loop`` used by the tests. Tie handling is exact: AP uses the
distinct-threshold formula (tie-group-end precision), CMC follows the sort
order, which for the numpy backend is the reference's own np.argsort order.
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


# --------------------------------------------------------------------------
# One-pass chunked rank statistics (numpy backend)
# --------------------------------------------------------------------------

def _chunk_stats_numpy(d, qid, qcam, gids, gcams, separate_camera_set):
    """Rank statistics for a chunk of queries (q, n).

    Returns (ap (q,), first_bin (q,), comp_y (q,n) match-at-valid-rank,
    tps (q,n) cumulative matches, num_matches (q,)) — everything downstream
    (mAP, market CMC, allshots CMC) reads off these.
    """
    q, n = d.shape
    order = np.argsort(d, axis=1)              # same sort as the reference
    d_s = np.take_along_axis(d, order, axis=1)
    g_id = gids[order]
    g_cam = gcams[order]
    match = g_id == qid[:, None]
    valid = (g_id != qid[:, None]) | (g_cam != qcam[:, None])
    if separate_camera_set:
        valid &= g_cam != qcam[:, None]
    vrank = np.cumsum(valid, axis=1, dtype=np.int32)     # 1-based valid rank
    rows, cols = np.nonzero(valid)
    vcols = vrank[rows, cols] - 1
    # compact to valid-rank positions; one inf pad column terminates runs
    comp_d = np.full((q, n + 1), np.inf, d.dtype)
    comp_y = np.zeros((q, n), bool)
    comp_d[rows, vcols] = d_s[rows, cols]
    comp_y[rows, vcols] = match[rows, cols]
    tps = np.cumsum(comp_y, axis=1, dtype=np.int32)
    num_matches = tps[:, -1]
    # tie-group end per position: smallest j' ≥ j with comp_d[j'] ≠ comp_d[j'+1]
    is_end = comp_d[:, 1:] != comp_d[:, :n]
    ar = np.arange(n, dtype=np.int32)
    cand = np.where(is_end, ar, np.int32(n - 1))
    end_idx = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1]
    prec_end = tps[np.arange(q)[:, None], end_idx] / (
        end_idx.astype(np.float64) + 1.0)
    ap = np.where(comp_y, prec_end, 0.0).sum(axis=1) / np.maximum(
        num_matches, 1)
    first_bin = np.argmax(comp_y, axis=1).astype(np.int32)  # valid iff P>0
    return ap, first_bin, comp_y, tps, num_matches


def _rank_metrics_numpy(distmat, query_ids, gallery_ids, query_cams,
                        gallery_cams, topk, separate_camera_set,
                        first_match_break, chunk=512):
    m, n = distmat.shape
    ret = np.zeros(topk)
    ap_sum, valid_q = 0.0, 0
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        ap, first_bin, comp_y, tps, num_matches = _chunk_stats_numpy(
            distmat[s:e], query_ids[s:e], query_cams[s:e], gallery_ids,
            gallery_cams, separate_camera_set)
        has = num_matches > 0
        ap_sum += ap[has].sum()
        valid_q += int(has.sum())
        if first_match_break:
            bins = first_bin[has]
            np.add.at(ret, bins[bins < topk], 1.0)
        else:
            # allshots: j-th match lands in bin (valid_rank − j), weight 1/P
            # (ranking.py:62-70)
            bins = (np.arange(n, dtype=np.int32)[None] - (tps - 1))[comp_y]
            weights = np.repeat(
                np.divide(1.0, num_matches, where=has,
                          out=np.zeros(len(num_matches))), num_matches)
            keep = bins < topk
            np.add.at(ret, bins[keep], weights[keep])
    if valid_q == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / valid_q, ap_sum / valid_q


def _sgs_rank_metrics_numpy(distmat, query_ids, gallery_ids, query_cams,
                            gallery_cams, topk, separate_camera_set,
                            repeat=10, seed=None, chunk=512):
    """Vectorized ``single_gallery_shot`` CMC (the cuhk03 protocol,
    ranking.py:40-66): per query and per repeat, sample ONE gallery
    instance per gallery id from the valid set, then accumulate the
    all-shots bins over the sampled subset with weight 1/(matches·repeat).

    The per-(query, gallery-id) "pick one uniformly" is vectorized as a
    random-key argmax: draw u ~ U(0,1) per valid position and keep the
    positions that attain the per-group maximum (a uniform draw from each
    group). The estimator matches the reference loop's distribution
    exactly; individual draws differ from the loop's RandomState.choice
    sequence, so curves agree exactly only where sampling is deterministic
    (one instance per id) and statistically otherwise — the loop survives
    as the oracle in tests/test_metrics.py.
    """
    m, n = distmat.shape
    rng = np.random.RandomState(seed)
    # dense gallery-id groups (shared across chunks)
    _, gidx_all = np.unique(gallery_ids, return_inverse=True)
    num_groups = int(gidx_all.max()) + 1
    ret = np.zeros(topk)
    valid_q = 0
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        d = distmat[s:e]
        qid, qcam = query_ids[s:e], query_cams[s:e]
        q = e - s
        order = np.argsort(d, axis=1)
        g_id = gallery_ids[order]
        g_cam = gallery_cams[order]
        gidx = gidx_all[order]
        match = g_id == qid[:, None]
        valid = (g_id != qid[:, None]) | (g_cam != qcam[:, None])
        if separate_camera_set:
            valid &= g_cam != qcam[:, None]
        has = (match & valid).any(axis=1)
        valid_q += int(has.sum())
        rows = np.broadcast_to(np.arange(q)[:, None], (q, n))
        for _ in range(repeat):
            u = np.where(valid, rng.rand(q, n), -1.0)
            best = np.full((q, num_groups), -2.0)
            np.maximum.at(best, (rows.ravel(), gidx.ravel()), u.ravel())
            sampled = valid & (u == best[rows, gidx]) & (u >= 0)
            vrank = np.cumsum(sampled, axis=1, dtype=np.int32)
            m_s = match & sampled
            tps = np.cumsum(m_s, axis=1, dtype=np.int32)
            nm = tps[:, -1]
            # j-th sampled match lands in bin (sampled_rank − 1 − j)
            bins = (vrank - 1) - (tps - 1)
            ok = has & (nm > 0)
            w_row = np.divide(1.0, nm * repeat, where=ok,
                              out=np.zeros(q))
            sel = m_s & ok[:, None] & (bins < topk)
            np.add.at(ret, bins[sel], np.broadcast_to(
                w_row[:, None], (q, n))[sel])
    if valid_q == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / valid_q


# --------------------------------------------------------------------------
# One-pass rank statistics (jitted JAX backend — sort + cumsums on device)
# --------------------------------------------------------------------------

def _chunk_stats_jax(topk, separate_camera_set, first_match_break):
    import jax
    import jax.numpy as jnp

    def kernel(d, qid, qcam, gids, gcams):
        q, n = d.shape
        order = jnp.argsort(d, axis=1)          # stable sort on device
        d_s = jnp.take_along_axis(d, order, axis=1)
        g_id = gids[order]
        g_cam = gcams[order]
        match = g_id == qid[:, None]
        valid = (g_id != qid[:, None]) | (g_cam != qcam[:, None])
        if separate_camera_set:
            valid &= g_cam != qcam[:, None]
        vrank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
        vcols = jnp.where(valid, vrank - 1, n)       # n → OOB for (q, n): drop
        vcols_d = jnp.where(valid, vrank - 1, n + 1)  # n+1 → OOB for (q, n+1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (q, n), 0)
        comp_d = jnp.full((q, n + 1), jnp.inf, d.dtype)
        comp_d = comp_d.at[rows, vcols_d].set(d_s, mode="drop")
        comp_y = jnp.zeros((q, n), bool).at[rows, vcols].set(
            match, mode="drop")
        tps = jnp.cumsum(comp_y.astype(jnp.int32), axis=1)
        num_matches = tps[:, -1]
        is_end = comp_d[:, 1:] != comp_d[:, :n]
        ar = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
        cand = jnp.where(is_end, ar, n - 1)
        end_idx = jax.lax.cummin(cand, axis=1, reverse=True)
        prec_end = jnp.take_along_axis(tps, end_idx, axis=1) / (
            end_idx.astype(jnp.float32) + 1.0)
        ap = jnp.where(comp_y, prec_end, 0.0).sum(axis=1) / jnp.maximum(
            num_matches, 1)
        has = num_matches > 0
        hist = jnp.zeros((topk,), jnp.float32)
        if first_match_break:
            first_bin = jnp.argmax(comp_y, axis=1)
            first_bin = jnp.where(has, first_bin, topk)  # dropped
            hist = hist.at[first_bin].add(1.0, mode="drop")
        else:
            bins = ar - (tps - 1)
            w = jnp.where(comp_y & has[:, None],
                          1.0 / jnp.maximum(num_matches, 1)[:, None], 0.0)
            hist = hist.at[jnp.where(comp_y, bins, topk)].add(
                w, mode="drop")
        return hist, jnp.where(has, ap, 0.0).sum(), has.sum()

    return kernel


_JAX_KERNELS = {}


def _chunk_stats_feats_jax(topk, separate_camera_set, first_match_break):
    """Fused distance + rank kernel: a query-chunk's distance block is
    computed on the MXU and consumed by the rank pass INSIDE one jitted
    program — the (chunk, n) block never materializes off-device. This is
    the device-resident replacement for the reference's host distmat
    (CC/clustercontrast/evaluators.py:71-122), which at Market eval scale
    round-trips ~214 MB between two device programs."""
    from ..ops.distance import squared_euclidean

    base = _chunk_stats_jax(topk, separate_camera_set, first_match_break)

    def kernel(qf, gf, qid, qcam, gids, gcams):
        return base(squared_euclidean(qf, gf), qid, qcam, gids, gcams)

    return kernel


def rank_metrics_features(query_feats, gallery_feats, query_ids=None,
                          gallery_ids=None, query_cams=None,
                          gallery_cams=None, topk=100,
                          separate_camera_set=False, first_match_break=True,
                          chunk=1024, mesh=None):
    """Fused CMC + mAP straight from FEATURES — no host distance matrix.

    Only the (m, d)/(n, d) feature matrices cross to device (once for the
    gallery); each query chunk runs distance → sort → scatter-compact →
    cumsum statistics as one XLA program, and only the (topk,) histogram +
    two scalars return per chunk. With ``mesh``, chunk rows are sharded over
    the data axis against the replicated gallery (the §5.7 blockwise layout)
    and XLA reduces the partial histograms over ICI.
    """
    import jax
    import jax.numpy as jnp

    key = ("feats", topk, separate_camera_set, first_match_break)
    if key not in _JAX_KERNELS:
        _JAX_KERNELS[key] = jax.jit(_chunk_stats_feats_jax(*key[1:]))
    kernel = _JAX_KERNELS[key]

    qf = np.asarray(query_feats, np.float32)
    m = qf.shape[0]
    n = gallery_feats.shape[0]
    query_ids, gallery_ids, query_cams, gallery_cams = _default_ids_cams(
        m, n, query_ids, gallery_ids, query_cams, gallery_cams)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding

        rep = replicated_sharding(mesh)
        row = batch_sharding(mesh, 2)
        row1 = batch_sharding(mesh, 1)
        gf = jax.device_put(np.asarray(gallery_feats, np.float32), rep)
        gids = jax.device_put(np.asarray(gallery_ids, np.int32), rep)
        gcams = jax.device_put(np.asarray(gallery_cams, np.int32), rep)
    else:
        gf = jnp.asarray(gallery_feats, jnp.float32)
        gids = jnp.asarray(gallery_ids, jnp.int32)
        gcams = jnp.asarray(gallery_cams, jnp.int32)
    ret = np.zeros(topk)
    ap_sum, valid_q = 0.0, 0
    pending = []
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        q = qf[s:e]
        qid = np.asarray(query_ids[s:e], np.int32)
        qcam = np.asarray(query_cams[s:e], np.int32)
        if e - s < chunk:      # pad to the static chunk shape
            pad = chunk - (e - s)
            q = np.pad(q, ((0, pad), (0, 0)))
            # int32 min can never be a real gallery id/cam → padded rows
            # have zero matches and drop out via the has-mask
            sentinel = np.iinfo(np.int32).min
            qid = np.pad(qid, (0, pad), constant_values=sentinel)
            qcam = np.pad(qcam, (0, pad), constant_values=sentinel)
        if mesh is not None:
            q = jax.device_put(q, row)
            qid = jax.device_put(qid, row1)
            qcam = jax.device_put(qcam, row1)
        else:
            q, qid, qcam = jnp.asarray(q), jnp.asarray(qid), jnp.asarray(qcam)
        # async dispatch; each chunk returns only (topk,) + 2 scalars
        pending.append(kernel(q, gf, qid, qcam, gids, gcams))
    for hist, ap, nv in pending:
        ret += np.asarray(hist, np.float64)
        ap_sum += float(ap)
        valid_q += int(nv)
    if valid_q == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / valid_q, ap_sum / valid_q


def _rank_metrics_jax(distmat, query_ids, gallery_ids, query_cams,
                      gallery_cams, topk, separate_camera_set,
                      first_match_break, chunk=1024):
    import jax
    import jax.numpy as jnp

    key = (topk, separate_camera_set, first_match_break)
    if key not in _JAX_KERNELS:
        _JAX_KERNELS[key] = jax.jit(_chunk_stats_jax(*key))
    kernel = _JAX_KERNELS[key]
    m, n = distmat.shape
    gids = jnp.asarray(gallery_ids, jnp.int32)
    gcams = jnp.asarray(gallery_cams, jnp.int32)
    ret = np.zeros(topk)
    ap_sum, valid_q = 0.0, 0
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        d = np.asarray(distmat[s:e], np.float32)
        qid = np.asarray(query_ids[s:e], np.int32)
        qcam = np.asarray(query_cams[s:e], np.int32)
        if e - s < chunk:      # pad to the static chunk shape
            pad = chunk - (e - s)
            d = np.pad(d, ((0, pad), (0, 0)))
            # int32 min can never appear as a gallery id/cam, so padded
            # rows have zero matches and are dropped by the has-mask —
            # safe even for datasets whose gallery keeps junk pid=-1
            sentinel = np.iinfo(np.int32).min
            qid = np.pad(qid, (0, pad), constant_values=sentinel)
            qcam = np.pad(qcam, (0, pad), constant_values=sentinel)
        hist, ap, nv = kernel(jnp.asarray(d), jnp.asarray(qid),
                              jnp.asarray(qcam), gids, gcams)
        ret += np.asarray(hist, np.float64)
        ap_sum += float(ap)
        valid_q += int(nv)
    if valid_q == 0:
        raise RuntimeError("No valid query")
    return ret.cumsum() / valid_q, ap_sum / valid_q


def rank_metrics(distmat, query_ids=None, gallery_ids=None, query_cams=None,
                 gallery_cams=None, topk=100, separate_camera_set=False,
                 first_match_break=True, backend="auto"):
    """Fused CMC + mAP in one rank pass. backend: 'numpy' | 'jax' | 'auto'
    (jax when the default backend is an accelerator).

    Backend caveat: the jax kernel's stable on-device argsort and float32
    accumulation can order *exactly tied* distances differently from the
    numpy backend (the reference's np.argsort introsort order), so
    accelerator-run numbers can differ in the last decimals on synthetic
    data with duplicated distances. AP itself is tie-exact (distinct-
    threshold formula); only CMC bin placement within a tie group can move.
    Real-valued distance matrices (every production eval) have no ties.
    """
    distmat = to_numpy(distmat)
    m, n = distmat.shape
    query_ids, gallery_ids, query_cams, gallery_cams = _default_ids_cams(
        m, n, query_ids, gallery_ids, query_cams, gallery_cams)
    if backend == "auto":
        import jax

        backend = "jax" if jax.default_backend() not in ("cpu",) else "numpy"
    fn = _rank_metrics_jax if backend == "jax" else _rank_metrics_numpy
    return fn(distmat, query_ids, gallery_ids, query_cams, gallery_cams,
              topk, separate_camera_set, first_match_break)


def cmc(distmat, query_ids=None, gallery_ids=None,
        query_cams=None, gallery_cams=None, topk=100,
        separate_camera_set=False, single_gallery_shot=False,
        first_match_break=False, seed=None, backend="numpy"):
    """Cumulative Matching Characteristics
    (parity: CC/clustercontrast/evaluation_metrics/ranking.py:18-79, with the
    same allshots / cuhk03 / market1501 mode switches). Every mode is a
    chunked vectorized rank pass; the cuhk03 random-sampling mode uses the
    vectorized 10-repeat group-argmax sampler (see
    ``_sgs_rank_metrics_numpy``)."""
    if single_gallery_shot:
        if first_match_break:
            # In the reference this combination is pathological: with one
            # gallery shot per id, `ret[k-j] += 1; break` fires once PER
            # REPEAT without the 1/repeat delta, so ret accumulates ~10 per
            # query and the "CMC" exceeds 1 (ranking.py:60-66). No shipped
            # protocol uses it (cuhk03/allshots = SGS without break,
            # market1501 = break without SGS); reject instead of silently
            # reproducing or ignoring it.
            raise ValueError(
                "single_gallery_shot=True with first_match_break=True is not "
                "a valid CMC protocol (the reference implementation's "
                "accumulator exceeds 1 in this combination)")
        distmat = to_numpy(distmat)
        m, n = distmat.shape
        query_ids, gallery_ids, query_cams, gallery_cams = _default_ids_cams(
            m, n, query_ids, gallery_ids, query_cams, gallery_cams)
        return _sgs_rank_metrics_numpy(
            distmat, query_ids, gallery_ids, query_cams, gallery_cams,
            topk=topk, separate_camera_set=separate_camera_set, seed=seed)
    curve, _ = rank_metrics(distmat, query_ids, gallery_ids, query_cams,
                            gallery_cams, topk=topk,
                            separate_camera_set=separate_camera_set,
                            first_match_break=first_match_break,
                            backend=backend)
    return curve


def mean_ap(distmat, query_ids=None, gallery_ids=None,
            query_cams=None, gallery_cams=None, backend="numpy"):
    """mAP over valid queries
    (parity: CC/clustercontrast/evaluation_metrics/ranking.py:82-115);
    distinct-threshold AP → bit-comparable with sklearn under ties."""
    _, mAP = rank_metrics(distmat, query_ids, gallery_ids, query_cams,
                          gallery_cams, topk=1, backend=backend)
    return mAP


# --------------------------------------------------------------------------
# Reference per-query loops — parity oracles for the tests ONLY; no
# production path reaches them (cmc/mean_ap route every mode through the
# fused passes above)
# --------------------------------------------------------------------------

def _cmc_loop(distmat, query_ids=None, gallery_ids=None,
              query_cams=None, gallery_cams=None, topk=100,
              separate_camera_set=False, single_gallery_shot=False,
              first_match_break=False, seed=None):
    """The reference's per-query loop (ranking.py:18-79)."""
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


def _mean_ap_loop(distmat, query_ids=None, gallery_ids=None,
                  query_cams=None, gallery_cams=None):
    """Reference per-query loop (ranking.py:82-115) — parity oracle."""
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
