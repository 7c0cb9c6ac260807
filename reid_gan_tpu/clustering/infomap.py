"""Infomap-style pseudo-labeling: TPU kNN graph + native two-level directed
map-equation communities.

Parity: CC/clustercontrast/utils/infomap_cluster.py —
- get_dist_nbr (faiss IP kNN, :230-234) → ops.distance.knn_search on MXU
- get_links (threshold sim ≥ min_sim with early break over sorted neighbors,
  :129-144)
- infomap.Infomap('--two-level --directed') (:160-165) → the native
  reid_infomap optimizer (reid_gan_tpu/native)
- clusters with ≤ cluster_num members (incl. isolated singletons) → label −1
  (:204-216)
"""

import numpy as np

from ..ops.distance import knn_search
from ..utils import Timer


def build_knn_links(features, k=15, min_sim=0.55, mesh=None):
    """Edge list (src, dst, sim) over the top-k IP neighbors with sim ≥
    min_sim; isolated nodes returned separately.

    Vectorized: knn_search returns neighbors sorted by descending
    similarity, so the reference's early-break scan (get_links :129-144 —
    append while sim ≥ min_sim, skip self, break below threshold) reduces
    to the mask ``(sim ≥ min_sim) & (nbr ≠ self)``. The per-row Python loop
    this replaces cost ~16 s at MSMT scale (N=32,621, k=15)."""
    feats = np.asarray(features, np.float32)
    sims, nbrs = knn_search(feats, k=k, metric="ip", mesh=mesh)
    sims, nbrs = np.asarray(sims), np.asarray(nbrs)
    n = feats.shape[0]
    mask = (sims >= min_sim) & (nbrs != np.arange(n, dtype=nbrs.dtype)[:, None])
    src = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None],
                          mask.shape)[mask]
    dst = nbrs[mask].astype(np.int32)
    w = sims[mask].astype(np.float32)
    single = np.nonzero(~mask.any(axis=1))[0].tolist()
    return src, dst, w, single


def cluster_by_infomap(features, k=15, min_sim=0.55, cluster_num=2,
                       print_flag=True, seed=0, mesh=None):
    """Returns labels (N,) int32; −1 = outlier (cluster ≤ cluster_num)."""
    from ..native import infomap_native

    n = np.asarray(features).shape[0]
    with Timer("get links", verbose=print_flag):
        src, dst, w, single = build_knn_links(features, k=k, min_sim=min_sim,
                                              mesh=mesh)
    with Timer("infomap", verbose=print_flag):
        labels, n_modules = infomap_native(src, dst, w, n, seed=seed)

    # isolated nodes → their own singleton clusters (infomap_cluster.py:192-198)
    labels = labels.astype(np.int64)
    next_label = int(labels.max()) + 1 if n else 0
    for s in single:
        labels[s] = next_label
        next_label += 1
    if print_flag:
        print(f"isolated nodes: {len(single)}")

    # small clusters → outliers, relabel densely (infomap_cluster.py:204-216)
    out = np.full(n, -1, np.int64)
    uniq, counts = np.unique(labels, return_counts=True)
    keep = uniq[counts > cluster_num]
    for new, old in enumerate(keep):
        out[labels == old] = new
    if print_flag:
        kept = len(keep)
        print(f"num clusters: {kept} (of {next_label} raw modules)")
    return out
