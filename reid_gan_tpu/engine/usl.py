"""Unsupervised cluster-contrast training loop — the framework flagship.

Parity: CC/examples/cluster_contrast_train_usl.py (DBSCAN recipe) and
cluster_contrast_train_usl_infomap.py (Infomap recipe). Per epoch:

  1. extract L2-normalized features of the full train set (TPU, sharded)
  2. pseudo-labels: Jaccard→DBSCAN, or kNN-graph→Infomap, or k-means
  3. centroid memory bank (normalized means; usl.py:169-184)
  4. rebuild P×K loader over the pseudo-labeled subset
  5. 400-iter InfoNCE contrastive epoch (engine/trainers.py)
"""

import numpy as np

from ..clustering.dbscan import dbscan
from ..data import IterLoader
from ..data.loader import DataLoader, Preprocessor
from ..data.sampler import RandomMultipleGallerySampler
from ..ops.cluster_memory import init_memory
from ..ops.jaccard import compute_jaccard_distance
from ..utils import Timer


def generate_cluster_features(labels, features):
    """Mean feature per cluster id ≥ 0, ordered by id, then L2-normalized by
    the caller via init_memory (CC/examples/...usl.py:169-184 + the
    F.normalize at memory setup)."""
    labels = np.asarray(labels)
    order = np.unique(labels[labels >= 0])
    centers = np.stack([features[labels == k].mean(axis=0) for k in order])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True) + 1e-12
    return centers


def pseudo_labels_dbscan(features, eps=0.4, min_samples=4, k1=30, k2=6,
                         print_flag=True, mesh=None):
    """Jaccard distance + DBSCAN (CC/examples/cluster_contrast_train_usl.py:
    154-164)."""
    with Timer("jaccard", verbose=print_flag):
        dist = compute_jaccard_distance(features, k1=k1, k2=k2,
                                        print_flag=print_flag, mesh=mesh)
    with Timer("dbscan", verbose=print_flag):
        labels = dbscan(dist, eps=eps, min_samples=min_samples)
    return labels


def pseudo_labels_infomap(features, eps=0.5, k1=15, print_flag=True,
                          cluster_num=4, mesh=None):
    """faiss-IP kNN graph + Infomap communities, outliers → singletons
    (CC/clustercontrast/utils/infomap_cluster.py:147-227)."""
    from ..clustering.infomap import cluster_by_infomap

    return cluster_by_infomap(features, k=k1, min_sim=eps,
                              cluster_num=cluster_num, print_flag=print_flag,
                              mesh=mesh)


def build_pseudo_dataset(train_set, labels):
    """(fname, pseudo_label, camid) triples for clustered samples only
    (CC/examples/...usl.py pseudo_labeled_dataset construction)."""
    out = []
    for (fname, _, camid), label in zip(train_set, labels):
        if label >= 0:
            out.append((fname, int(label), camid))
    return out


def extract_train_features(extractor, dataset, train_set, height, width,
                           batch_size=256, workers=4):
    """Features of the full train set in dataset order → (N, D) array, plus
    the pooled GAN features when the extractor runs with extra_features
    (reference ...infomap.py:309-318 cluster_with_gan_features path)."""
    from .evaluators import extract_features

    pre = Preprocessor(train_set, mode="reid", height=height, width=width)
    loader = DataLoader(pre, batch_size=batch_size, drop_last=False,
                        num_workers=workers)
    if getattr(extractor, "extra", False):
        features, gan_features, _ = extract_features(extractor, loader,
                                                     print_freq=1 << 30)
        return (np.stack([features[f] for f, _, _ in train_set]),
                np.stack([gan_features[f] for f, _, _ in train_set]))
    features, _ = extract_features(extractor, loader, print_freq=1 << 30)
    return np.stack([features[f] for f, _, _ in train_set]), None


def make_train_loader(train_set, height, width, batch_size, num_instances,
                      workers=4, iters=400, seed=None, mode="reid", **pre_kw):
    sampler = RandomMultipleGallerySampler(train_set, num_instances, seed=seed)
    pre = Preprocessor(train_set, mode=mode, height=height, width=width, **pre_kw)
    loader = DataLoader(pre, sampler=sampler, batch_size=batch_size,
                        num_workers=workers, drop_last=True)
    it = IterLoader(loader, length=iters)
    it.new_epoch()
    return it


def cluster_epoch(extractor, dataset, train_set, cfg, k_pad=None,
                  backend=None, print_flag=True):
    """One clustering phase → (memory_state, pseudo_dataset, num_clusters).
    The kNN/Jaccard row blocks are sharded over the extractor's mesh when it
    has one (SURVEY.md §5.8 blockwise-matmul design)."""
    feats, gan_feats = extract_train_features(extractor, dataset, train_set,
                                              cfg.data.height, cfg.data.width,
                                              batch_size=cfg.data.batch_size,
                                              workers=cfg.data.workers)
    mesh = getattr(extractor, "mesh", None)
    backend = backend or cfg.cluster.cluster_backend
    if backend == "dbscan":
        labels = pseudo_labels_dbscan(feats, eps=cfg.cluster.eps,
                                      min_samples=cfg.cluster.min_samples,
                                      k1=cfg.cluster.k1, k2=cfg.cluster.k2,
                                      print_flag=print_flag, mesh=mesh)
    elif backend == "infomap":
        labels = pseudo_labels_infomap(feats, eps=cfg.cluster.eps,
                                       k1=cfg.cluster.k1,
                                       cluster_num=cfg.cluster.k2,
                                       print_flag=print_flag, mesh=mesh)
    elif backend == "kmeans":
        from ..clustering.kmeans import kmeans_labels

        labels, _ = kmeans_labels(feats, cfg.cluster.max_clusters or 64)
    else:
        raise KeyError(backend)
    num_clusters = int(labels.max()) + 1 if (labels >= 0).any() else 0
    if print_flag:
        n_out = int((labels == -1).sum())
        print(f"==> Clustered into {num_clusters} classes "
              f"({n_out} outliers)")
    centers = generate_cluster_features(labels, feats)
    # parallel GAN centroid bank (CM_gan, reference cm.py:99-103 fed from
    # ...infomap.py:349-370 when cluster_with_gan_features)
    gan_centers = (generate_cluster_features(labels, gan_feats)
                   if gan_feats is not None else None)
    # pad-and-mask to a 256-multiple so cluster-count drift between epochs
    # doesn't retrace the jitted train step (SURVEY.md §7 'ragged shapes')
    pad = max(k_pad or 0, 256 * -(-num_clusters // 256))
    memory = init_memory(centers, k_pad=pad, gan_centroids=gan_centers)
    return memory, build_pseudo_dataset(train_set, labels), num_clusters
