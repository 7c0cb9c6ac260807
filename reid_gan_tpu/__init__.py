"""reid_gan_tpu — a TPU-native person re-identification + GAN framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
daemon-219/ReID-GAN (FD-GAN supervised re-ID + GAN, and cluster-contrast
unsupervised re-ID with a jointly trained dual GAN).

Sub-packages
------------
- ``models``    : flax.linen network definitions (ResNet re-ID backbones,
                  FD-GAN generator/discriminators, dual-GAN generators).
- ``ops``       : TPU compute kernels — pairwise distances, k-NN, Jaccard,
                  cluster-memory InfoNCE, image/pose transforms, losses.
- ``data``      : dataset scanners, samplers, host loaders, synthetic data.
- ``engine``    : trainers and evaluators (pure-functional train steps).
- ``clustering``: DBSCAN / Infomap / k-means pseudo-label generators.
- ``parallel``  : device mesh + sharding helpers (DP over ICI).
- ``utils``     : logging, meters, checkpointing.

Reference parity map: see SURVEY.md at the repo root; docstrings cite
reference files as e.g. ``CC/clustercontrast/models/cm.py:9-33``.
"""

__version__ = "0.1.0"

import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


def _disable_numpy_hugepage_madvise():
    """Keep numpy from madvise(MADV_HUGEPAGE)-ing large buffers.

    On hosts whose THP mode is ``madvise`` with slow synchronous hugepage
    compaction (measured here: ~320 ms per 2 MB page — 109 s to first-touch a
    (12936, 12936) fp32 matrix vs 0.41 s without), numpy's default hugepage
    madvise makes every large allocation (Jaccard/DBSCAN distance matrices,
    feature banks, CMC buffers) pathologically slow. The env var only works
    before numpy's first import, so also flip the runtime toggle.
    """
    try:
        import numpy as _np

        mod = getattr(_np, "_core", None) or _np.core
        mod.multiarray._set_madvise_hugepage(False)
    except Exception:
        pass


_disable_numpy_hugepage_madvise()
