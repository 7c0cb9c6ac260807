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
