"""Mesh construction and sharding for data-parallel training over ICI.

The reference parallelizes with single-process ``nn.DataParallel``
(FD/fdgan/model.py:67-70, CC/dual_gan/models/base_function.py:99). The
TPU-native design is a 1-D ``data`` mesh: inputs batch-sharded, parameters
replicated, gradients all-reduced by XLA-inserted ``psum`` when the jitted
loss is compiled under these shardings. Models here are 25-60M params, so no
tensor/pipeline sharding is needed (SURVEY.md §2.5); the collective story is

  (a) gradient all-reduce        — automatic under jit w/ sharded batch,
  (b) ClusterMemory consistency  — replicated bank + identical scatter update
                                   computed from all-gathered (features, labels),
  (c) feature all-gather         — for clustering / eval distance matrices.
"""

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@functools.lru_cache(maxsize=None)
def get_mesh(n_devices=None):
    """Build a 1-D ``data`` mesh over the first ``n_devices`` devices
    (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh, ndim=1):
    """NamedSharding splitting axis 0 across the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, tree):
    """Place a host pytree with its leading axis split over the data mesh.

    Leading dims must divide the mesh size; callers pad batches to a multiple
    of the device count (static shapes for XLA)."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh, tree):
    """Replicate a pytree (params, memory bank) on every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_device_count():
    return jax.local_device_count()


def pad_to_multiple(array, multiple, axis=0, pad_value=0):
    """Pad ``array`` along ``axis`` so its length is a multiple of ``multiple``.

    Returns (padded, original_length). Static-shape-friendly batching helper:
    XLA requires fixed shapes, so partial final batches are padded and the
    valid length carried on the side.
    """
    n = array.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return array, n
    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(array, pad_width, constant_values=pad_value), n
