"""Cross-cutting utilities (reference: FD/reid/utils, CC/clustercontrast/utils)."""

import numpy as np

from .logging import Logger
from .meters import AverageMeter, Timer
from .osutils import mkdir_if_missing


def to_numpy(x):
    """Convert a JAX array / numpy array / scalar to numpy.

    Parity with ``FD/reid/utils/__init__.py`` (to_numpy for torch tensors).
    """
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "__array__"):
        return np.asarray(x)
    if isinstance(x, (list, tuple)):
        return np.asarray(x)
    return np.asarray(x)


__all__ = ["Logger", "AverageMeter", "Timer", "mkdir_if_missing", "to_numpy"]
