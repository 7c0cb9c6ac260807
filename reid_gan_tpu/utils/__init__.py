"""Cross-cutting utilities (reference: FD/reid/utils, CC/clustercontrast/utils)."""

import numpy as np

from .logging import Logger
from .meters import AverageMeter, Timer
from .osutils import mkdir_if_missing


def enable_compilation_cache(path=None):
    """Turn on JAX's persistent compilation cache (default
    ``~/.cache/reid_gan_tpu/xla``, override with $JAX_COMPILATION_CACHE_DIR).

    XLA:TPU traces compile once per program shape; on remote/tunneled TPU
    backends a cold compile costs tens of seconds, so every CLI entry point
    calls this before first dispatch. No reference counterpart — torch has no
    AOT compile step to cache.
    """
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/reid_gan_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


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


__all__ = ["Logger", "AverageMeter", "Timer", "mkdir_if_missing", "to_numpy",
           "enable_compilation_cache"]
