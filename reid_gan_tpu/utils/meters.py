"""Step-time / loss meters (parity: FD/reid/utils/meters.py,
CC/clustercontrast/utils/infomap_utils.py:15-28)."""

import time


class AverageMeter:
    """Running average of a scalar series."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """Context-manager wall-clock timer printing on exit.

    Parity: CC/clustercontrast/utils/infomap_utils.py:15-28 (used around the
    clustering phases).
    """

    def __init__(self, name="task", verbose=True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *args):
        self.elapsed = time.time() - self.start
        if self.verbose:
            print(f"[Time] {self.name} consumes {self.elapsed:.4f} s")
        return False
