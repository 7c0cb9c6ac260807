"""Structured training-metrics writer.

Replaces the reference's wandb hard-dependency + TensorBoard SummaryWriter
(SURVEY.md §5.5: wandb.init at ...infomap.py:213-219, unconditional wandb.log
in every trainer iteration, SummaryWriter at :278) with a dependency-free
JSONL stream (one line per log call) plus an optional TensorBoard sink when
the package is importable.
"""

import json
import os
import os.path as osp
import time

from .osutils import mkdir_if_missing


class MetricsWriter:
    def __init__(self, log_dir, name="run", use_tensorboard=True):
        mkdir_if_missing(log_dir)
        self.path = osp.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(osp.join(log_dir, "tb"), comment=name)
            except Exception:
                self.tb = None

    def log(self, metrics, step=None):
        """metrics: flat dict of scalars (wandb.log parity)."""
        rec = {"t": time.time()}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            rec[k] = float(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.tb is not None and step is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), int(step))

    def add_scalar(self, tag, value, step):
        """SummaryWriter API parity (trainers.py:103-107)."""
        self.log({tag: value}, step=step)

    def close(self):
        self._fh.close()
        if self.tb is not None:
            self.tb.close()
