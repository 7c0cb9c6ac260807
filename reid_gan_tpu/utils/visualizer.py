"""Training visualizer: PNG image grids + self-contained HTML gallery +
loss_log.txt.

Replaces the reference's visdom/dominate stack (FD/fdgan/utils/visualizer.py,
CC/dual_gan/gan_visualizer.py:11-180, html.py) with a dependency-free writer:
every display step dumps the current visuals as PNGs under
``<dir>/images/`` and regenerates ``index.html`` (newest epoch first);
losses append to ``loss_log.txt`` (parity: gan_visualizer print_current_errors).
"""

import os
import os.path as osp
import time

import numpy as np
from PIL import Image

from .osutils import mkdir_if_missing


def tensor2im(t, norm="tanh"):
    """Device image → HWC uint8. 'tanh': [-1,1] → [0,255]
    (CC/dual_gan/gan_util.py tensor2im); 'imagenet': de-normalize."""
    arr = np.asarray(t, np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if norm == "tanh":
        arr = (arr + 1.0) / 2.0
    elif norm == "imagenet":
        arr = arr * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    elif arr.shape[-1] not in (1, 3):  # e.g. 18-ch pose map → max projection
        arr = np.clip(arr.max(axis=-1, keepdims=True), 0, 1)
        arr = np.repeat(arr, 3, axis=-1)
    return (np.clip(arr, 0, 1) * 255).astype(np.uint8)


class Visualizer:
    def __init__(self, log_dir, name="experiment"):
        self.dir = log_dir
        self.name = name
        self.img_dir = osp.join(log_dir, "images")
        mkdir_if_missing(self.img_dir)
        self.loss_log = osp.join(log_dir, "loss_log.txt")
        with open(self.loss_log, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) "
                    f"================\n")
        self._epochs = []

    def display_current_results(self, visuals, epoch, norms=None):
        """visuals: OrderedDict label → image array
        (parity: gan_visualizer.py:35-82)."""
        norms = norms or {}
        labels = []
        for label, img in visuals.items():
            im = tensor2im(img, norms.get(label, "tanh"))
            Image.fromarray(im).save(
                osp.join(self.img_dir, f"epoch{epoch:03d}_{label}.png"))
            labels.append(label)
        if epoch not in self._epochs:
            self._epochs.append(epoch)
        self._write_html(labels)

    def print_current_errors(self, epoch, i, errors, t=0.0):
        msg = f"(epoch: {epoch}, iters: {i}, time: {t:.3f}) " + " ".join(
            f"{k}: {float(v):.3f}" for k, v in errors.items())
        print(msg)
        with open(self.loss_log, "a") as f:
            f.write(msg + "\n")

    def _write_html(self, labels):
        rows = []
        for epoch in sorted(self._epochs, reverse=True):
            cells = "".join(
                f"<td><img src='images/epoch{epoch:03d}_{l}.png' width=128>"
                f"<br>{l}</td>" for l in labels)
            rows.append(f"<tr><td>epoch {epoch}</td>{cells}</tr>")
        html = ("<html><head><title>{}</title></head><body><table border=1>"
                "{}</table></body></html>").format(self.name, "\n".join(rows))
        with open(osp.join(self.dir, "index.html"), "w") as f:
            f.write(html)
