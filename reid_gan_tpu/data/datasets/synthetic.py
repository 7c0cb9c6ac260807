"""Synthetic dataset factory — the test fixture the reference lacks
(SURVEY.md §4.3): random images with Market-style filenames, plus synthetic
pose annotations in BOTH reference formats (keypoint CSV for the CC GAN
branch, per-image landmark ``.txt`` for FD-GAN), so every entry-point config
can run a debug epoch without real data.
"""

import json
import os
import os.path as osp

import numpy as np
from PIL import Image

from .base import BaseImageDataset
from .dir_datasets import scan_dir

NUM_KEYPOINTS = 18


def _random_keypoints(rng, h, w):
    """Plausible person keypoints: ~roughly vertical chain with jitter; a few
    randomly missing (-1)."""
    ys = np.linspace(0.1 * h, 0.9 * h, NUM_KEYPOINTS) + rng.randn(NUM_KEYPOINTS) * h * 0.03
    xs = w / 2 + rng.randn(NUM_KEYPOINTS) * w * 0.15
    ys = np.clip(ys, 0, h - 1).astype(int)
    xs = np.clip(xs, 0, w - 1).astype(int)
    missing = rng.rand(NUM_KEYPOINTS) < 0.1
    ys[missing] = -1
    xs[missing] = -1
    return ys, xs


class SyntheticDataset(BaseImageDataset):
    """Writes a small Market-style tree under ``root/synthetic`` on first use:

    - bounding_box_train/query/bounding_box_test with ``{pid}_c{cam}_{i}.jpg``
    - ``market-annotation-train.csv`` / ``-test.csv`` (``name:keypoints_y:keypoints_x``
      json-list columns, the pandas format of
      CC/clustercontrast/utils/data/preprocessor.py:77-78,193-199)
    - ``poses/{name}.txt`` FD-GAN landmark files (``y x`` per line,
      FD/reid/utils/data/preprocessor.py:100-112)
    """

    def __init__(self, root, num_ids=8, num_cams=3, imgs_per_id=4,
                 height=64, width=32, seed=0, verbose=False, **kwargs):
        self.dataset_dir = osp.join(root, "synthetic")
        self.train_dir = osp.join(self.dataset_dir, "bounding_box_train")
        self.query_dir = osp.join(self.dataset_dir, "query")
        self.gallery_dir = osp.join(self.dataset_dir, "bounding_box_test")
        self.train_pose_dir = osp.join(self.dataset_dir, "market-annotation-train.csv")
        self.test_pose_dir = osp.join(self.dataset_dir, "market-annotation-test.csv")
        self.poses_dir = osp.join(self.dataset_dir, "poses")
        self.height, self.width = height, width

        if not osp.exists(osp.join(self.dataset_dir, ".complete")):
            self._generate(num_ids, num_cams, imgs_per_id, height, width, seed)

        self.train = scan_dir(self.train_dir, relabel=True)
        self.query = scan_dir(self.query_dir, relabel=False)
        self.gallery = scan_dir(self.gallery_dir, relabel=False)
        if verbose:
            print("=> Synthetic loaded")
            self.print_dataset_statistics(self.train, self.query, self.gallery)
        self.num_train_pids, self.num_train_imgs, self.num_train_cams = (
            self.get_imagedata_info(self.train))

        self.pid_imgs = {}
        for fname, pid, _ in self.train:
            self.pid_imgs.setdefault(pid, set()).add(osp.basename(fname))

    def _generate(self, num_ids, num_cams, imgs_per_id, h, w, seed):
        rng = np.random.RandomState(seed)
        for d in (self.train_dir, self.query_dir, self.gallery_dir, self.poses_dir):
            os.makedirs(d, exist_ok=True)
        rows_train, rows_test = [], []
        # per-identity base color so features are somewhat id-clusterable
        base = rng.randint(0, 255, (num_ids, 3))
        for pid in range(1, num_ids + 1):
            for cam in range(1, num_cams + 1):
                for i in range(imgs_per_id):
                    img = (base[pid - 1][None, None] +
                           rng.randint(-40, 40, (h, w, 3))).clip(0, 255).astype(np.uint8)
                    name = f"{pid:04d}_c{cam}s1_{i:06d}_00.jpg"
                    if cam == 1 and i == 0:
                        subdir, rows = self.query_dir, rows_test
                    elif cam == num_cams and i == 0:
                        subdir, rows = self.gallery_dir, rows_test
                    else:
                        subdir, rows = self.train_dir, rows_train
                    Image.fromarray(img).save(osp.join(subdir, name), quality=90)
                    ys, xs = _random_keypoints(rng, h, w)
                    rows.append(f"{name}:{json.dumps(ys.tolist())}:{json.dumps(xs.tolist())}")
                    with open(osp.join(self.poses_dir, osp.splitext(name)[0] + ".txt"), "w") as f:
                        for y, x in zip(ys, xs):
                            f.write(f"{y} {x}\n")
        header = "name:keypoints_y:keypoints_x"
        with open(self.train_pose_dir, "w") as f:
            f.write("\n".join([header] + rows_train) + "\n")
        with open(self.test_pose_dir, "w") as f:
            f.write("\n".join([header] + rows_test) + "\n")
        with open(osp.join(self.dataset_dir, ".complete"), "w") as f:
            f.write("ok\n")
