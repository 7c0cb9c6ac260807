"""Skeleton rendering + visualizer tests."""

import numpy as np

from reid_gan_tpu.data.pose_viz import (
    draw_pose_from_cords,
    draw_pose_from_map,
    map_to_cord,
)
from reid_gan_tpu.utils.visualizer import Visualizer, tensor2im


def test_map_to_cord_peaks():
    m = np.zeros((32, 16, 18), np.float32)
    m[10, 5, 0] = 1.0
    m[20, 8, 3] = 0.9
    cords = map_to_cord(m)
    assert tuple(cords[0]) == (10, 5)
    assert tuple(cords[3]) == (20, 8)
    assert tuple(cords[1]) == (-1, -1)


def test_draw_pose():
    joints = np.full((18, 2), -1, np.int64)
    joints[0] = (5, 5)
    joints[1] = (15, 8)   # limb [1,2] missing; [1,0] present via LIMB_SEQ
    colors, mask = draw_pose_from_cords(joints, (32, 16))
    assert colors.shape == (32, 16, 3)
    assert mask.any()
    # joint disks are colored
    assert colors[5, 5].any() and colors[15, 8].any()


def test_draw_pose_from_map_roundtrip():
    m = np.zeros((32, 16, 18), np.float32)
    m[10, 5, 0] = 1.0
    colors, mask = draw_pose_from_map(m)
    assert mask[10, 5]


def test_visualizer_html(tmp_path):
    import os.path as osp

    viz = Visualizer(str(tmp_path), name="t")
    visuals = {"fake": np.zeros((8, 4, 3), np.float32),
               "posemap": np.random.rand(8, 4, 18).astype(np.float32)}
    viz.display_current_results(visuals, epoch=0)
    viz.print_current_errors(0, 10, {"G": 1.0, "D": 0.5})
    assert osp.exists(tmp_path / "index.html")
    assert osp.exists(tmp_path / "images" / "epoch000_fake.png")
    log = open(tmp_path / "loss_log.txt").read()
    assert "G: 1.000" in log


def test_tensor2im_modes():
    x = np.zeros((4, 4, 3), np.float32)
    assert tensor2im(x, "tanh").mean() == 127  # (0+1)/2 → 127.5 → clip int
    pose = np.random.rand(1, 4, 4, 18).astype(np.float32)
    out = tensor2im(pose, "tanh")
    assert out.shape == (4, 4, 3)
