"""End-to-end USL smoke test: the full per-epoch loop (extract → Jaccard →
DBSCAN → memory → contrastive iters → eval → checkpoint) on synthetic data
(SURVEY.md §4.3 integration tests)."""

import os.path as osp
import sys

import pytest


def test_train_usl_debug_epoch(tmp_path):
    from reid_gan_tpu.cli.train_usl import main

    logs = tmp_path / "logs"
    best = main([
        "--dataset", "synthetic",
        "--data-dir", str(tmp_path),
        "--arch", "resnet18",
        "--height", "64", "--width", "32",
        "--batch-size", "16", "--num-instances", "4",
        "--eps", "0.7", "--k1", "8", "--k2", "3",
        "--workers", "2",
        "--eval-step", "1",
        "--debug",
        "--logs-dir", str(logs),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    assert 0.0 <= best <= 1.0
    assert osp.exists(logs / "checkpoint.msgpack")
    assert osp.exists(logs / "log.txt")
    assert osp.exists(logs / "train_opt.txt")


def test_eval_cli_on_checkpoint(tmp_path):
    from reid_gan_tpu.cli.train_usl import main as train_main
    from reid_gan_tpu.cli.test import main as test_main

    logs = tmp_path / "logs"
    train_main([
        "--dataset", "synthetic", "--data-dir", str(tmp_path),
        "--arch", "resnet18", "--height", "64", "--width", "32",
        "--batch-size", "16", "--num-instances", "4",
        "--eps", "0.7", "--k1", "8", "--k2", "3", "--workers", "2",
        "--eval-step", "1", "--debug", "--logs-dir", str(logs),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    scores, mAP = test_main([
        "--dataset", "synthetic", "--data-dir", str(tmp_path),
        "--arch", "resnet18", "--height", "64", "--width", "32",
        "--batch-size", "16", "--workers", "2",
        "--resume", str(logs / "checkpoint.msgpack"),
    ], mesh=False)
    assert 0.0 <= mAP <= 1.0
    assert scores.shape == (100,)
