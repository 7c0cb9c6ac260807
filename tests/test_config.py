"""Config system tests (config.py)."""

import os

from reid_gan_tpu.config import Config, dump_config, parse_config


def test_defaults_match_reference_recipe():
    cfg = Config()
    # CC usl recipe defaults (CC/examples/cluster_contrast_train_usl.py)
    assert cfg.data.batch_size == 256
    assert cfg.data.num_instances == 16
    assert cfg.optim.lr == 3.5e-4
    assert cfg.cluster.k1 == 30 and cfg.cluster.k2 == 6
    assert cfg.cluster.temp == 0.05 and cfg.cluster.momentum == 0.2
    assert cfg.train.epochs == 50 and cfg.train.iters == 400


def test_cli_override():
    cfg = parse_config(["--batch-size", "64", "--eps", "0.5", "--use-hard",
                        "--arch", "resnet_ibn50a"])
    assert cfg.data.batch_size == 64
    assert cfg.cluster.eps == 0.5
    assert cfg.cluster.use_hard is True
    assert cfg.model.arch == "resnet_ibn50a"
    # untouched defaults survive
    assert cfg.train.iters == 400


def test_dump_config(tmp_path):
    cfg = Config()
    path = dump_config(cfg, str(tmp_path))
    assert os.path.exists(path)
    text = open(path).read()
    assert "data.batch_size: 256" in text
    assert text.startswith("------------ Options -------------")
