"""GAN pretraining CLI (the run_code.sh stage missing from the reference)."""

import sys


def test_train_gan_warmup_debug(tmp_path):
    from reid_gan_tpu.cli.train_gan_warmup import main

    state = main([
        "--dataset", "synthetic", "--data-dir", str(tmp_path),
        "--gan-height", "32", "--gan-width", "16",
        "--batch-size", "8", "--model", "AE", "--model-gen", "AE",
        "--workers", "2", "--debug",
        "--logs-dir", str(tmp_path / "logs"),
        "--save-dir", str(tmp_path / "ckpt"),
    ], mesh=False)
    sys.stdout = sys.__stdout__
    assert state is not None
    assert (tmp_path / "ckpt" / "experiment" / "latest_net_G.msgpack").exists()
    assert (tmp_path / "ckpt" / "experiment" / "latest_net_D.msgpack").exists()
