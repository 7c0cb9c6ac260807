"""Synthetic end-to-end JOINT GAN + re-ID validation on real hardware.

Runs the flagship cli.train_gan_usl loop (clustering → memory → train_all:
joint InfoNCE + Pose-GAN adversarial step) for a few epochs on the synthetic
dataset and asserts (a) the reid branch learns the separable ids and (b) the
GAN losses stay finite and the per-net checkpoints land.

    python scripts/validate_synthetic_joint.py /tmp/joint_check
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(root):
    from reid_gan_tpu.cli.train_gan_usl import main as train_main

    best = train_main([
        "--dataset", "synthetic", "--data-dir", root,
        "--arch", "resnet18", "--height", "128", "--width", "64",
        "--gan-height", "64", "--gan-width", "32",
        "--batch-size", "32", "--num-instances", "4",
        "--epochs", "6", "--iters", "30",
        "--eps", "0.6", "--k1", "10", "--k2", "3",
        "--model", "AE", "--model-gen", "Pose",
        "--warmup-epo", "1",
        "--eval-step", "2", "--workers", "2",
        "--logs-dir", root + "/logs", "--save-dir", root + "/ckpt",
    ])
    sys.stdout = sys.__stdout__
    print(f"FINAL best mAP: {best:.3f}")
    assert best > 0.5, f"joint loop failed to learn (mAP={best})"
    assert osp.exists(root + "/ckpt/experiment/latest_net_G.msgpack")
    print("JOINT VALIDATION PASSED")


if __name__ == "__main__":
    import os

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/joint_check"
    os.makedirs(root, exist_ok=True)
    from reid_gan_tpu.data.datasets import create

    create("synthetic", root, num_ids=24, num_cams=3, imgs_per_id=8)
    main(root)
