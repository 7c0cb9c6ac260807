"""Synthetic end-to-end USL validation on real hardware.

Market-1501 is not available in this environment (no dataset, zero egress),
so the metric-regression check (SURVEY.md §4.5) runs on the synthetic
dataset: identities are color-separable, so a working USL loop must push mAP
well above chance within a few epochs. This script runs the REAL
cli.train_usl loop (clustering → memory → InfoNCE epochs → eval) and asserts
the learning signal.

    python scripts/validate_synthetic_usl.py /tmp/usl_check
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(root):
    from reid_gan_tpu.cli.train_usl import main as train_main

    best = train_main([
        "--dataset", "synthetic", "--data-dir", root,
        "--arch", "resnet18", "--height", "128", "--width", "64",
        "--batch-size", "64", "--num-instances", "4",
        "--epochs", "10", "--iters", "40",
        "--eps", "0.6", "--k1", "10", "--k2", "3",
        "--lr", "3.5e-4", "--eval-step", "2",
        "--workers", "2", "--logs-dir", root + "/logs",
    ])
    sys.stdout = sys.__stdout__
    print(f"FINAL best mAP: {best:.3f}")
    assert best > 0.5, f"USL loop failed to learn separable ids (mAP={best})"
    print("VALIDATION PASSED")


if __name__ == "__main__":
    import os

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/usl_check"
    os.makedirs(root, exist_ok=True)
    # larger synthetic set than the unit-test default
    from reid_gan_tpu.data.datasets import create

    create("synthetic", root, num_ids=24, num_cams=3, imgs_per_id=8)
    main(root)
