"""FD-GAN stage II/III adversarial training CLI
(parity: FD/train.py — pose-pair loader, FDGANModel.optimize_parameters per
iter, per-epoch lr decay, periodic net saves; stage given by --stage 1|2).

    python -m reid_gan_tpu.cli.fdgan_train --dataset synthetic --data-dir d \
        --stage 1 --debug
"""

import os.path as osp
import sys
import time

import jax
import numpy as np

from ..config import dump_config, parse_config
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..data.sampler import RandomPairSampler
from ..models.fdgan.model import FDGANModel
from ..utils import AverageMeter, Logger, enable_compilation_cache
from ..utils.serialization import load_networks, save_networks
from ..utils.visualizer import Visualizer


def main(argv=None, mesh=None):
    cfg = parse_config(argv, sections=("data", "model", "optim", "train", "gan", "fdgan"))
    enable_compilation_cache()
    sys.stdout = Logger(osp.join(cfg.train.logs_dir, "log.txt"))
    dump_config(cfg, cfg.train.logs_dir, "opt.txt")
    if mesh is False:      # explicit opt-out (tests, single-chip benchmarks)
        mesh = None
    elif mesh is None and jax.device_count() > 1:
        from ..parallel.mesh import get_mesh

        mesh = get_mesh()

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    h, w = cfg.data.height, cfg.data.width

    model = FDGANModel(cfg.fdgan, height=h, width=w,
                       depth=18 if cfg.train.debug else 50, mesh=mesh)
    state = model.init_state(jax.random.PRNGKey(cfg.train.seed))
    save_dir = osp.join(cfg.gan.save_dir, cfg.gan.name)
    if cfg.gan.continue_train:
        nets = load_networks({"E": state.E, "G": state.G, "Di": state.Di,
                              "Dp": state.Dp}, save_dir, cfg.gan.which_epoch)
        state = state._replace(**nets)

    pose_root = getattr(dataset, "poses_dir", None)
    pre = Preprocessor(list(dataset.train), mode="fdgan_pose", height=h, width=w,
                       pid_imgs=dataset.pid_imgs, pose_root=pose_root,
                       seed=cfg.train.seed)
    visualizer = Visualizer(cfg.train.logs_dir, name=cfg.gan.name)

    epochs = 1 if cfg.train.debug else cfg.fdgan.niter + cfg.fdgan.niter_decay
    for epoch in range(epochs):
        state = model.set_epoch_lr(state, epoch)
        sampler = RandomPairSampler(list(dataset.train), neg_pos_ratio=1,
                                    seed=cfg.train.seed + epoch)
        loader = DataLoader(pre, sampler=sampler, batch_size=cfg.data.batch_size,
                            num_workers=cfg.data.workers, drop_last=True)
        meters = {}
        errs_buf = []   # device scalars; one batched fetch per print window

        def drain(buf):
            for fetched in jax.device_get(buf):
                for k, v in fetched.items():
                    meters.setdefault(k, AverageMeter()).update(float(v))

        t0 = time.time()
        for i, (b1, b2) in enumerate(loader):
            if cfg.train.debug and i >= 2:
                break
            key = jax.random.PRNGKey(cfg.train.seed * 1000003 + epoch * 8191 + i)
            state, errors, _fake = model.optimize_step(state, b1, b2, key)
            errs_buf.append(errors)
            # per-iter visual dump cadence (parity: FD/train.py:81-83,
            # total_steps % opt.display_freq)
            if (i + 1) % cfg.gan.display_freq == 0:
                visualizer.display_current_results(
                    {"fake": np.asarray(_fake[0])}, epoch)
            if (i + 1) % cfg.train.print_freq == 0:
                drain(errs_buf)
                errs_buf = []
                msg = "  ".join(f"{k}: {m.avg:.3f}" for k, m in meters.items())
                print(f"Epoch {epoch} [{i + 1}]  {msg}  "
                      f"({time.time() - t0:.1f}s)")
        drain(errs_buf)
        errs_buf = []
        print(f"End of epoch {epoch} \t Time Taken: {time.time() - t0:.0f} sec")
        # visuals: input / fake / target grid (FD/fdgan/model.py:241-248)
        visualizer.display_current_results(
            {"fake": np.asarray(_fake[0])}, epoch)
        visualizer.print_current_errors(epoch, i + 1, errors=
                                        {k: m.avg for k, m in meters.items()},
                                        t=time.time() - t0)
        if (epoch + 1) % cfg.fdgan.save_step == 0 or epoch == epochs - 1:
            save_networks({"E": state.E, "G": state.G, "Di": state.Di,
                           "Dp": state.Dp}, save_dir, "latest")
    return state


if __name__ == "__main__":
    main()
