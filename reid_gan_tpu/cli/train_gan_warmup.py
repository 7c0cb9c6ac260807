"""Standalone GAN pretraining CLI.

The reference's run_code.sh invokes ``examples/train_gan_warmup.py``
(CC/run_code.sh:7-17) which does not exist in its tree (SURVEY.md §2.3 dead
code note); this provides the missing stage: pretrain the dual_gan engine on
GAN inputs alone via GANTrainer.train_gan (CC/clustercontrast/trainers.py:
273-335), saving per-net checkpoints consumable by the joint CLI through
``--continue-train``.

    python -m reid_gan_tpu.cli.train_gan_warmup --dataset market1501 \
        --data-dir ./data --model AE --model-gen AE
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dump_config, parse_config
from ..data import IterLoader
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..engine.gan_trainers import GANTrainer
from ..models.dual_gan.models import create_model as create_gan
from ..utils import Logger, enable_compilation_cache
from ..utils.serialization import load_networks, save_networks
from ..utils.visualizer import Visualizer


def main(argv=None, mesh=None):
    cfg = parse_config(argv, sections=("data", "model", "optim", "cluster", "train", "gan"))
    enable_compilation_cache()
    sys.stdout = Logger(osp.join(cfg.train.logs_dir, "log.txt"))
    dump_config(cfg, cfg.train.logs_dir)
    if mesh is False:      # explicit opt-out (tests, single-chip benchmarks)
        mesh = None
    elif mesh is None and jax.device_count() > 1:
        from ..parallel.mesh import get_mesh

        mesh = get_mesh()

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    gan = create_gan(cfg.gan, gan_height=cfg.data.gan_height,
                     gan_width=cfg.data.gan_width,
                     dtype=jnp.bfloat16 if cfg.train.fp16 else None)
    gan_state = gan.init_state(jax.random.PRNGKey(cfg.train.seed))
    save_dir = osp.join(cfg.gan.save_dir, cfg.gan.name)
    if cfg.gan.continue_train:
        nets = load_networks({"G": gan_state.G, "D": gan_state.D}, save_dir,
                             cfg.gan.which_epoch)
        gan_state = gan_state._replace(**nets)

    pose_file = getattr(dataset, "train_pose_dir", None)
    pre = Preprocessor(list(dataset.train), mode="only_gan",
                       gan_height=cfg.data.gan_height,
                       gan_width=cfg.data.gan_width,
                       pose_file=pose_file if cfg.gan.model_gen in
                       ("Pose", "PoseAE", "DPTN") else None)
    loader = DataLoader(pre, batch_size=cfg.data.batch_size, shuffle=True,
                        num_workers=cfg.data.workers, drop_last=True,
                        seed=cfg.train.seed)
    it = IterLoader(loader)
    it.new_epoch()
    trainer = GANTrainer(gan, print_freq=cfg.train.print_freq, mesh=mesh)
    visualizer = Visualizer(cfg.train.logs_dir, name=cfg.gan.name)

    epochs = 1 if cfg.train.debug else cfg.train.epochs
    iters = 4 if cfg.train.debug else (len(loader) or cfg.train.iters)
    for epoch in range(epochs):
        gan_state, errs = trainer.train_gan(gan_state, epoch, it,
                                            train_iters=iters,
                                            base_seed=cfg.train.seed)
        visualizer.print_current_errors(epoch, iters, errs)
        save_networks({"G": gan_state.G, "D": gan_state.D}, save_dir, "latest")
    return gan_state


if __name__ == "__main__":
    main()
