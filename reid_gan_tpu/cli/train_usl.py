"""Unsupervised cluster-contrast training CLI.

Parity: CC/examples/cluster_contrast_train_usl.py (DBSCAN backend) and
cluster_contrast_train_usl_infomap.py (--cluster-backend infomap). Run:

    python -m reid_gan_tpu.cli.train_usl --dataset market1501 --data-dir ./data \
        --arch resnet_ibn50a --use-hard --eps 0.4

Per-epoch flow and defaults follow the reference recipe (see config.py).
"""

import os
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dump_config, parse_config
from ..data.loader import DataLoader, Preprocessor
from ..engine.evaluators import Evaluator, FeatureExtractor
from ..engine.trainers import ClusterContrastTrainer
from ..engine.usl import cluster_epoch, make_train_loader
from ..models import create as create_model
from ..parallel.mesh import get_mesh
from ..utils import Logger, enable_compilation_cache
from ..utils.serialization import load_checkpoint, save_checkpoint
from ..data.datasets import create as create_dataset


def main(argv=None, mesh=None):
    cfg = parse_config(argv, sections=("data", "model", "optim", "cluster", "train"))
    start = time.monotonic()
    enable_compilation_cache()
    sys.stdout = Logger(osp.join(cfg.train.logs_dir, "log.txt"))
    dump_config(cfg, cfg.train.logs_dir)
    print("==> Config written; starting USL training")

    if mesh is False:      # explicit opt-out (tests, single-chip benchmarks)
        mesh = None
    elif mesh is None and jax.device_count() > 1:
        mesh = get_mesh()

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    model = create_model(cfg.model.arch, num_features=cfg.model.features,
                         norm=cfg.model.norm, dropout=cfg.model.dropout,
                         pooling_type=cfg.model.pooling_type,
                         dtype=jnp.bfloat16 if cfg.train.fp16 else None)
    dummy = jnp.zeros((2, cfg.data.height, cfg.data.width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.train.seed), dummy, train=True)
    start_epoch = 0
    if cfg.train.resume:
        ckpt = load_checkpoint(cfg.train.resume,
                               target={"params": variables["params"],
                                       "batch_stats": variables["batch_stats"],
                                       "epoch": 0, "best_mAP": 0.0})
        variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
        start_epoch = int(ckpt["epoch"])
        print(f"=> Resumed from epoch {start_epoch} "
              f"(best mAP {float(ckpt['best_mAP']):.1%})")

    extractor = FeatureExtractor(model, {"params": variables["params"],
                                         "batch_stats": variables["batch_stats"]},
                                 height=cfg.data.height, width=cfg.data.width,
                                 batch_size=cfg.data.batch_size, mesh=mesh)
    evaluator = Evaluator(extractor)
    test_pre = Preprocessor(list(dataset.query) + list(dataset.gallery),
                            mode="reid", height=cfg.data.height, width=cfg.data.width)
    test_loader = DataLoader(test_pre, batch_size=cfg.data.batch_size,
                             drop_last=False, num_workers=cfg.data.workers)

    if cfg.train.evaluate:
        evaluator.evaluate(test_loader, dataset.query, dataset.gallery, cmc_flag=True)
        return

    trainer = ClusterContrastTrainer(
        model, height=cfg.data.height, width=cfg.data.width,
        temp=cfg.cluster.temp, momentum=cfg.cluster.momentum,
        use_hard=cfg.cluster.use_hard, lr=cfg.optim.lr,
        weight_decay=cfg.optim.weight_decay, step_size=cfg.optim.step_size,
        iters_per_epoch=cfg.train.iters,
        num_instances=cfg.data.num_instances, mesh=mesh)

    epochs = 1 if cfg.train.debug else cfg.train.epochs
    iters = 8 if cfg.train.debug else cfg.train.iters
    state = None
    best_map = 0.0
    # pad the bank so cluster-count drift doesn't retrace the step
    k_pad = cfg.cluster.max_clusters or None

    for epoch in range(start_epoch, epochs):
        # keep the extractor looking at current weights
        extractor.variables = {"params": variables["params"] if state is None
                               else state.params,
                               "batch_stats": variables["batch_stats"] if state is None
                               else state.batch_stats}
        if mesh is not None:
            from ..parallel.mesh import replicate
            extractor.variables = replicate(mesh, extractor.variables)

        memory, pseudo_dataset, num_clusters = cluster_epoch(
            extractor, dataset, list(dataset.train), cfg, k_pad=k_pad)
        k_pad = memory.features.shape[0]  # sticky: avoid re-tracing later epochs

        if state is None:
            state = trainer.init_state(variables, memory)
        else:
            state = trainer.set_memory(state, memory)

        loader = make_train_loader(pseudo_dataset, cfg.data.height, cfg.data.width,
                                   cfg.data.batch_size, cfg.data.num_instances,
                                   workers=cfg.data.workers, iters=iters,
                                   seed=cfg.train.seed + epoch)
        state, _ = trainer.train(state, epoch, loader, train_iters=iters,
                                 print_freq=cfg.train.print_freq,
                                 base_seed=cfg.train.seed)

        if (epoch + 1) % cfg.train.eval_step == 0 or epoch == epochs - 1:
            eval_vars = {"params": state.params,
                         "batch_stats": state.batch_stats}
            if mesh is not None:
                from ..parallel.mesh import replicate
                eval_vars = replicate(mesh, eval_vars)
            extractor.variables = eval_vars
            mAP = evaluator.evaluate(test_loader, dataset.query, dataset.gallery,
                                     cmc_flag=False)
            is_best = mAP > best_map
            best_map = max(mAP, best_map)
            save_checkpoint({"params": state.params,
                             "batch_stats": state.batch_stats,
                             "epoch": epoch + 1, "best_mAP": best_map},
                            is_best,
                            osp.join(cfg.train.logs_dir, "checkpoint.msgpack"))
            print(f"\n * Finished epoch {epoch:3d}  model mAP: {mAP:5.1%} "
                  f" best: {best_map:5.1%}{' *' if is_best else ''}\n")

    # final full-CMC eval with the best checkpoint (parity:
    # ...infomap.py:518-521 'Test with the best model')
    best_path = osp.join(cfg.train.logs_dir, "model_best.msgpack")
    if osp.isfile(best_path) and state is not None:
        print("==> Test with the best model:")
        best = load_checkpoint(best_path,
                               target={"params": state.params,
                                       "batch_stats": state.batch_stats,
                                       "epoch": 0, "best_mAP": 0.0})
        best_vars = {"params": best["params"],
                     "batch_stats": best["batch_stats"]}
        if mesh is not None:
            from ..parallel.mesh import replicate
            best_vars = replicate(mesh, best_vars)
        extractor.variables = best_vars
        evaluator.evaluate(test_loader, dataset.query, dataset.gallery,
                           cmc_flag=True)

    dt = time.monotonic() - start
    print(f"Total running time: {dt / 3600:.0f}h {dt % 3600 / 60:.0f}m {dt % 60:.0f}s")
    return best_map


if __name__ == "__main__":
    main()
