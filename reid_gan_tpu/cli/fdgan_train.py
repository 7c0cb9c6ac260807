"""FD-GAN stage II/III adversarial training CLI
(parity: FD/train.py — pose-pair loader, FDGANModel.optimize_parameters per
iter, per-epoch lr decay, periodic net saves; stage given by --stage 1|2).

For stage≠1 the reference INTENDS a CascadeEvaluator pass every
``eval_step`` epochs with best-model tracking (FD/train.py:96-103) — as
shipped it crashes on an undefined ``val_loader``, so the intent is
implemented here: evaluate on the dataset's val split (query/gallery when no
val split exists), save ``best_net_*`` on improvement, and re-test with the
best encoder at the end (FD/train.py:110-116).

    python -m reid_gan_tpu.cli.fdgan_train --dataset synthetic --data-dir d \
        --stage 1 --debug
"""

import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dump_config, parse_config
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..data.sampler import RandomPairSampler
from ..engine.evaluators import FeatureExtractor
from ..engine.fdgan import CascadeEvaluator
from ..models.embedding import EltwiseSubEmbed
from ..models.fdgan.model import FDGANModel
from ..models.resnet import FDResNet
from ..utils import AverageMeter, Logger, enable_compilation_cache
from ..utils.serialization import load_networks, save_networks
from ..utils.visualizer import Visualizer


def _make_evaluator(cfg, state, depth, mesh):
    """CascadeEvaluator over net_E (base features + verifier re-scoring),
    mirroring FD/train.py:55-58's evaluator built from model.net_E's
    base_model/embed_model halves. Built ONCE per run — both stages are
    jitted with variables as traced arguments, so later evals swap weights
    via set_variables() with no recompilation."""
    nfeat = 2048 if depth >= 50 else 512
    base = FDResNet(depth=depth, cut_at_pooling=True)
    embed = EltwiseSubEmbed(nonlinearity="square", use_batch_norm=True,
                            use_classifier=True, num_features=nfeat,
                            num_classes=2)
    ex = FeatureExtractor(
        base, {"params": state.E["params"]["base_model"],
               "batch_stats": state.E["batch_stats"]["base_model"]},
        height=cfg.data.height, width=cfg.data.width,
        batch_size=cfg.data.batch_size, dtype=jnp.float32, mesh=mesh)
    return CascadeEvaluator(ex, embed,
                            state.E["params"]["embed_model"],
                            state.E["batch_stats"]["embed_model"])


def _sync_evaluator(evaluator, state):
    """Point the shared evaluator at the current net_E weights."""
    evaluator.set_variables(
        {"params": state.E["params"]["base_model"],
         "batch_stats": state.E["batch_stats"]["base_model"]},
        state.E["params"]["embed_model"],
        state.E["batch_stats"]["embed_model"])


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

    depth = 18 if cfg.train.debug else 50
    model = FDGANModel(cfg.fdgan, height=h, width=w, depth=depth, mesh=mesh)
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

    # stage≠1: periodic re-ID validation with best tracking (the intent of
    # FD/train.py:96-103 — its shipped val_loader is an undefined name).
    # Datasets without a val split (dir-style) validate on query/gallery.
    val_query = val_gallery = val_loader = evaluator = None
    best_mAP = 0.0
    if cfg.fdgan.stage != 1:
        evaluator = _make_evaluator(cfg, state, depth, mesh)
        val = list(getattr(dataset, "val", None) or [])
        val_query = val_gallery = val
        if not val:
            val_query = list(dataset.query)
            val_gallery = list(dataset.gallery)
        val_pre = Preprocessor(sorted(set(val_query) | set(val_gallery)),
                               mode="reid", height=h, width=w)
        val_loader = DataLoader(val_pre, batch_size=cfg.data.batch_size,
                                drop_last=False, num_workers=cfg.data.workers)
        if not cfg.train.debug:
            # baseline test runs on the TEST split, like the reference's
            # test_loader pass (FD/train.py:60-64 evaluates
            # dataset.query/dataset.gallery before training starts)
            print("Test with baseline model:")
            test_pre = Preprocessor(list(dataset.query) + list(dataset.gallery),
                                    mode="reid", height=h, width=w)
            test_loader = DataLoader(test_pre, batch_size=cfg.data.batch_size,
                                     drop_last=False,
                                     num_workers=cfg.data.workers)
            evaluator.evaluate(
                test_loader, list(dataset.query), list(dataset.gallery),
                rerank_topk=min(75, len(dataset.gallery) - 1),
                dataset=cfg.data.dataset)

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
        if val_loader is not None and (epoch + 1) % cfg.fdgan.eval_step == 0:
            # periodic val eval + best tracking (FD/train.py:96-103 intent);
            # same evaluator object — no re-jit, just fresh weights
            _sync_evaluator(evaluator, state)
            mAP = evaluator.evaluate(
                val_loader, val_query, val_gallery,
                rerank_topk=min(75, len(val_gallery) - 1), top1=False)
            is_best = mAP > best_mAP
            best_mAP = max(mAP, best_mAP)
            if is_best:
                save_networks({"E": state.E, "G": state.G, "Di": state.Di,
                               "Dp": state.Dp}, save_dir, "best")
            print(f"\n * Finished epoch {epoch:3d}  mAP: {mAP:5.1%}  "
                  f"best: {best_mAP:5.1%}{' *' if is_best else ''}\n")

    if val_loader is not None and not cfg.train.debug and best_mAP > 0.0:
        # final test with the best encoder (FD/train.py:110-116)
        print("Test with best model:")
        best = load_networks({"E": state.E}, save_dir, "best")
        state = state._replace(**best)
        test_pre = Preprocessor(list(dataset.query) + list(dataset.gallery),
                                mode="reid", height=h, width=w)
        test_loader = DataLoader(test_pre, batch_size=cfg.data.batch_size,
                                 drop_last=False, num_workers=cfg.data.workers)
        _sync_evaluator(evaluator, state)
        evaluator.evaluate(
            test_loader, list(dataset.query), list(dataset.gallery),
            rerank_topk=min(100, len(dataset.gallery) - 1),
            dataset=cfg.data.dataset)
    return state


if __name__ == "__main__":
    main()
