"""Joint GAN + unsupervised re-ID training CLI — the reference flagship
(parity: CC/examples/cluster_contrast_gan_train_usl_infomap.py).

Per epoch: infomap/dbscan pseudo-labels → memory → dispatch on flags
(warmup_epo → train_reid; gan_train → train_all; else train) → eval +
checkpoints → GAN save/lr/visuals (:440-520).

    python -m reid_gan_tpu.cli.train_gan_usl --dataset market1501 \
        --data-dir ./data --model AE --model-gen Pose --cluster-backend infomap
"""

import os.path as osp
import sys
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dump_config, parse_config
from ..data import IterLoader
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..engine.evaluators import Evaluator, FeatureExtractor
from ..engine.gan_trainers import ClusterContrastWithGANTrainer
from ..engine.trainers import ClusterContrastTrainer  # noqa: F401 (API parity)
from ..engine.usl import cluster_epoch, make_train_loader
from ..models import create as create_model
from ..models.dual_gan.models import create_model as create_gan
from ..ops.transforms import gan_input_transform
from ..utils import Logger, enable_compilation_cache
from ..utils.serialization import load_checkpoint, save_checkpoint, save_networks
from ..utils.visualizer import Visualizer


def compute_conf_weight(gan, gan_state, pseudo_dataset, memory, cfg,
                        pose_file=None):
    """GAN-reconstruction confidence weights: render each sample from its
    cluster centroid CONDITIONED ON ITS REAL POSE, block the top
    (N / num_instances) worst-reconstructed samples (parity:
    ...infomap.py:384-428 with get_gan_loader:166-186, which builds the
    only_gan loader with pose_file=dataset.train_pose_dir)."""
    from ..ops.pose import cords_to_map

    pre = Preprocessor(pseudo_dataset, mode="only_gan",
                       gan_height=cfg.data.gan_height,
                       gan_width=cfg.data.gan_width,
                       pose_file=pose_file)
    loader = DataLoader(pre, batch_size=cfg.data.batch_size, drop_last=False,
                        num_workers=cfg.data.workers)
    n = len(pseudo_dataset)
    rec = np.zeros(n, np.float32)
    t0 = time.time()
    gh, gw = cfg.data.gan_height, cfg.data.gan_width
    for batch in loader:
        xs = gan_input_transform(jnp.asarray(batch["Xs"]), gh, gw)
        pids = np.asarray(batch["pid"])
        feats = memory.features[jnp.asarray(pids)]
        if gan.model_gen == "Pose":
            h8, w8 = gh // 8, gw // 8
            fmap = jnp.broadcast_to(feats[:, None, None, :],
                                    (feats.shape[0], h8, w8, feats.shape[1]))
            # the sample's own posemap, rendered on device exactly as the
            # joint step does (engine/gan_trainers.py train_all)
            pm = jax.vmap(lambda c, o: cords_to_map(c, o, gh, gw))(
                jnp.asarray(batch["keypoints"]),
                jnp.asarray(batch["old_size"]))
            ps = jnp.transpose(pm, (0, 2, 3, 1))
            fake = gan.synthesize_p(gan_state.G, fmap, ps)
        else:
            fake = gan.apply_G(gan_state.G, xs)
        loss = gan.get_L1_loss(gan_state.D, fake, xs)
        rec[np.asarray(batch["index"])] = np.asarray(loss)
    conf = np.ones(n, np.float32)
    block_num = n // cfg.data.num_instances
    blocked = np.argsort(-rec)[:block_num]
    conf[blocked] = 0.0
    print(f"calculate confidence weight cost time: {time.time() - t0:.1f}")
    return conf


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
    pose_file = getattr(dataset, "train_pose_dir", None)

    feat_dim = 512 if any(d in cfg.model.arch for d in ("18", "34")) else 2048
    gan = create_gan(cfg.gan, gan_height=cfg.data.gan_height,
                     gan_width=cfg.data.gan_width, reid_feat_dim=feat_dim,
                     dtype=jnp.bfloat16 if cfg.train.fp16 else None)
    gan_state = gan.init_state(jax.random.PRNGKey(cfg.train.seed))
    save_dir = osp.join(cfg.gan.save_dir, cfg.gan.name)
    iter_path = osp.join(save_dir, "iter.txt")

    start_epoch = 0
    if cfg.gan.continue_train:
        # restore GAN nets + the epoch counter (parity:
        # ...infomap.py:249-259 restart_epoch from iter.txt)
        from ..utils.serialization import load_networks

        nets = load_networks({"G": gan_state.G, "D": gan_state.D}, save_dir,
                             cfg.gan.which_epoch)
        gan_state = gan_state._replace(**nets)
        if osp.isfile(iter_path):
            start_epoch = int(np.loadtxt(iter_path, delimiter=",",
                                         dtype=int).reshape(-1)[0])
            print(f"Resuming from epoch {start_epoch}")

    encoder = create_model(cfg.model.arch, norm=cfg.model.norm,
                           pooling_type=cfg.model.pooling_type,
                           dtype=jnp.bfloat16 if cfg.train.fp16 else None)
    dummy = jnp.zeros((2, cfg.data.height, cfg.data.width, 3))
    enc_vars = encoder.init(jax.random.PRNGKey(cfg.train.seed), dummy,
                            train=True)
    if cfg.train.resume:
        ckpt = load_checkpoint(cfg.train.resume,
                               target={"params": enc_vars["params"],
                                       "batch_stats": enc_vars["batch_stats"],
                                       "epoch": 0, "best_mAP": 0.0})
        enc_vars = {"params": ckpt["params"],
                    "batch_stats": ckpt["batch_stats"]}
        start_epoch = max(start_epoch, int(ckpt["epoch"]))

    extractor = FeatureExtractor(encoder, {"params": enc_vars["params"],
                                           "batch_stats": enc_vars["batch_stats"]},
                                 height=cfg.data.height, width=cfg.data.width,
                                 batch_size=cfg.data.batch_size, mesh=mesh,
                                 extra_features=cfg.gan.cluster_with_gan_features)
    evaluator = Evaluator(extractor)
    test_pre = Preprocessor(list(dataset.query) + list(dataset.gallery),
                            mode="reid", height=cfg.data.height,
                            width=cfg.data.width)
    test_loader = DataLoader(test_pre, batch_size=cfg.data.batch_size,
                             drop_last=False, num_workers=cfg.data.workers)

    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=cfg.data.height, width=cfg.data.width,
        temp=cfg.cluster.temp, momentum=cfg.cluster.momentum,
        use_hard=cfg.cluster.use_hard, lr=cfg.optim.lr,
        weight_decay=cfg.optim.weight_decay, step_size=cfg.optim.step_size,
        iters_per_epoch=cfg.train.iters, num_instances=cfg.data.num_instances,
        cl_temp=cfg.gan.cf_temp, mesh=mesh)
    visualizer = Visualizer(cfg.train.logs_dir, name=cfg.gan.name)

    epochs = 1 if cfg.train.debug else cfg.train.epochs
    iters = 8 if cfg.train.debug else cfg.train.iters
    state = None
    best_map = 0.0
    k_pad = cfg.cluster.max_clusters or None

    for epoch in range(start_epoch, epochs):
        variables = ({"params": enc_vars["params"],
                      "batch_stats": enc_vars["batch_stats"]} if state is None
                     else {"params": state.enc_params,
                           "batch_stats": state.enc_batch_stats})
        if mesh is not None:
            from ..parallel.mesh import replicate

            variables = replicate(mesh, variables)
        extractor.variables = variables
        memory, pseudo_dataset, num_clusters = cluster_epoch(
            extractor, dataset, list(dataset.train), cfg, k_pad=k_pad,
            backend=cfg.cluster.cluster_backend)
        k_pad = memory.features.shape[0]

        if state is None:
            state = trainer.init_state(variables, gan_state, memory)
        else:
            state = trainer.set_memory(state, memory)

        conf_weight = None
        if cfg.gan.cluster_with_gan_features and epoch > cfg.gan.warmup_epo:
            conf_weight = compute_conf_weight(gan, state.gan, pseudo_dataset,
                                              memory, cfg, pose_file)

        # mode dispatch (parity: ...infomap.py:450-466 bipath /
        # learnable_memory / gan_train / warmup flags)
        mode = "train_reid"
        pre_kw = {}
        loader_mode = "reid"
        if (epoch + 1) > cfg.gan.warmup_epo:
            loader_mode = "with_gan"
            pre_kw = {"gan_height": cfg.data.gan_height,
                      "gan_width": cfg.data.gan_width,
                      "pose_file": pose_file, "flip_all": True}
            if cfg.gan.gan_train:
                if cfg.gan.bipath:
                    mode = "train_all_bip"
                elif cfg.gan.learnable_memory:
                    mode = "train_all_with_memory"
                else:
                    mode = "train_all"
            else:
                mode = "train"
        loader = make_train_loader(pseudo_dataset, cfg.data.height,
                                   cfg.data.width, cfg.data.batch_size,
                                   cfg.data.num_instances,
                                   workers=cfg.data.workers, iters=iters,
                                   seed=cfg.train.seed + epoch,
                                   mode=loader_mode, **pre_kw)
        if mode == "train_all_with_memory":
            from ..ops.cluster_memory import init_gradient_memory

            gmem = init_gradient_memory(np.asarray(memory.features),
                                        k_pad=memory.features.shape[0])
            gmem = gmem._replace(num_valid=memory.num_valid)
            state, gmem, errs = trainer.run_epoch(
                state, epoch, loader, mode=mode, train_iters=iters,
                print_freq=cfg.train.print_freq, base_seed=cfg.train.seed,
                gmem=gmem, cluster_lr=cfg.gan.cluster_lr)
        else:
            state, errs = trainer.run_epoch(state, epoch, loader, mode=mode,
                                            train_iters=iters,
                                            print_freq=cfg.train.print_freq,
                                            base_seed=cfg.train.seed,
                                            conf_weight=conf_weight)

        if (epoch + 1) % cfg.train.eval_step == 0 or epoch == epochs - 1:
            eval_vars = {"params": state.enc_params,
                         "batch_stats": state.enc_batch_stats}
            if mesh is not None:
                from ..parallel.mesh import replicate

                eval_vars = replicate(mesh, eval_vars)
            extractor.variables = eval_vars
            mAP = evaluator.evaluate(test_loader, dataset.query,
                                     dataset.gallery, cmc_flag=False)
            is_best = mAP > best_map
            best_map = max(mAP, best_map)
            save_checkpoint({"params": state.enc_params,
                             "batch_stats": state.enc_batch_stats,
                             "epoch": epoch + 1, "best_mAP": best_map},
                            is_best,
                            osp.join(cfg.train.logs_dir, "checkpoint.msgpack"))
            print(f"\n * Finished epoch {epoch:3d}  model mAP: {mAP:5.1%} "
                  f" best: {best_map:5.1%}{' *' if is_best else ''}\n")

        if (epoch + 1) > cfg.gan.warmup_epo and cfg.gan.gan_train:
            save_networks({"G": state.gan.G, "D": state.gan.D}, save_dir,
                          "latest")
            np.savetxt(iter_path, [(epoch + 1, 0)], delimiter=",", fmt="%d")
            # LambdaLR linear decay after niter epochs
            niter = max(1, epochs // 2)
            mult = 1.0 - max(0, epoch + 2 - niter) / float(epochs - niter + 1)
            state = state._replace(
                gan=gan.set_epoch_lr(state.gan, max(mult, 0.0)))
            visualizer.print_current_errors(epoch, iters, errs)

    # final eval with the best checkpoint (parity: ...infomap.py:518-521)
    best_path = osp.join(cfg.train.logs_dir, "model_best.msgpack")
    if osp.isfile(best_path) and state is not None:
        print("==> Test with the best model:")
        best = load_checkpoint(best_path,
                               target={"params": state.enc_params,
                                       "batch_stats": state.enc_batch_stats,
                                       "epoch": 0, "best_mAP": 0.0})
        best_vars = {"params": best["params"],
                     "batch_stats": best["batch_stats"]}
        if mesh is not None:
            from ..parallel.mesh import replicate

            best_vars = replicate(mesh, best_vars)
        extractor.variables = best_vars
        evaluator.evaluate(test_loader, dataset.query, dataset.gallery,
                           cmc_flag=True)

    print("==> Training finished; best mAP {:5.1%}".format(best_map))
    return best_map


if __name__ == "__main__":
    main()
