"""FD-GAN stage-I supervised Siamese baseline CLI
(parity: FD/baseline.py — batch 256, SGD lr 0.01, step 40, 100 epochs,
CascadeEvaluator with verifier re-scoring).

    python -m reid_gan_tpu.cli.fdgan_baseline --dataset synthetic \
        --data-dir ./data --debug
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dump_config, parse_config
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..data.sampler import RandomPairSampler
from ..engine.evaluators import FeatureExtractor
from ..engine.fdgan import CascadeEvaluator, SiameseTrainer
from ..models import siamese_baseline
from ..models.embedding import EltwiseSubEmbed
from ..models.resnet import FDResNet
from ..utils import Logger, enable_compilation_cache
from ..utils.serialization import load_checkpoint, save_checkpoint


def main(argv=None, depth=50, mesh=None):
    cfg = parse_config(argv, sections=("data", "model", "optim", "train"))
    enable_compilation_cache()
    sys.stdout = Logger(osp.join(cfg.train.logs_dir, "log.txt"))
    dump_config(cfg, cfg.train.logs_dir, "opt.txt")
    if mesh is False:      # explicit opt-out (tests, single-chip benchmarks)
        mesh = None
    elif mesh is None and jax.device_count() > 1:
        from ..parallel.mesh import get_mesh

        mesh = get_mesh()

    if cfg.train.debug:
        depth = 18

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    model = siamese_baseline(depth=depth)
    h, w = cfg.data.height, cfg.data.width
    dummy = jnp.zeros((2, h, w, 3))
    variables = model.init(jax.random.PRNGKey(cfg.train.seed), dummy, dummy,
                           train=True)
    if cfg.train.resume:
        variables = load_checkpoint(cfg.train.resume, target=variables)

    nfeat = 2048 if depth >= 50 else 512
    base = FDResNet(depth=depth, cut_at_pooling=True)
    embed = EltwiseSubEmbed(nonlinearity="square", use_batch_norm=True,
                            use_classifier=True, num_features=nfeat,
                            num_classes=2)

    def make_evaluator(variables):
        ex = FeatureExtractor(base, {"params": variables["params"]["base_model"],
                                     "batch_stats": variables["batch_stats"]["base_model"]},
                              height=h, width=w, batch_size=cfg.data.batch_size,
                              dtype=jnp.float32, mesh=mesh)
        return CascadeEvaluator(
            ex, embed,
            variables["params"]["embed_model"],
            variables["batch_stats"]["embed_model"])

    test_pre = Preprocessor(list(dataset.query) + list(dataset.gallery),
                            mode="reid", height=h, width=w)
    test_loader = DataLoader(test_pre, batch_size=cfg.data.batch_size,
                             drop_last=False, num_workers=cfg.data.workers)
    rerank_topk = min(20 if cfg.train.debug else 100, len(dataset.gallery) - 1)

    if cfg.train.evaluate:
        return make_evaluator(variables).evaluate(
            test_loader, dataset.query, dataset.gallery,
            rerank_topk=rerank_topk, dataset=cfg.data.dataset)

    trainer = SiameseTrainer(model, lr=cfg.optim.lr, momentum=cfg.optim.momentum,
                             weight_decay=cfg.optim.weight_decay,
                             step_size=cfg.optim.step_size, mesh=mesh)
    state = trainer.init_state(variables)

    epochs = 1 if cfg.train.debug else cfg.train.epochs
    best_map = 0.0
    for epoch in range(epochs):
        sampler = RandomPairSampler(list(dataset.train), neg_pos_ratio=1,
                                    seed=cfg.train.seed + epoch)
        pre = Preprocessor(list(dataset.train), mode="pair", height=h, width=w,
                           seed=cfg.train.seed + epoch)
        loader = DataLoader(pre, sampler=sampler, batch_size=cfg.data.batch_size,
                            num_workers=cfg.data.workers, drop_last=True)
        if cfg.train.debug:
            loader = _limit(loader, 2)
        state, _ = trainer.train(state, epoch, loader,
                                 print_freq=cfg.train.print_freq,
                                 base_seed=cfg.train.seed)
        if epoch % cfg.train.eval_step == 0 or epoch == epochs - 1:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            _, mAP = make_evaluator(variables).evaluate(
                test_loader, dataset.query, dataset.gallery,
                rerank_topk=rerank_topk, dataset=cfg.data.dataset)
            is_best = mAP > best_map
            best_map = max(mAP, best_map)
            save_checkpoint(variables, is_best,
                            osp.join(cfg.train.logs_dir, "checkpoint.msgpack"))
            print(f"\n * Finished epoch {epoch:3d}  mAP: {mAP:5.1%} "
                  f"best: {best_map:5.1%}{' *' if is_best else ''}\n")
    return best_map


def _limit(loader, n):
    def gen():
        for i, b in enumerate(loader):
            if i >= n:
                break
            yield b
    return gen()


if __name__ == "__main__":
    main()
