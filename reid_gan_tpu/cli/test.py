"""Eval-only CLI (parity: CC/examples/test.py:57-89):
load a checkpoint → mAP/CMC with optional re-ranking.

    python -m reid_gan_tpu.cli.test --dataset market1501 --data-dir ./data \
        --resume logs/model_best.msgpack [--rerank]
"""

import argparse
import sys

import jax
import jax.numpy as jnp

from ..config import parse_config
from ..data.datasets import create as create_dataset
from ..data.loader import DataLoader, Preprocessor
from ..engine.evaluators import Evaluator, FeatureExtractor
from ..models import create as create_model
from ..utils.serialization import load_checkpoint


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    extra = argparse.ArgumentParser()
    extra.add_argument("--rerank", action="store_true")
    ns, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest)

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    model = create_model(cfg.model.arch, num_features=cfg.model.features,
                         norm=cfg.model.norm, pooling_type=cfg.model.pooling_type)
    dummy = jnp.zeros((2, cfg.data.height, cfg.data.width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=True)
    if cfg.train.resume:
        ckpt = load_checkpoint(cfg.train.resume,
                               target={"params": variables["params"],
                                       "batch_stats": variables["batch_stats"],
                                       "epoch": 0, "best_mAP": 0.0})
        variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    extractor = FeatureExtractor(model, {"params": variables["params"],
                                         "batch_stats": variables["batch_stats"]},
                                 height=cfg.data.height, width=cfg.data.width,
                                 batch_size=cfg.data.batch_size)
    pre = Preprocessor(list(dataset.query) + list(dataset.gallery), mode="reid",
                       height=cfg.data.height, width=cfg.data.width)
    loader = DataLoader(pre, batch_size=cfg.data.batch_size, drop_last=False,
                        num_workers=cfg.data.workers)
    return Evaluator(extractor).evaluate(loader, dataset.query, dataset.gallery,
                                         cmc_flag=True, rerank=ns.rerank)


if __name__ == "__main__":
    main()
