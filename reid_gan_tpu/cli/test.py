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


def main(argv=None, mesh=None):
    argv = sys.argv[1:] if argv is None else argv
    extra = argparse.ArgumentParser()
    extra.add_argument("--rerank", action="store_true")
    extra.add_argument("--dsbn", action="store_true",
                       help="checkpoint carries domain-specific BNs "
                            "(UDA; reference CC/examples/test.py:71-81)")
    extra.add_argument("--test-source", action="store_true",
                       help="evaluate with the SOURCE domain BN stats "
                            "(default: target)")
    ns, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest, sections=("data", "model", "cluster", "train"))

    dataset = create_dataset(cfg.data.dataset, cfg.data.data_dir, verbose=True)
    model = create_model(cfg.model.arch, num_features=cfg.model.features,
                         norm=cfg.model.norm, pooling_type=cfg.model.pooling_type)
    dummy = jnp.zeros((2, cfg.data.height, cfg.data.width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=True)
    if cfg.train.resume and ns.dsbn:
        # DSBN checkpoint: per-domain BN copies; pick source/target at eval
        # (parity: CC/examples/test.py:71-81 convert_dsbn → convert_bn)
        from ..models.dsbn import convert_bn, convert_dsbn

        print("==> Load the model with domain-specific BNs")
        target = {"dsbn": convert_dsbn({"params": variables["params"],
                                        "batch_stats": variables["batch_stats"]}),
                  "epoch": 0, "best_mAP": 0.0}
        ckpt = load_checkpoint(cfg.train.resume, target=target)
        print("==> Test with {}-domain BNs".format(
            "source" if ns.test_source else "target"))
        variables = convert_bn(ckpt["dsbn"], use_target=not ns.test_source)
    elif cfg.train.resume:
        ckpt = load_checkpoint(cfg.train.resume,
                               target={"params": variables["params"],
                                       "batch_stats": variables["batch_stats"],
                                       "epoch": 0, "best_mAP": 0.0})
        variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    if mesh is False:      # explicit opt-out (tests, single-chip benchmarks)
        mesh = None
    elif mesh is None and jax.device_count() > 1:
        from ..parallel.mesh import get_mesh

        mesh = get_mesh()
    extractor = FeatureExtractor(model, {"params": variables["params"],
                                         "batch_stats": variables["batch_stats"]},
                                 height=cfg.data.height, width=cfg.data.width,
                                 batch_size=cfg.data.batch_size, mesh=mesh)
    pre = Preprocessor(list(dataset.query) + list(dataset.gallery), mode="reid",
                       height=cfg.data.height, width=cfg.data.width)
    loader = DataLoader(pre, batch_size=cfg.data.batch_size, drop_last=False,
                        num_workers=cfg.data.workers)
    return Evaluator(extractor).evaluate(loader, dataset.query, dataset.gallery,
                                         cmc_flag=True, rerank=ns.rerank)


if __name__ == "__main__":
    main()
