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
from ..utils import enable_compilation_cache
from ..utils.serialization import load_checkpoint


def main(argv=None, mesh=None):
    argv = sys.argv[1:] if argv is None else argv
    # allow_abbrev=False: parse_known_args must not prefix-match flags meant
    # for the main config parser (e.g. --resume would bind to --resume-torch)
    extra = argparse.ArgumentParser(allow_abbrev=False)
    extra.add_argument("--rerank", action="store_true")
    extra.add_argument("--resume-torch", default="",
                       help="reference-format torch .pth checkpoint "
                            "(CC save_checkpoint layout; loaded via "
                            "copy_state_dict semantics, "
                            "CC/clustercontrast/utils/serialization.py:41-61)")
    extra.add_argument("--dsbn", action="store_true",
                       help="checkpoint carries domain-specific BNs "
                            "(UDA; reference CC/examples/test.py:71-81)")
    extra.add_argument("--test-source", action="store_true",
                       help="evaluate with the SOURCE domain BN stats "
                            "(default: target)")
    ns, rest = extra.parse_known_args(argv)
    cfg = parse_config(rest, sections=("data", "model", "cluster", "train"))
    enable_compilation_cache()

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
    elif ns.resume_torch:
        variables = load_torch_reference_checkpoint(ns.resume_torch, variables)

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


def load_torch_reference_checkpoint(fpath, variables):
    """Load a reference-format torch ``.pth`` into the JAX model variables.

    Mirrors ``load_checkpoint`` + ``copy_state_dict(strip='module.')``
    (CC/examples/test.py:69-77): unwrap the ``state_dict`` key of the CC
    checkpoint dict, strip ``module.``, translate the ``base.N`` sequential
    layout and import with OIHW→HWIO / (out,in)→(in,out) transposes; the
    trainable GeM power ``gap.p`` is restored when present.
    """
    import numpy as np
    import torch

    from ..models.resnet import (
        import_torch_resnet,
        normalize_reference_state_dict,
    )

    raw = torch.load(fpath, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    sd, gem_p = normalize_reference_state_dict(sd)
    params, batch_stats, unmatched = import_torch_resnet(
        sd, variables["params"], variables["batch_stats"])
    if gem_p is not None and "gap" in params:
        params["gap"]["p"] = jnp.asarray(gem_p, jnp.float32).reshape(
            jnp.shape(params["gap"]["p"]))
    if unmatched:
        print(f"=> resume-torch: skipped {len(unmatched)} keys: "
              f"{unmatched[:8]}{'...' if len(unmatched) > 8 else ''}")
    print(f"=> Loaded reference torch checkpoint '{fpath}'")
    return {"params": params, "batch_stats": batch_stats}


if __name__ == "__main__":
    main()
