"""Decompose the USL train step's wall time on the real chip.

bench.py reports the full fused step (aug -> ResNet-50 fwd/bwd -> InfoNCE vs
a K=1024 bank -> Adam+wd -> sequential-equivalent bank fold) at batch 256
bf16. This times each sub-program separately at the same shapes, plus XLA
cost-analysis FLOPs per piece, so the step's MFU gap vs the eval forward
has measured owners (VERDICT r3 weak #3 / next #4).

Usage:  python scripts/profile_usl_step.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.engine.trainers import ClusterContrastTrainer
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.ops.cluster_memory import init_memory, memory_loss, update_memory
from reid_gan_tpu.ops.transforms import reid_augment

BATCH, H, W, K, D = 256, 256, 128, 1024, 2048


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / 1e9
    except Exception:
        return 0.0


def main():
    rng = np.random.RandomState(0)
    model = create_model("resnet50", norm=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((BATCH, H, W, 3)), train=True)
    centers = rng.randn(K, D).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    memory = init_memory(centers)
    img = jax.device_put(rng.randint(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    targets = jax.device_put(np.repeat(
        rng.choice(K, BATCH // 16, replace=False), 16).astype(np.int32))

    # -- pieces ------------------------------------------------------------
    @jax.jit
    def aug(img_u8):
        return reid_augment(jax.random.PRNGKey(0), img_u8, height=H, width=W,
                            train=True)

    x = aug(img)

    @jax.jit
    def fwd_eval(p, bs, xin):
        return model.apply({"params": p, "batch_stats": bs}, xin,
                           train=False)["feat"]

    @jax.jit
    def fwd_train(p, bs, xin):
        out, mut = model.apply({"params": p, "batch_stats": bs}, xin,
                               train=True, mutable=["batch_stats"])
        return out["feat"], mut["batch_stats"]

    @jax.jit
    def fwd_bwd(p, bs, xin):
        def loss_fn(params):
            out, mut = model.apply({"params": params, "batch_stats": bs},
                                   xin, train=True, mutable=["batch_stats"])
            losses, _ = memory_loss(out["feat"], targets, memory)
            return losses.mean(), (mut["batch_stats"], out["feat"])
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return loss, grads

    @jax.jit
    def bank_fold(feats):
        return update_memory(memory, feats, targets, momentum=0.2,
                             use_hard=True, group_size=16)

    feats, _ = fwd_train(variables["params"], variables["batch_stats"], x)

    rows = [
        ("aug (resize+crop+flip+erase+norm)", timeit(aug, img),
         flops_of(aug, img)),
        ("encoder fwd eval-mode", timeit(fwd_eval, variables["params"],
                                         variables["batch_stats"], x),
         flops_of(fwd_eval, variables["params"], variables["batch_stats"], x)),
        ("encoder fwd train-mode (BN stats)", timeit(
            fwd_train, variables["params"], variables["batch_stats"], x),
         flops_of(fwd_train, variables["params"], variables["batch_stats"], x)),
        ("fwd+bwd incl. InfoNCE", timeit(
            fwd_bwd, variables["params"], variables["batch_stats"], x),
         flops_of(fwd_bwd, variables["params"], variables["batch_stats"], x)),
        ("bank fold (K=1024, use_hard)", timeit(bank_fold, feats),
         flops_of(bank_fold, feats)),
    ]
    # full fused step LAST: its donated state consumes the `variables`
    # buffers, so every piece above must already be timed
    trainer = ClusterContrastTrainer(model, height=H, width=W, use_hard=True,
                                     iters_per_epoch=400, num_instances=16)
    state = trainer.init_state(variables, memory)
    state, loss = trainer._step(state, img, targets, np.int32(0))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = 30
    for i in range(iters):
        state, loss = trainer._step(state, img, targets, np.int32(i))
    jax.block_until_ready(loss)
    full_ms = (time.perf_counter() - t0) / iters * 1e3
    full_gf = flops_of(trainer._step, state, img, targets, np.int32(0))

    print(f"{'piece':45s} {'ms':>8s} {'GFLOP':>9s} {'TFLOP/s':>9s}")
    for name, ms, gf in rows:
        tf = gf / ms if ms > 0 else 0.0
        print(f"{name:45s} {ms:8.2f} {gf:9.1f} {tf:9.1f}")
    print(f"{'FULL fused step (aug+fwd/bwd+Adam+fold)':45s} {full_ms:8.2f} "
          f"{full_gf:9.1f} {full_gf / full_ms:9.1f}")
    print(f"imgs/s: {BATCH / full_ms * 1e3:.0f}")


if __name__ == "__main__":
    main()
