"""Decompose the joint ``train_all`` step's wall time on the real chip.

Times (steady-state, per dispatch) each sub-program of the joint step at the
production shapes bench.py uses (batch 64, resnet50 bf16 @ 256x128, Pose
generator @ 128x64), plus XLA cost-analysis FLOPs for the full step, so the
"where do the 40 ms go" question has measured answers instead of predictions.

Usage:  python scripts/profile_joint_step.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.config import GANConfig
from reid_gan_tpu.engine.gan_trainers import ClusterContrastWithGANTrainer
from reid_gan_tpu.models import create as create_model
from reid_gan_tpu.models.dual_gan.ae_model import AEModel
from reid_gan_tpu.ops.cluster_memory import init_memory, memory_loss
from reid_gan_tpu.ops.transforms import reid_augment, gan_input_transform

BATCH, H, W, GH, GW, K = 64, 256, 128, 128, 64, 256


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.RandomState(1)
    encoder = create_model("resnet50", norm=True, dtype=jnp.bfloat16)
    enc_vars = encoder.init(jax.random.PRNGKey(0),
                            jnp.zeros((BATCH, H, W, 3)), train=True)
    gan = AEModel(GANConfig(model="AE", model_gen="Pose"), gan_height=GH,
                  gan_width=GW, reid_feat_dim=2048, dtype=jnp.bfloat16)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(K, 2048).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=H, width=W, iters_per_epoch=400, num_instances=4)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))

    img = jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    pid = jnp.asarray(np.repeat(rng.randint(0, K, BATCH // 4), 4), jnp.int32)
    xs_u8 = jnp.asarray(rng.randint(0, 256, (BATCH, GH, GW, 3),
                                    dtype=np.uint8))
    kp = jnp.asarray(rng.randint(0, 60, (BATCH, 18, 2)).astype(np.float32))
    osz = jnp.full((BATCH, 2), 64.0, jnp.float32)
    dev = {"img": img, "pid": pid, "Xs": xs_u8, "keypoints": kp,
           "old_size": osz}
    conf = jnp.ones(BATCH, jnp.float32)

    # ---- full jitted step
    step = jax.jit(trainer._make_train_all_step())
    full = timeit(lambda: step(state, dev, 3, conf)[1]["loss"])
    print(f"full train_all step: {full:8.2f} ms  "
          f"({BATCH / full * 1e3:,.0f} img/s)")

    lowered = jax.jit(trainer._make_train_all_step()).lower(
        state, dev, 3, conf)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"  XLA cost analysis: {flops / 1e9:.1f} GFLOP/step -> "
          f"{flops / (full * 1e-3) / 1e12:.1f} TFLOP/s achieved")

    # ---- pieces (each its own jit, steady state)
    x = reid_augment(jax.random.PRNGKey(0), img, height=H, width=W,
                     train=True)
    xs = gan_input_transform(xs_u8, GH, GW)

    enc_apply = jax.jit(lambda p, xx: encoder.apply(
        {"params": p, "batch_stats": enc_vars["batch_stats"]}, xx,
        train=True, mutable=["batch_stats"]))
    t = timeit(lambda: enc_apply(enc_vars["params"], x)[0]["feat"])
    print(f"encoder fwd (train): {t:8.2f} ms")

    def enc_loss(p, xx):
        out, _ = encoder.apply(
            {"params": p, "batch_stats": enc_vars["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"])
        return (out["feat"].astype(jnp.float32).sum()
                + out["gan_feat"].astype(jnp.float32).sum())
    enc_grad = jax.jit(jax.grad(enc_loss))
    t = timeit(lambda: enc_grad(enc_vars["params"], x))
    print(f"encoder fwd+bwd:     {t:8.2f} ms")

    f_gan0 = jnp.zeros((BATCH, 16, 8, 2048), jnp.bfloat16)
    ps = jnp.zeros((BATCH, GH, GW, 18), jnp.float32)

    g_fwd = jax.jit(lambda gp: gan.synthesize_p(
        {"params": gp, "batch_stats": gan_state.G["batch_stats"]},
        f_gan0, ps))
    t = timeit(lambda: g_fwd(gan_state.G["params"]))
    print(f"generator fwd:       {t:8.2f} ms")

    g_grad = jax.jit(jax.grad(lambda gp: gan.synthesize_p(
        {"params": gp, "batch_stats": gan_state.G["batch_stats"]},
        f_gan0, ps).astype(jnp.float32).sum()))
    t = timeit(lambda: g_grad(gan_state.G["params"]))
    print(f"generator fwd+bwd:   {t:8.2f} ms")

    fake0 = jnp.zeros((BATCH, GH, GW, 3), jnp.bfloat16)
    d_grad = jax.jit(jax.value_and_grad(
        lambda dp: gan.d_loss(dp, gan_state.D["batch_stats"], xs, fake0,
                              jax.random.PRNGKey(2))[0], ))
    t = timeit(lambda: d_grad(gan_state.D["params"]))
    print(f"D fwd+bwd:           {t:8.2f} ms")

    g_loss_fn = jax.jit(jax.grad(
        lambda fk: gan.get_loss_G(gan_state.D, fk, xs)))
    t = timeit(lambda: g_loss_fn(fake0))
    print(f"loss_G fwd+bwd(D):   {t:8.2f} ms")

    mem = init_memory(centers)
    f_out0 = jnp.zeros((BATCH, 2048), jnp.float32)
    mem_fn = jax.jit(jax.grad(
        lambda f: memory_loss(f, pid, mem, temp=0.05)[0].mean()))
    t = timeit(lambda: mem_fn(f_out0))
    print(f"memory loss f+b:     {t:8.2f} ms")

    aug_fn = jax.jit(lambda k: reid_augment(k, img, height=H, width=W,
                                            train=True))
    t = timeit(lambda: aug_fn(jax.random.PRNGKey(1)))
    print(f"reid_augment:        {t:8.2f} ms")


if __name__ == "__main__":
    main()
