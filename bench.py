"""Headline benchmark suite, run on one real TPU chip by the driver.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
The primary metric stays ResNet-50 feature-extraction throughput (baseline:
the reference extracts at ≈1,950 img/s on its GPU — CC/examples/logs/
log.txt:17, 0.13 s / 256-image batch; driver target ≥5,000 img/s/chip).
``extra`` carries the rest of the perf surface so round-over-round numbers
are driver-visible:

- usl_train_imgs_per_sec      — full USL train step (aug → ResNet-50 fwd/bwd
                                → InfoNCE vs a 1,024-cluster bank → Adam →
                                sequential bank fold), bf16, batch 256.
                                Reference: 0.36 s/iter @ 256 ≈ 710 img/s
                                (CC/examples/logs/log.txt).
- joint_gan_train_imgs_per_sec — flagship ``train_all`` joint step (encoder +
                                Pose generator + ResDiscriminator + conf-
                                weighted memory loss + bank update).
                                No reference wall-clock exists in the logs;
                                tracked round-over-round.

All progress chatter goes to stderr; stdout carries exactly the JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 1950.0
BASELINE_TRAIN_IMGS_PER_SEC = 710.0


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _program_flops(jitted, *args):
    """XLA cost-analysis FLOPs of one compiled program invocation (0.0 when
    the backend doesn't expose cost analysis). Used to report achieved
    TFLOP/s next to every img/s headline (VERDICT r3 weak #3)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:   # pragma: no cover - backend-dependent
        _log(f"  cost_analysis unavailable: {e!r}")
        return 0.0


def _tflops(flops_per_batch, imgs_per_sec, batch):
    return round(flops_per_batch * imgs_per_sec / batch / 1e12, 2)


def _time_loop(fn, iters, *args):
    fn(*args)  # warmup beyond the caller's compile call
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def bench_extraction(batch=256, height=256, width=128, iters=40):
    """Production eval path: uint8 → fused resize/normalize → ResNet-50
    (GeM, last-stride-1) → L2-normalized features, bf16 on the MXU."""
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.ops.transforms import reid_augment

    model = create_model("resnet50")
    img0 = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def fwd(variables, img_u8):
        x = reid_augment(jax.random.PRNGKey(0), img_u8, height=height,
                         width=width, train=False)
        out = model.apply(variables, x.astype(jnp.bfloat16), train=False)
        return out["feat"].astype(jnp.float32)

    rng = np.random.RandomState(0)
    img = jax.device_put(rng.randint(0, 256, (batch, height, width, 3),
                                     dtype=np.uint8))
    fwd(variables, img).block_until_ready()   # compile
    flops = _program_flops(fwd, variables, img)
    dt = _time_loop(fwd, iters, variables, img)
    return batch * iters / dt, flops


def bench_usl_train(batch=256, height=256, width=128, k=1024, iters=20):
    """One full USL train step at the flagship recipe's shapes, bf16 compute
    (the CLI's --fp16 path: cli/train_usl.py:44-47)."""
    from reid_gan_tpu.engine.trainers import ClusterContrastTrainer
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.ops.cluster_memory import init_memory

    rng = np.random.RandomState(0)
    model = create_model("resnet50", norm=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((batch, height, width, 3)), train=True)
    centers = rng.randn(k, 2048).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastTrainer(model, height=height, width=width,
                                     use_hard=True, iters_per_epoch=400,
                                     num_instances=16)
    state = trainer.init_state(variables, init_memory(centers))

    img = jax.device_put(rng.randint(0, 256, (batch, height, width, 3),
                                     dtype=np.uint8))
    # P×K batch with distinct pids, as RandomMultipleGallerySampler yields
    targets = jax.device_put(
        np.repeat(rng.choice(k, batch // 16, replace=False), 16).astype(np.int32))
    seed = np.int32(0)

    flops = _program_flops(trainer._step, state, img, targets, seed)
    state, loss = trainer._step(state, img, targets, seed)   # compile
    jax.block_until_ready(loss)

    def step(s):
        s, loss = trainer._step(s, img, targets, seed)
        return s

    # donation consumes the state; rebuild fresh per timed run
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return batch * iters / dt, flops


def bench_joint_gan_train(batch=256, height=256, width=128, gh=128, gw=64,
                          k=768, iters=8):
    """Flagship ``train_all`` joint GAN+reID step at production shapes — the
    reference's LIVE joint command (CC/run_code.sh:32-35): -b 256,
    --num-instances 16, Pose generator at 128×64, no VGG loss."""
    from reid_gan_tpu.config import GANConfig
    from reid_gan_tpu.engine.gan_trainers import ClusterContrastWithGANTrainer
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.models.dual_gan.ae_model import AEModel
    from reid_gan_tpu.ops.cluster_memory import init_memory

    rng = np.random.RandomState(1)
    encoder = create_model("resnet50", norm=True, dtype=jnp.bfloat16)
    enc_vars = encoder.init(jax.random.PRNGKey(0),
                            jnp.zeros((batch, height, width, 3)), train=True)
    gan = AEModel(GANConfig(model="AE", model_gen="Pose"), gan_height=gh,
                  gan_width=gw, reid_feat_dim=2048, dtype=jnp.bfloat16)
    gan_state = gan.init_state(jax.random.PRNGKey(1))
    centers = rng.randn(k, 2048).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    trainer = ClusterContrastWithGANTrainer(
        encoder, gan, height=height, width=width, iters_per_epoch=400,
        num_instances=16)
    state = trainer.init_state(enc_vars, gan_state, init_memory(centers))

    batch_np = {"img": rng.randint(0, 256, (batch, height, width, 3),
                                   dtype=np.uint8),
                "pid": np.repeat(rng.choice(k, batch // 16, replace=False), 16),
                "Xs": rng.randint(0, 256, (batch, gh, gw, 3), dtype=np.uint8),
                "keypoints": rng.randint(0, 60, (batch, 18, 2)).astype(
                    np.float32),
                "old_size": np.full((batch, 2), 64.0, np.float32),
                "index": np.arange(batch)}

    class _Loader:
        def next(self):
            return batch_np

    # compile through the real epoch path once, then time the jitted step on
    # device-resident inputs — this isolates the framework's step time from
    # this dev environment's slow host↔device tunnel (~67 MB/s for fresh
    # buffers; a production TPU host stages batches over PCIe at GB/s and
    # the async epoch loop overlaps staging with compute)
    state, _ = trainer.run_epoch(state, 0, _Loader(), mode="train_all",
                                 train_iters=1, print_freq=1 << 30)
    step = trainer._steps["train_all"]
    dev = {"img": jnp.asarray(batch_np["img"]),
           "pid": jnp.asarray(batch_np["pid"], jnp.int32),
           "Xs": jnp.asarray(batch_np["Xs"]),
           "keypoints": jnp.asarray(batch_np["keypoints"]),
           "old_size": jnp.asarray(batch_np["old_size"])}
    conf = jnp.ones(batch, jnp.float32)
    flops = _program_flops(step, state, dev, np.int32(0), conf)
    state, errs = step(state, dev, np.int32(0), conf)
    jax.block_until_ready(errs["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, errs = step(state, dev, np.int32(i), conf)
    float(errs["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt, flops


def bench_gan_pretrain(batch=256, gh=128, gw=64, iters=10):
    """Standalone AE GAN pretraining step (GANTrainer.train_gan path) at the
    production gan shapes: uint8 batch → fused resize/normalize + D step +
    G step in ONE jitted program per iteration (VERDICT r4 weak #6)."""
    from reid_gan_tpu.config import GANConfig
    from reid_gan_tpu.models.dual_gan.ae_model import AEModel

    rng = np.random.RandomState(2)
    gan = AEModel(GANConfig(model="AE", model_gen="AE"), gan_height=gh,
                  gan_width=gw, dtype=jnp.bfloat16)
    state = gan.init_state(jax.random.PRNGKey(0))
    xs = jax.device_put(rng.randint(0, 256, (batch, gh, gw, 3),
                                    dtype=np.uint8))
    key = jax.random.PRNGKey(1)
    state, errs, _ = gan._step(state, {"Xs": xs}, key)   # compile
    jax.block_until_ready(errs["G"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, errs, _ = gan._step(state, {"Xs": xs},
                                   jax.random.fold_in(key, i))
    float(errs["G"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_loader(batch=64, num_workers=4, iters=40, root=None):
    """Host data-loader throughput (img/s decoded + collated + staged) at the
    production worker count, on Market-sized JPEGs in the joint-training
    'with_gan' mode (reid decode + GAN resize + keypoints). This closes the
    end-to-end claim: epoch rate = min(host staging, device step).

    ``root``: reuse an existing dataset directory (so repeated calls share
    the process-wide decode cache — scripts/bench_loader_scaling.py measures
    cold vs warm this way); default builds a throwaway synthetic set."""
    import contextlib
    import tempfile

    from reid_gan_tpu.data import IterLoader
    from reid_gan_tpu.data.datasets import create as create_dataset
    from reid_gan_tpu.data.loader import DataLoader, Preprocessor
    from reid_gan_tpu.data.sampler import RandomMultipleGallerySampler

    ctx = (tempfile.TemporaryDirectory() if root is None
           else contextlib.nullcontext(root))
    with ctx as root:
        ds = create_dataset("synthetic", root, num_ids=64, num_cams=3,
                            imgs_per_id=8, height=128, width=64)
        pre = Preprocessor(list(ds.train), mode="with_gan", height=256,
                           width=128, gan_height=128, gan_width=64,
                           pose_file=getattr(ds, "train_pose_dir", None),
                           flip_all=True)
        sampler = RandomMultipleGallerySampler(ds.train, num_instances=4)
        loader = IterLoader(DataLoader(pre, sampler=sampler, batch_size=batch,
                                       num_workers=num_workers), length=iters)
        loader.new_epoch()
        loader.next()                      # spin up the pool + prefetch
        t0 = time.perf_counter()
        for _ in range(iters):
            loader.next()
        dt = time.perf_counter() - t0
        loader.close()   # join workers BEFORE the tempdir (and its JPEGs) go
    return batch * iters / dt


def main():
    from reid_gan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    _log(f"bench: backend={jax.default_backend()} devices={jax.devices()}")
    _log("bench: eval extraction ...")
    ips, ex_flops = bench_extraction()
    _log(f"  extraction: {ips:.0f} img/s  {_tflops(ex_flops, ips, 256)} TFLOP/s")
    _log("bench: USL train step (bf16) ...")
    train_ips, tr_flops = bench_usl_train()
    _log(f"  usl train: {train_ips:.0f} img/s  "
         f"{_tflops(tr_flops, train_ips, 256)} TFLOP/s")
    _log("bench: joint GAN train_all step ...")
    joint_ips, j_flops = bench_joint_gan_train()
    _log(f"  joint train_all: {joint_ips:.0f} img/s  "
         f"{_tflops(j_flops, joint_ips, 256)} TFLOP/s")
    _log("bench: standalone GAN pretrain step ...")
    gan_ips = bench_gan_pretrain()
    _log(f"  gan pretrain: {gan_ips:.0f} img/s")
    _log("bench: host loader (with_gan mode, 4 workers, packed cache) ...")
    loader_ips = bench_loader()
    _log(f"  loader: {loader_ips:.0f} img/s")

    print(json.dumps({
        "metric": "resnet50_feature_extraction_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMGS_PER_SEC, 3),
        "extra": {
            "extraction_tflops_per_sec": _tflops(ex_flops, ips, 256),
            "usl_train_imgs_per_sec": round(train_ips, 1),
            "usl_train_vs_baseline": round(
                train_ips / BASELINE_TRAIN_IMGS_PER_SEC, 3),
            "usl_train_tflops_per_sec": _tflops(tr_flops, train_ips, 256),
            "joint_gan_train_imgs_per_sec": round(joint_ips, 1),
            "joint_gan_train_tflops_per_sec": _tflops(j_flops, joint_ips, 256),
            "gan_pretrain_imgs_per_sec": round(gan_ips, 1),
            "loader_imgs_per_sec": round(loader_ips, 1),
        },
    }))


if __name__ == "__main__":
    main()
