"""Micro-profile of the fused reid_augment chain on the real chip.

Times each stage of the augmentation program (batch 64 at production staging
shapes) and candidate reformulations of the random-crop resampler, to decide
how to claw back the ~7 ms the full chain costs inside the joint step.

Usage:  PYTHONPATH=. python scripts/profile_augment.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from reid_gan_tpu.ops import transforms as T

N, H, W = 64, 256, 128


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (N, H, W, 3), dtype=np.uint8))
    x = T.to_float(img)
    key = jax.random.PRNGKey(0)

    t = timeit(jax.jit(lambda k: T.reid_augment(k, img, height=H, width=W,
                                                train=True)), key)
    print(f"full reid_augment:        {t:7.2f} ms")

    t = timeit(jax.jit(lambda k, xx: T.random_hflip(k, xx)[0]), key, x)
    print(f"random_hflip:             {t:7.2f} ms")

    t = timeit(jax.jit(lambda k, xx: T.random_sized_rect_crop(k, xx, H, W)),
               key, x)
    print(f"random_sized_rect_crop:   {t:7.2f} ms")

    t = timeit(jax.jit(lambda k, xx: T.random_erasing(k, xx)), key, x)
    print(f"random_erasing:           {t:7.2f} ms")

    t = timeit(jax.jit(T.normalize), x)
    print(f"normalize:                {t:7.2f} ms")

    # ---- candidate: separable batched-matmul bilinear crop (bf16 MXU)
    def crop_mat(starts, crops, in_dim, out_dim, dtype):
        # (N, out, in) bilinear resampling weights for a continuous rectangle
        # [start, start+crop) mapped onto out_dim output pixels
        o = jnp.arange(out_dim, jnp.float32)
        src = starts[:, None] + (o[None, :] + 0.5) * (crops[:, None] / out_dim) - 0.5
        i = jnp.arange(in_dim, jnp.float32)
        d = jnp.abs(src[:, :, None] - i[None, None, :])
        wmat = jnp.clip(1.0 - d, 0.0, 1.0)
        wmat = wmat / jnp.maximum(wmat.sum(-1, keepdims=True), 1e-8)
        return wmat.astype(dtype)

    def crop_mm2(key, xx, out_h, out_w, dtype):
        n, h, w, c = xx.shape
        k1, k2, k3, k4 = jax.random.split(key, 4)
        area = h * w * jax.random.uniform(k1, (n,), minval=0.64, maxval=1.0)
        aspect = jax.random.uniform(k2, (n,), minval=2.0, maxval=3.0)
        crop_h = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(h))
        crop_w = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(w))
        top = jax.random.uniform(k3, (n,)) * (h - crop_h)
        left = jax.random.uniform(k4, (n,)) * (w - crop_w)
        wy = crop_mat(top, crop_h, h, out_h, dtype)          # (N, oh, h)
        wx = crop_mat(left, crop_w, w, out_w, dtype)         # (N, ow, w)
        xb = xx.astype(dtype)
        y = jnp.einsum("noh,nhwc->nowc", wy, xb)             # rows
        y = jnp.einsum("npw,nowc->nopc", wx, y)              # cols
        return y

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        f = jax.jit(lambda k, xx, d=dt: crop_mm2(k, xx, H, W, d))
        t = timeit(f, key, x)
        print(f"crop as batched matmul {name}: {t:7.2f} ms")

    # sanity: compare matmul crop vs scale_and_translate on same rects
    a = crop_mm2(key, x, H, W, jnp.float32)
    b = T.random_sized_rect_crop(key, x, H, W)
    print("max |mm - s&t|:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
