"""Batched, jit-compiled image augmentation kernels.

The reference does per-image PIL/torchvision transforms inside DataLoader
worker processes (FD/reid/utils/data/transforms.py:9-87,
CC/clustercontrast/utils/data/transforms.py:52-96). TPU-first design: the host
only decodes + letterboxes to a fixed staging size; the whole augmentation
chain — random sized rect-crop, horizontal flip, normalize, random erasing —
is ONE fused jit program over the uint8 batch, driven by a JAX PRNG key
(north-star: "fused jit-compiled JAX transforms").

All ops are static-shape: random crops are realized with
``jax.image.scale_and_translate`` (output size fixed, source rectangle
continuous), random-erasing with iota masks.

Layout: NHWC float32 in [0,1] after ``to_float``; ImageNet normalization per
FD/reid/utils/data/preprocessor.py:23 / CC usl transforms; GAN inputs use the
(0.5, 0.5, 0.5) normalization of CC/clustercontrast/utils/data/preprocessor.py
(GAN_transform at CC/examples/cluster_contrast_gan_train_usl_infomap.py:104-110).
"""

import functools

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)
GAN_MEAN = jnp.array([0.5, 0.5, 0.5], jnp.float32)
GAN_STD = jnp.array([0.5, 0.5, 0.5], jnp.float32)


def to_float(img_u8):
    return img_u8.astype(jnp.float32) / 255.0


def normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return (x - mean) / std


def denormalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return x * std + mean


def resize_batch(x, height, width, method="bilinear"):
    """Resize NHWC batch to (height, width) — RectScale
    (FD/reid/utils/data/transforms.py:9-21). No-op at the target size (eval
    batches are staged at the target, so this skips a full image-sized
    linear pass on the HBM-bound eval path)."""
    n, h, w, c = x.shape
    if (h, w) == (height, width):
        return x
    return jax.image.resize(x, (n, height, width, c), method=method)


def hflip(x):
    return x[:, :, ::-1, :]


def random_hflip(key, x):
    """Per-sample random horizontal flip (p=0.5)."""
    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], hflip(x), x), flip


def _crop_resize_one(img, top, left, crop_h, crop_w, out_h, out_w):
    """Resample the continuous rectangle [top, top+crop_h)×[left, left+crop_w)
    of one HWC image to (out_h, out_w) with bilinear filtering.

    scale_and_translate maps output pixel o to input coordinate
    (o + 0.5)/scale - 0.5 - translate/scale, so scale = out/crop and
    translate = -top*scale.
    """
    scale_y = out_h / crop_h
    scale_x = out_w / crop_w
    return jax.image.scale_and_translate(
        img,
        (out_h, out_w, img.shape[-1]),
        (0, 1),
        jnp.stack([scale_y, scale_x]),
        jnp.stack([-top * scale_y, -left * scale_x]),
        method="linear",
    )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def random_sized_rect_crop(key, x, out_h=256, out_w=128):
    """Batched RandomSizedRectCrop: sample area ∈ [0.64, 1.0]·HW and aspect
    (h/w) ∈ [2, 3], crop, resize to (out_h, out_w)
    (FD/reid/utils/data/transforms.py:24-49; CC twin at transforms.py).

    The reference retries up to 10× and falls back to full-image RectScale;
    we clamp the sampled rectangle into bounds instead (static shapes), which
    keeps the same distribution over feasible crops.
    """
    n, h, w, _ = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (n,), minval=0.64, maxval=1.0)
    aspect = jax.random.uniform(k2, (n,), minval=2.0, maxval=3.0)
    crop_h = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(h))
    crop_w = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(w))
    top = jax.random.uniform(k3, (n,)) * (h - crop_h)
    left = jax.random.uniform(k4, (n,)) * (w - crop_w)
    fn = jax.vmap(_crop_resize_one, in_axes=(0, 0, 0, 0, 0, None, None))
    return fn(x, top, left, crop_h, crop_w, out_h, out_w)


@functools.partial(jax.jit, static_argnames=())
def random_erasing(key, x, p=0.5, sl=0.02, sh=0.4, r1=0.3, fill=None):
    """Batched RandomErasing: with prob p, zero a random rectangle of area
    ∈ [sl, sh]·HW and aspect ∈ [r1, 1/r1], filled with the per-channel mean
    (CC/clustercontrast/utils/data/transforms.py:52-96; the FD variant
    RandomSizedEarser fills with random RGB — pass ``fill='random'``-style
    values via the ``fill`` arg).
    """
    n, h, w, c = x.shape
    keys = jax.random.split(key, 5)
    do = jax.random.bernoulli(keys[0], p, (n,))
    area = h * w * jax.random.uniform(keys[1], (n,), minval=sl, maxval=sh)
    aspect = jnp.exp(jax.random.uniform(keys[2], (n,),
                                        minval=jnp.log(r1), maxval=jnp.log(1.0 / r1)))
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w)
    top = jnp.floor(jax.random.uniform(keys[3], (n,)) * (h - eh + 1))
    left = jnp.floor(jax.random.uniform(keys[4], (n,)) * (w - ew + 1))
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    inside = ((yy >= top[:, None, None]) & (yy < (top + eh)[:, None, None]) &
              (xx >= left[:, None, None]) & (xx < (left + ew)[:, None, None]))
    mask = (inside & do[:, None, None])[..., None]
    if fill is None:
        fill_val = jnp.mean(x, axis=(1, 2), keepdims=True)  # per-image channel mean
    else:
        fill_val = fill
    return jnp.where(mask, fill_val, x)


@functools.partial(jax.jit, static_argnames=("height", "width", "train"))
def reid_augment(key, img_u8, height=256, width=128, train=True):
    """The full re-ID train transform as one fused program
    (CC/examples/cluster_contrast_train_usl.py:48-56):
    resize(h+32, w+16... handled host-side to staging) → RandomHorizontalFlip
    → pad+RandomCrop (realized as RandomSizedRectCrop per the FD recipe /
    random resized crop) → normalize → RandomErasing.

    img_u8: (N, H_stage, W_stage, 3) uint8 staging batch.
    Returns NHWC float32 normalized batch.
    """
    x = to_float(img_u8)
    if not train:
        x = resize_batch(x, height, width)
        return normalize(x)
    k1, k2, k3 = jax.random.split(key, 3)
    x, _ = random_hflip(k1, x)
    x = random_sized_rect_crop(k2, x, height, width)
    x = normalize(x)
    x = random_erasing(k3, x)
    return x


@functools.partial(jax.jit, static_argnames=("height", "width"))
def gan_input_transform(img_u8, height=128, width=64):
    """GAN branch input: resize to load_size 128×64 + (0.5,0.5,0.5) normalize
    (CC/clustercontrast/utils/data/preprocessor.py:166-173 and the
    GAN_transform at CC/examples/cluster_contrast_gan_train_usl_infomap.py:104-110).
    Flip consistency with the reid branch is handled by the caller (flip both)."""
    x = to_float(img_u8)
    x = resize_batch(x, height, width)
    return normalize(x, GAN_MEAN, GAN_STD)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def diff_transform(gen_img, height=256, width=128):
    """Differentiable re-encode transform for generated images: tensor-space
    resize to 256×128 + ImageNet normalize, gradients flow
    (CC/clustercontrast/utils/data/diff_augs.py:8-18; generated images are in
    [-1, 1] tanh space, mapped back to [0,1] first as tensor2im does)."""
    x = (gen_img + 1.0) / 2.0
    n, _, _, c = x.shape
    x = jax.image.resize(x, (n, height, width, c), method="bicubic")
    return normalize(x)
