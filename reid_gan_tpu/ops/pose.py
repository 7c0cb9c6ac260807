"""Pose-landmark → Gaussian heatmap rendering as vectorized JAX ops.

Two renderers exist in the reference, both host-side python loops over the 18
COCO keypoints; here both are single vectorized (and jit/vmap-able) ops:

1. :func:`cords_to_map` — CC GAN input maps at 128×64, analytic Gaussian
   ``exp(-(dy²+dx²)/(2σ²))`` with σ=6 and coordinate rescaling from the
   original image size (CC/clustercontrast/utils/data/pose_utils.py:52-70).
2. :func:`render_pose_peaks` — FD-GAN maps at 256×128: a delta at the
   (already-rescaled) landmark pixel blurred by a truncated Gaussian filter
   and re-normalized to max 1 (FD/reid/utils/data/preprocessor.py:114-131).
   A delta blurred by ``scipy.ndimage.gaussian_filter`` and divided by its max
   is exactly the truncated analytic Gaussian away from image borders, so we
   render the analytic form with the same truncation radius (4σ).

Missing keypoints are encoded as -1 and produce all-zero channels.
"""

import functools

import jax
import jax.numpy as jnp

MISSING_VALUE = -1.0

# COCO-18 skeleton (CC/clustercontrast/utils/data/pose_utils.py:14-20)
LIMB_SEQ = [
    [1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7], [1, 8], [8, 9],
    [9, 10], [1, 11], [11, 12], [12, 13], [1, 0], [0, 14], [14, 16],
    [0, 15], [15, 17], [2, 16], [5, 17],
]

COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma"))
def cords_to_map(cords, old_size, height=128, width=64, sigma=6.0):
    """Render K keypoints to (K, H, W) Gaussian maps.

    cords: (K, 2) float array of (y, x) in the ORIGINAL image frame;
    old_size: (2,) float (orig_h, orig_w). Coordinates are rescaled to the
    target frame and truncated to ints, matching
    CC/clustercontrast/utils/data/pose_utils.py:59-69 (note the reference
    returns (H, W, K); we use channel-first (K, H, W) as consumed by models).
    """
    cords = jnp.asarray(cords, jnp.float32)
    missing = (cords[:, 0] == MISSING_VALUE) | (cords[:, 1] == MISSING_VALUE)
    y0 = jnp.floor(cords[:, 0] / old_size[0] * height).astype(jnp.float32)
    x0 = jnp.floor(cords[:, 1] / old_size[1] * width).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    d2 = (yy[None] - y0[:, None, None]) ** 2 + (xx[None] - x0[:, None, None]) ** 2
    maps = jnp.exp(-d2 / (2.0 * sigma ** 2))
    return jnp.where(missing[:, None, None], 0.0, maps)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_pose_peaks(landmark, height=256, width=128, sigma=5.0, erase_index=-1):
    """FD-GAN 18-channel pose map: peak-normalized truncated Gaussian at each
    landmark pixel (FD/reid/utils/data/preprocessor.py:114-131).

    landmark: (K, 2) int/float (y, x) already scaled to the target frame with
    -1 marking missing joints. ``sigma`` may be a traced scalar (the reference
    'gauss' augmentation draws σ ∈ {4,5,6}); ``erase_index`` drops one channel
    (the 'erase' augmentation), -1 keeps all.
    """
    landmark = jnp.asarray(landmark, jnp.float32)
    k = landmark.shape[0]
    missing = (landmark[:, 0] == -1) | (landmark[:, 1] == -1)
    erased = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] == erase_index
    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    dy = yy[None] - landmark[:, 0][:, None, None]
    dx = xx[None] - landmark[:, 1][:, None, None]
    d2 = dy ** 2 + dx ** 2
    maps = jnp.exp(-d2 / (2.0 * sigma ** 2))
    # scipy.ndimage.gaussian_filter truncates at 4σ (rounded per-axis)
    radius = jnp.floor(4.0 * sigma + 0.5)
    maps = jnp.where((jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius), maps, 0.0)
    drop = missing | erased
    return jnp.where(drop[:, None, None], 0.0, maps)


batch_cords_to_map = jax.vmap(cords_to_map, in_axes=(0, 0, None, None, None))
