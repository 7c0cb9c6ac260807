"""Headline benchmark: ResNet-50 feature-extraction throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference extracts features at ≈1,950 img/s on its GPU
(CC/examples/logs/log.txt:17, 0.13 s / 256-image batch); the driver target is
≥5,000 img/s/chip on TPU v5e (BASELINE.md).

The measured program is the production eval path: uint8 batch → fused
resize/normalize → ResNet-50 (GeM, last-stride-1) → L2-normalized features,
in bfloat16 on the MXU.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 1950.0


def main():
    from reid_gan_tpu.models import create as create_model
    from reid_gan_tpu.ops.transforms import reid_augment

    batch = 256
    height, width = 256, 128
    model = create_model("resnet50")
    img0 = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=False)
    # bfloat16 weights + activations for inference
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
    # warmup / compile
    fwd(variables, img).block_until_ready()
    fwd(variables, img).block_until_ready()

    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, img)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(json.dumps({
        "metric": "resnet50_feature_extraction_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
