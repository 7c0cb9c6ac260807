"""TPU compute kernels: distances, k-NN, Jaccard, cluster memory, transforms,
pose rendering, losses. All pure JAX/XLA (+ Pallas for hot paths)."""
