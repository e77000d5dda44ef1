"""Synthetic dataset generators for the benchmark harness.

Counterpart of the reference's benchmark dataset loaders
(benchmark-jmh/src/jmh/.../datasets/: HDF5 ann-benchmarks, Deep1B, fvecs).
Real datasets are unreachable offline; these generators reproduce the three
geometry regimes that matter for ANN benchmarking:

  sift      low effective dimension (latent-16 linear map + noise) — the
            geometry of real descriptor sets (SIFT-128's effective dim ~15-20)
  gaussian  i.i.d. N(0,1) — concentrated distances, the adversarial case
  clustered tight equidistant clusters — the cluster-hopping stress test
"""

from __future__ import annotations

import numpy as np


def make_dataset(kind: str, n: int, dim: int, n_queries: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    if kind == "gaussian":
        return (rng.standard_normal((n, dim)).astype(np.float32),
                rng.standard_normal((n_queries, dim)).astype(np.float32))
    if kind == "sift":
        latent = 16
        a = rng.standard_normal((latent, dim)).astype(np.float32) / np.sqrt(latent)
        v = (rng.standard_normal((n, latent)).astype(np.float32) @ a
             + 0.05 * rng.standard_normal((n, dim)).astype(np.float32))
        q = (rng.standard_normal((n_queries, latent)).astype(np.float32) @ a
             + 0.05 * rng.standard_normal((n_queries, dim)).astype(np.float32))
        return v, q
    if kind == "clustered":
        c = rng.standard_normal((256, dim)).astype(np.float32)
        av = rng.integers(0, 256, n)
        aq = rng.integers(0, 256, n_queries)
        v = c[av] + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
        q = c[aq] + 0.3 * rng.standard_normal((n_queries, dim)).astype(np.float32)
        return v, q
    raise ValueError(f"unknown dataset kind {kind}")
