"""ADC (asymmetric distance computation) kernels for PQ search.

TPU-native replacement for jVector's per-query precomputed score function
(`pqVectors.precomputedScoreFunctionFor`, call site JVectorReader.java:355)
and the fused-ADC lookup path (README.md:37 "Fused ADC").

Two pieces:
  1. `build_luts` — per-query lookup tables: partial scores of each query
     subvector against every centroid of that subspace ([Q, M, K] in one
     batched matmul).
  2. `lookup_*` — accumulate LUT entries addressed by PQ codes.

Raw accumulated value convention (matches PQ training space):
  EUCLIDEAN:    sum of per-subspace squared distances  -> score 1/(1+sum)
  DOT_PRODUCT:  sum of per-subspace dots               -> score (1+sum)/2
  COSINE:       handled as DOT_PRODUCT over pre-normalized vectors
Use `adc_value_to_score` to map accumulated values to graph scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opensearch_jvector_tpu.ops.distances import SimilarityFunction


@functools.partial(jax.jit, static_argnames=("euclidean",))
def build_luts(
    query_sub: jax.Array,  # [Q, M, dsub] query split into subvectors
    codebooks: jax.Array,  # [M, K, dsub]
    euclidean: bool,
) -> jax.Array:
    """Per-query ADC lookup tables [Q, M, K].

    One batched matmul per call: einsum('qmd,mkd->qmk').
    """
    dots = jnp.einsum(
        "qmd,mkd->qmk", query_sub, codebooks, preferred_element_type=jnp.float32
    )
    if not euclidean:
        return dots
    q2 = jnp.sum(query_sub * query_sub, axis=-1)[:, :, None]  # [Q, M, 1]
    c2 = jnp.sum(codebooks * codebooks, axis=-1)[None, :, :]  # [1, M, K]
    return jnp.maximum(q2 + c2 - 2.0 * dots, 0.0)


def _lookup_one_query(luts_q: jax.Array, codes: jax.Array) -> jax.Array:
    """luts_q: [M, K]; codes: [C, M] int -> accumulated [C]."""
    # Per-subspace gather, vectorized over M; XLA lowers to dynamic gathers.
    per_m = jax.vmap(lambda lut_m, code_m: lut_m[code_m], in_axes=(0, 1))(
        luts_q, codes
    )  # [M, C]
    return jnp.sum(per_m, axis=0)


@jax.jit
def lookup_candidates(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """Accumulate ADC values for per-query candidate code rows.

    luts: [Q, M, K]; codes: [Q, C, M] -> [Q, C].
    """
    return jax.vmap(_lookup_one_query)(luts, codes)


@jax.jit
def lookup_scan(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """Accumulate ADC values for ALL code rows (full-scan path).

    luts: [Q, M, K]; codes: [N, M] (shared across queries) -> [Q, N].

    Implemented as one-hot matmuls per subspace so the accumulation runs on
    the MXU: sum_m onehot(codes[:, m]) @ luts[:, m, :].T. XLA fuses the
    one-hot materialization into the matmul operand stream.
    """
    q, m, k = luts.shape

    def body(mi, acc):
        onehot = jax.nn.one_hot(codes[:, mi], k, dtype=jnp.float32)  # [N, K]
        return acc + jax.lax.dot_general(
            luts[:, mi, :],
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc0 = jnp.zeros((q, codes.shape[0]), jnp.float32)
    return jax.lax.fori_loop(0, m, body, acc0)


def adc_value_to_score(values: jax.Array, simf: SimilarityFunction) -> jax.Array:
    """Map accumulated ADC values to graph scores (higher = better)."""
    if simf is SimilarityFunction.EUCLIDEAN:
        return 1.0 / (1.0 + values)
    # DOT_PRODUCT and COSINE (cosine encodes normalized vectors)
    return (1.0 + values) / 2.0
