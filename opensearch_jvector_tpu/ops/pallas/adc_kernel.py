"""Fused-ADC Pallas kernel: PQ lookup-table scan at MXU speed.

The TPU-native realization of the reference's "Fused ADC" feature
(README.md:37; per-query precomputed score function at
JVectorReader.java:355). A gather-per-code is hostile to the TPU (vector
gathers run ~1e8/s); instead each PQ code column becomes an on-the-fly
one-hot row in VMEM and the LUT accumulation becomes a [NB, K] x [K, QB]
matmul on the MXU per subspace. The one-hot never touches HBM — that
round-trip is what caps the plain XLA lowering (~30 TFLOPs-equiv); this
kernel streams only codes in and scores out.

Layouts:
  codes [N, M] int32 (one byte-range code per subspace)
  luts  [M, K, Q] bf16 (per-subspace tables, query-minor for the matmul)
  out   [N, Q] f32 accumulated ADC values

The grid tiles BOTH axes: a full [M, K, Q] LUT block is 16MB bf16 at
M=64/Q=512 — alone at the 16MB scoped-VMEM limit. Query blocks are the
OUTER grid dim so each LUT tile is fetched once and the (smaller) code
blocks stream under it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 2048
DEFAULT_BLOCK_Q = 128


def _adc_kernel(codes_ref, luts_ref, out_ref):
    nb = codes_ref.shape[0]
    m = luts_ref.shape[0]
    k = luts_ref.shape[1]
    q = luts_ref.shape[2]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    codes = codes_ref[:]  # [NB, M]

    # Static unroll over subspaces: Mosaic cannot index the lane dimension
    # dynamically, and M is small (<=192). (A grouped multi-subspace matmul
    # variant OOM-killed the Mosaic compiler; the simple form reaches ~71
    # TFLOPs-equiv already.)
    acc = jnp.zeros((nb, q), jnp.float32)
    for mi in range(m):
        onehot = (codes[:, mi][:, None] == iota_k).astype(jnp.bfloat16)
        lut_m = luts_ref[mi].astype(jnp.bfloat16)  # [K, QB]
        acc = acc + jnp.dot(onehot, lut_m, preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("block_n", "block_q"))
def fused_adc_scan(
    luts: jax.Array,  # [Q, M, K] f32 per-query tables
    codes: jax.Array,  # [N, M] uint8/int32 PQ codes
    block_n: int = DEFAULT_BLOCK_N,
    block_q: int = DEFAULT_BLOCK_Q,
) -> jax.Array:
    """Accumulated ADC values for every code row: -> [Q, N] f32."""
    q, m, k = luts.shape
    n = codes.shape[0]
    codes = codes.astype(jnp.int32)
    luts_t = jnp.transpose(luts, (1, 2, 0)).astype(jnp.bfloat16)  # [M, K, Q]

    pad_n = (-n) % block_n
    if pad_n:
        codes = jnp.pad(codes, ((0, pad_n), (0, 0)))
    n_pad = n + pad_n
    block_q = min(block_q, q) if q >= 8 else q
    pad_q = (-q) % block_q
    if pad_q:
        luts_t = jnp.pad(luts_t, ((0, 0), (0, 0), (0, pad_q)))
    q_pad = q + pad_q

    out = pl.pallas_call(
        _adc_kernel,
        # q-blocks OUTER: the LUT tile (the big operand) is loaded once per
        # q-block while code blocks stream; swapping the order would
        # re-stream the whole LUT set per code block.
        grid=(q_pad // block_q, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_n, m), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k, block_q), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_q), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m * k * q_pad,
            bytes_accessed=(q_pad // block_q) * n_pad * m * 4
            + m * k * q_pad * 2 + n_pad * q_pad * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(codes, luts_t)
    return jnp.transpose(out[:n, :q], (1, 0))
