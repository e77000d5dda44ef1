"""Fused decode-in-VMEM PQ scan kernel: codes-only scoring at HBM cost
M bytes/vector.

The speed-of-light code-only formulation specced in docs/design.md
("fused decode-then-score"): each [block_n, d] bf16 block is reconstructed
IN VMEM from its PQ codes (per-subspace one-hot matmuls against a
block-diagonal grouped codebook), then scored against all queries with one
[block_n, 128] x [128, QB] matmul per group. Nothing decoded ever touches
HBM — traffic stays M bytes/vector (codes) + the score slab, vs the
decoded-bf16 cache's 2*d bytes/vector RESIDENT footprint
(`PQVectors.decode_bf16`). The TPU answer to the reference's fused ADC
(README.md:37; per-query score function at JVectorReader.java:355) for the
memory-tight regime: a 10M x 960d corpus needs 19.2 GB decoded but only
~1.9 GB of codes.

MXU accounting (K codewords, M subspaces, Q queries, per vector):
  LUT one-hot ADC (adc_kernel.py):  M * K * Q           (Q-proportional)
  fused decode-then-score:          M * K * 128 + d * Q (Q-amortized)
The decode term is irreducible for one-hot matmul decode — the MXU pads
output lanes to 128, so grouping G = 128 // dsub subspaces into one
block-diagonal [G*K, 128] operand costs the same MACs but cuts the matmul
COUNT by G and yields lane-dense [NB, 128] decoded pieces. Crossover vs
the LUT kernel is Q ~ 128: below it the LUT form does strictly less work,
above it the fused form wins by ~Q/128 (bounded by the score matmul).

Grouped-codebook layout: subspaces are packed G to a group; group gi's
operand gcb[gi] is [G*K, 128] with codebook cb[gi*G + g, k] placed at rows
g*K + k, columns g*dsub:(g+1)*dsub. The per-subspace one-hots concatenate
lane-aligned (K lanes each) so no shifted writes are needed; the
block-diagonal zeros are streamed per n-block (~M*K*256 bytes), affordable
because the decode itself is MXU-bound (~3 HBM ns vs ~60 MXU ns per
vector at M=192).

Value convention matches ops/adc.py: the kernel returns raw inner products
ip[Q, N] = (q - center) . decode_nocenter(codes); euclidean callers fold
||q_c||^2 + ||dec||^2 - 2*ip (with ||dec||^2 from one cb^2-LUT pass of the
existing ADC kernel) — the same global-clamp form as the decoded-cache
scan (`reader._decoded_scan_scores`), whose bf16 rounding the exact rerank
absorbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 2048  # 4096 overflows the 16MB scoped-VMEM limit
DEFAULT_BLOCK_Q = 512

# Measured crossover vs the LUT one-hot kernel (v5e, 250k x 960d, M=192:
# LUT 17.3ms @ Q=128 at ~182 TFLOPs-equiv vs fused 26.7ms flat in Q):
# below this query count the LUT form does strictly less MXU work; above
# it the fused form wins ~Q/200 and also clears shapes where the LUT tile
# [M, K, 128] alone busts scoped VMEM (M >= ~200 at K=256).
MIN_QUERIES_TO_WIN = 256
_LANES = 128


def pick_group_size(m: int, dsub: int) -> int | None:
    """Largest divisor of m with g * dsub <= 128 lanes, capped at 16
    subspaces per group: the kernel statically unrolls the group's one-hot
    matmuls, and past ~16 the Mosaic compile blows up (the same wall the
    grouped adc_kernel variant hit). Under-filled lanes only pad the cheap
    score matmul, not the decode. None when a single subspace overflows
    the lane tile (dsub > 128: use the LUT kernel)."""
    if dsub > _LANES:
        return None
    g = min(m, _LANES // dsub, 16)
    while m % g:
        g -= 1
    return g


def _decode_score_kernel(codes_ref, gcb_ref, qt_ref, out_ref):
    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    nb = codes_ref.shape[1]
    g = codes_ref.shape[2]
    k = gcb_ref.shape[1] // g
    codes = codes_ref[0]  # [NB, G] int32 (padding rows carry K)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)

    # Static unroll over the group's subspaces (Mosaic cannot index lanes
    # dynamically); each one-hot hits K lanes, each matmul lands the
    # subspace's dsub columns of the lane-dense decoded piece.
    dec = jnp.zeros((nb, _LANES), jnp.float32)
    for gg in range(g):
        onehot = (codes[:, gg][:, None] == iota_k).astype(jnp.bfloat16)
        dec = dec + jnp.dot(
            onehot, gcb_ref[0, gg * k:(gg + 1) * k, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += jnp.dot(
        dec.astype(jnp.bfloat16), qt_ref[0],
        preferred_element_type=jnp.float32,
    )


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("block_n", "block_q"))
def fused_decode_scan(
    q_centered: jax.Array,  # [Q, d] f32 queries ALREADY centered/normalized
    codes: jax.Array,  # [N, M] uint8/int32 PQ codes
    codebooks: jax.Array,  # [M, K, dsub] f32
    block_n: int = DEFAULT_BLOCK_N,
    block_q: int = DEFAULT_BLOCK_Q,
) -> jax.Array:
    """Raw inner products (q - center) . decode_nocenter -> [Q, N] f32."""
    m, k, dsub = codebooks.shape
    qn, d = q_centered.shape
    n = codes.shape[0]
    g = pick_group_size(m, dsub)
    assert g is not None, "dsub > 128: route to the LUT ADC kernel"
    ng = m // g

    # Block-diagonal grouped codebook [ng, G*K, 128] (zeros off-diagonal).
    gcb = jnp.einsum(
        "ngkd,gh->ngkhd",
        codebooks.reshape(ng, g, k, dsub),
        jnp.eye(g, dtype=codebooks.dtype),
    ).reshape(ng, g * k, g * dsub)
    gcb = jnp.pad(gcb, ((0, 0), (0, 0), (0, _LANES - g * dsub)))
    gcb = gcb.astype(jnp.bfloat16)

    # Queries in the grouped lane layout: [ng, 128, Qp].
    qt = q_centered.reshape(qn, ng, g * dsub)
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, _LANES - g * dsub)))
    block_q = min(block_q, max(_LANES, qn))
    pad_q = (-qn) % block_q
    if pad_q:
        qt = jnp.pad(qt, ((0, pad_q), (0, 0), (0, 0)))
    q_pad = qn + pad_q
    qt = jnp.transpose(qt, (1, 2, 0)).astype(jnp.bfloat16)  # [ng, 128, Qp]

    # Codes in the grouped [ng, N, G] layout (group-major so the block's
    # trailing dims satisfy Mosaic's (8, 128)-or-equal rule); padding rows
    # use code K (no one-hot lane -> decodes to zero; masked by callers'
    # valid bitmaps).
    codes = codes.astype(jnp.int32).reshape(n, ng, g)
    pad_n = (-n) % block_n
    if pad_n:
        codes = jnp.pad(codes, ((0, pad_n), (0, 0), (0, 0)),
                        constant_values=k)
    n_pad = n + pad_n
    codes = jnp.transpose(codes, (1, 0, 2))  # [ng, N_pad, G]

    out = pl.pallas_call(
        _decode_score_kernel,
        # q-blocks OUTER (usually 1), n-blocks middle, groups MINOR: the
        # out block accumulates across consecutive group steps in VMEM and
        # is written back once per (q, n) cell.
        grid=(q_pad // block_q, n_pad // block_n, ng),
        in_specs=[
            pl.BlockSpec((1, block_n, g), lambda i, j, gi: (gi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * k, _LANES), lambda i, j, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES, block_q), lambda i, j, gi: (gi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_q), lambda i, j, gi: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # decode (lane-padded) + score, per q-block sweep
            flops=(q_pad // block_q)
            * (2 * n_pad * m * k * _LANES)
            + 2 * n_pad * ng * _LANES * q_pad,
            bytes_accessed=(q_pad // block_q)
            * (n_pad * m * 4 + (n_pad // block_n) * ng * g * k * _LANES * 2)
            + n_pad * q_pad * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(codes, gcb, qt)
    return jnp.transpose(out[:n, :qn], (1, 0))
