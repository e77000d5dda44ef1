"""Fused decode-in-VMEM PQ scan kernel vs the decode-then-einsum oracle.

The kernel contract (ops/pallas/pq_scan_kernel.py): raw inner products
(q - center) . decode_nocenter(codes), bf16 operand rounding. Mirrors the
value convention of ops/adc.py so euclidean callers can fold
q2 + dec_sq - 2*ip exactly like reader._decoded_scan_scores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensearch_jvector_tpu.ops.pallas.pq_scan_kernel import (
    fused_decode_scan,
    pick_group_size,
)


def _oracle_ip(q, codes, codebooks):
    """f32 decode (no center) + einsum, with the kernel's bf16 rounding."""
    m, k, dsub = codebooks.shape
    dec = codebooks[np.arange(m)[None, :], codes.astype(np.int64)]
    dec = dec.reshape(codes.shape[0], -1).astype(jnp.bfloat16)
    return jnp.einsum("qd,nd->qn", q.astype(jnp.bfloat16), dec,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "n,qn,m,k,dsub",
    [
        (300, 7, 64, 256, 2),     # sift-like: one group of 64
        (257, 16, 192, 256, 5),   # 960d default schedule: G=24, ng=8
        (64, 3, 8, 16, 8),        # tiny K, dsub=8
        (1030, 130, 12, 256, 16), # GIST 64x-compression-like, Q > 128 pad
        (16, 1, 6, 256, 21),      # odd dsub, Q=1
    ],
)
def test_fused_decode_scan_matches_oracle(n, qn, m, k, dsub):
    rng = np.random.default_rng(7)
    d = m * dsub
    codes = rng.integers(0, k, (n, m)).astype(np.uint8)
    codebooks = rng.standard_normal((m, k, dsub)).astype(np.float32)
    q = rng.standard_normal((qn, d)).astype(np.float32)

    ip = fused_decode_scan(jnp.asarray(q), jnp.asarray(codes),
                           jnp.asarray(codebooks))
    ref = _oracle_ip(q, codes, codebooks)
    assert ip.shape == (qn, n)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_group_size_selection():
    assert pick_group_size(64, 2) == 16
    assert pick_group_size(192, 5) == 16
    assert pick_group_size(60, 16) == 6
    assert pick_group_size(8, 128) == 1
    assert pick_group_size(8, 129) is None


def test_euclidean_value_fold_matches_lut_scan():
    """q2 + dec_sq - 2*ip reproduces the LUT ADC accumulated distances
    (global clamp form, reader._decoded_scan_scores parity)."""
    from opensearch_jvector_tpu.ops import adc as adc_ops

    rng = np.random.default_rng(3)
    n, qn, m, k, dsub = 120, 5, 16, 64, 4
    d = m * dsub
    codes = rng.integers(0, k, (n, m)).astype(np.uint8)
    codebooks = rng.standard_normal((m, k, dsub)).astype(np.float32)
    q = rng.standard_normal((qn, d)).astype(np.float32)

    ip = np.asarray(fused_decode_scan(jnp.asarray(q), jnp.asarray(codes),
                                      jnp.asarray(codebooks)))
    dec_sq = np.asarray(adc_ops.lookup_scan(
        jnp.einsum("mkd,mkd->mk", codebooks, codebooks)[None],
        jnp.asarray(codes.astype(np.int32)),
    ))[0]
    q2 = (q * q).sum(-1)[:, None]
    fused_d2 = np.maximum(q2 + dec_sq[None, :] - 2.0 * ip, 0.0)

    luts = adc_ops.build_luts(
        jnp.asarray(q.reshape(qn, m, dsub)), jnp.asarray(codebooks),
        euclidean=True,
    )
    lut_d2 = np.asarray(adc_ops.lookup_scan(luts,
                                            jnp.asarray(codes.astype(np.int32))))
    np.testing.assert_allclose(fused_d2, lut_d2, rtol=5e-2, atol=5e-2)
