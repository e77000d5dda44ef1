"""Pallas kernel correctness vs the XLA reference path.

Runs in interpret mode on the CPU test mesh; the same code compiles via
Mosaic on TPU (exercised by bench.py / verify drives).
"""

import jax.numpy as jnp
import numpy as np

from opensearch_jvector_tpu.ops import adc as adc_ops
from opensearch_jvector_tpu.ops.pallas.adc_kernel import fused_adc_scan


def test_fused_adc_matches_xla_scan():
    rng = np.random.default_rng(0)
    n, m, k, q = 300, 8, 64, 4  # n not a block multiple -> exercises padding
    codes = jnp.asarray(rng.integers(0, k, size=(n, m)), jnp.int32)
    luts = jnp.asarray(rng.standard_normal((q, m, k)).astype(np.float32))
    ref = adc_ops.lookup_scan(luts, codes)
    out = fused_adc_scan(luts, codes, block_n=128)
    assert out.shape == (q, n)
    # bf16 LUT quantization: per-entry rel err ~2^-8 accumulated over M
    # subspaces -> abs error up to ~M * 0.004 on unit-scale tables
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=4e-3 * 8)


def test_fused_adc_uint8_codes():
    rng = np.random.default_rng(1)
    n, m, k, q = 128, 4, 256, 2
    codes = jnp.asarray(rng.integers(0, k, size=(n, m)), jnp.uint8)
    luts = jnp.asarray(rng.standard_normal((q, m, k)).astype(np.float32))
    ref = adc_ops.lookup_scan(luts, codes.astype(jnp.int32))
    out = fused_adc_scan(luts, codes, block_n=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=4e-3 * 4)


def test_exact_topk_wide_matches_lax_topk():
    import jax
    import jax.numpy as jnp

    from opensearch_jvector_tpu.ops.topk import exact_topk_wide

    rng = np.random.default_rng(3)
    for qn, b, k in [(4, 20000, 10), (2, 4096, 5), (3, 12289, 50),
                     (1, 64, 7)]:
        s = jnp.asarray(rng.standard_normal((qn, b)), jnp.float32)
        ws, wi = exact_topk_wide(s, k)
        ts, ti = jax.lax.top_k(s, min(k, b))
        np.testing.assert_allclose(np.asarray(ws), np.asarray(ts))
        # ids may differ on exact score ties; values are the contract
        got = np.take_along_axis(np.asarray(s), np.asarray(wi), axis=1)
        np.testing.assert_allclose(got, np.asarray(ts))
