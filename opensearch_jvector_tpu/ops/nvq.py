"""NVQ (non-uniform vector quantization) transcode kernels.

Implements the exact fast-sigmoid math of the reference's NVQ dequantizer
(`logisticNQT` / `logitNQT` bit-twiddling, JVectorIndexQuantization.java:
344-361, itself mirroring jVector's DefaultVectorUtilSupport): a logistic
companding curve quantizes each subvector's floats to bytes; each vector's
subvector carries its own (growthRate, midpoint, minValue, maxValue)
parameters plus the global mean subtracted before encoding
(nvqDequantize, JVectorIndexQuantization.java:319-342).

All ops are elementwise (VPU) and fully batched over [n, M] subvectors.
The parameter *fit* is a vectorized grid search + pick-best-MSE (the
reference library fits per-subvector parameters; the optimization method is
internal to jVector — any fit minimizing reconstruction MSE is conformant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _f2i(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def logistic_nqt(value, alpha, x0):
    """Fast logistic: exact port of the bit-level spec (see module doc).

    y = 2^(p) * m' with the fractional part folded through the mantissa,
    then y / (y + 1).
    """
    temp = value * alpha - alpha * x0
    # Java Math.round(temp + 0.5f) == floor(temp + 1.0)
    p = jnp.floor(temp + 1.0).astype(jnp.int32)
    m = _f2i((temp - p.astype(jnp.float32)) * 0.5 + 1.0)
    t2 = _i2f(m + (p << 23))
    return t2 / (t2 + 1.0)


def logit_nqt(scaled_value, inverse_alpha, x0):
    """Fast inverse logistic (exact bit-level port; see module doc)."""
    z = scaled_value / (1.0 - scaled_value)
    bits = _f2i(z)
    e = bits & jnp.int32(0x7F800000)
    p = ((e >> 23) - 128).astype(jnp.float32)
    m = _i2f((bits & jnp.int32(0x007FFFFF)) + jnp.int32(0x3F800000))
    return (m + p) * inverse_alpha + x0


def _sub_params(growth_rate, midpoint, min_v, max_v):
    """Derived per-subvector constants shared by encode and decode."""
    delta = max_v - min_v
    sgr = growth_rate / jnp.where(delta == 0, 1.0, delta)
    smid = midpoint * delta
    bias = logistic_nqt(min_v, sgr, smid)
    scale = (logistic_nqt(max_v, sgr, smid) - bias) / 255.0
    return sgr, smid, bias, scale


def nvq_encode_subvector(x, growth_rate, midpoint):
    """Encode one subvector x [dsub] -> (bytes u8, min, max).

    Forward transform: byte = round((logistic(x) - bias) / scale).
    """
    min_v, max_v = jnp.min(x), jnp.max(x)
    sgr, smid, bias, scale = _sub_params(growth_rate, midpoint, min_v, max_v)
    y = logistic_nqt(x, sgr, smid)
    b = jnp.clip(jnp.round((y - bias) / jnp.where(scale == 0, 1.0, scale)), 0, 255)
    return b.astype(jnp.uint8), min_v, max_v


def nvq_decode_subvector(b, growth_rate, midpoint, min_v, max_v):
    """Decode bytes [dsub] back to floats (exact reference recon math)."""
    sgr, smid, bias, scale = _sub_params(growth_rate, midpoint, min_v, max_v)
    scaled = b.astype(jnp.float32) * scale + bias
    inv = 1.0 / jnp.where(sgr == 0, 1.0, sgr)
    return logit_nqt(scaled, inv, smid)


# grid of candidate (growthRate, midpoint) pairs for the per-subvector fit
_GR_GRID = jnp.asarray([0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0], jnp.float32)
_MID_GRID = jnp.asarray([0.25, 0.375, 0.5, 0.625, 0.75], jnp.float32)


def _fit_one(x):
    """Fit (growthRate, midpoint) for one subvector by grid-search MSE."""

    def mse(gr, mid):
        b, mn, mx = nvq_encode_subvector(x, gr, mid)
        rec = nvq_decode_subvector(b, gr, mid, mn, mx)
        return jnp.mean((rec - x) ** 2)

    errs = jax.vmap(
        lambda gr: jax.vmap(lambda mid: mse(gr, mid))(_MID_GRID)
    )(_GR_GRID)  # [G, Md]
    flat = errs.reshape(-1)
    best = jnp.argmin(flat)
    gi, mi = best // _MID_GRID.shape[0], best % _MID_GRID.shape[0]
    return _GR_GRID[gi], _MID_GRID[mi]


@functools.partial(jax.jit, static_argnames=("num_subvectors",))
def nvq_encode(
    centered: jax.Array,  # [n, d] vectors with the global mean removed
    num_subvectors: int,
):
    """Encode a corpus: -> (bytes [n, d] u8, params [n, M, 4] f32).

    params[..., :] = (growthRate, midpoint, minValue, maxValue).
    Subvector split is contiguous equal slices (d % M == 0 enforced by the
    model layer).
    """
    n, d = centered.shape
    m = num_subvectors
    dsub = d // m
    xs = centered.reshape(n, m, dsub)

    def enc(x):  # [dsub]
        gr, mid = _fit_one(x)
        b, mn, mx = nvq_encode_subvector(x, gr, mid)
        return b, jnp.stack([gr, mid, mn, mx])

    bytes_, params = jax.vmap(jax.vmap(enc))(xs)
    return bytes_.reshape(n, d), params


@functools.partial(jax.jit, static_argnames=("num_subvectors",))
def nvq_decode(
    bytes_: jax.Array,  # [n, d] u8
    params: jax.Array,  # [n, M, 4]
    global_mean: jax.Array,  # [d]
    num_subvectors: int,
) -> jax.Array:
    """Reconstruct [n, d] floats (adds the global mean back)."""
    n, d = bytes_.shape
    m = num_subvectors
    dsub = d // m
    bs = bytes_.reshape(n, m, dsub)

    def dec(b, p):
        return nvq_decode_subvector(b, p[0], p[1], p[2], p[3])

    rec = jax.vmap(jax.vmap(dec))(bs, params)
    return rec.reshape(n, d) + global_mean[None, :]
