"""Top-k selection helpers (device-side, static shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def topk_scores(scores: jax.Array, ids: jax.Array, k: int):
    """Select top-k (score desc) pairs along the last axis.

    scores: [..., C] f32; ids: [..., C] int32 -> ([..., k], [..., k]).
    """
    top_s, idx = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(ids, idx, axis=-1)
    return top_s, top_i


def masked_topk(scores: jax.Array, mask: jax.Array, k: int):
    """Top-k with invalid entries pushed to -inf. Returns (scores, indices)."""
    return jax.lax.top_k(jnp.where(mask, scores, NEG_INF), k)


def merge_topk(
    scores_a: jax.Array, ids_a: jax.Array, scores_b: jax.Array, ids_b: jax.Array, k: int
):
    """Merge two top-k lists into one (used for shard-level result merging)."""
    s = jnp.concatenate([scores_a, scores_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    return topk_scores(s, i, k)


def exact_topk_wide(scores: jax.Array, k: int, sub: int = 4096):
    """Exact top-k over very wide rows, [Q, B] -> ([Q, k], [Q, k] indices).

    `lax.top_k` is sort-bound on TPU (~80s for [512, 1M] f32); a two-stage
    exact reduction — top-k within `sub`-wide blocks, then top-k over the
    survivors — is O(B) with a small constant and exact (every global
    top-k element is top-k within its own block)."""
    qn, b = scores.shape
    if b <= sub:
        return jax.lax.top_k(scores, min(k, b))
    pad = (-b) % sub
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    s3 = scores.reshape(qn, -1, sub)
    kk = min(k, sub)
    ts, ti = jax.lax.top_k(s3, kk)  # [Q, nb, kk]
    base = (jnp.arange(s3.shape[1]) * sub)[None, :, None]
    flat_s = ts.reshape(qn, -1)
    flat_i = (ti + base).reshape(qn, -1)
    fs, sel = jax.lax.top_k(flat_s, min(k, flat_s.shape[1]))
    return fs, jnp.take_along_axis(flat_i, sel, axis=1)
