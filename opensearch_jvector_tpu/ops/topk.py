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
