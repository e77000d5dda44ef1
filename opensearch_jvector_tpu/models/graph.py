"""Vamana graph data model (TPU-resident, static shapes).

Replaces jVector's `OnHeapGraphIndex` / `OnDiskGraphIndex` pair with a single
dense representation designed for XLA:

  adjacency : int32 [capacity, max_degree]   (-1 padded neighbor lists)
  degrees   : int32 [capacity]
  live      : bool  [capacity]               (False = deleted / hole)
  entry     : int32 scalar                   (medoid ordinal)

Unlike the reference — which juggles four ordinal spaces during merge
(JVectorWriter.java:728-735) — node ids here are a single stable ordinal
space per segment with tombstones (`live`) and an explicit compaction pass
(see index/merge.py). `capacity >= size` leaves headroom for delta inserts
(the incremental-merge path, JVectorWriter.java:1166-1341).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VamanaGraph:
    """Device-resident Vamana graph state (a pytree)."""

    adjacency: jax.Array  # int32 [capacity, max_degree], -1 padded
    degrees: jax.Array  # int32 [capacity]
    live: jax.Array  # bool [capacity]
    entry: jax.Array  # int32 scalar

    @property
    def capacity(self) -> int:
        return self.adjacency.shape[0]

    @property
    def max_degree(self) -> int:
        return self.adjacency.shape[1]

    def size(self) -> int:
        """Number of live nodes (host sync)."""
        return int(jnp.sum(self.live))

    def id_upper_bound(self) -> int:
        """1 + highest ordinal ever assigned (mirrors getIdUpperBound)."""
        deg_used = np.asarray(self.live)
        nz = np.nonzero(deg_used)[0]
        return int(nz[-1]) + 1 if nz.size else 0

    @staticmethod
    def empty(capacity: int, max_degree: int) -> "VamanaGraph":
        return VamanaGraph(
            adjacency=jnp.full((capacity, max_degree), -1, jnp.int32),
            degrees=jnp.zeros((capacity,), jnp.int32),
            live=jnp.zeros((capacity,), bool),
            entry=jnp.int32(0),
        )

    def with_capacity(self, new_capacity: int) -> "VamanaGraph":
        """Grow (never shrink) capacity, preserving contents."""
        if new_capacity <= self.capacity:
            return self
        pad = new_capacity - self.capacity
        return VamanaGraph(
            adjacency=jnp.concatenate(
                [self.adjacency, jnp.full((pad, self.max_degree), -1, jnp.int32)]
            ),
            degrees=jnp.concatenate([self.degrees, jnp.zeros((pad,), jnp.int32)]),
            live=jnp.concatenate([self.live, jnp.zeros((pad,), bool)]),
            entry=self.entry,
        )
