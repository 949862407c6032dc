"""Device hash-join kernels.

The reference's hash join builds a CPU multimap over the joined table
and probes per row (reference: sql/statements/select/hash_join.cc:
29-33, 123-230). The TPU-native shape avoids pointer-chasing entirely:

* build: sort the build side's keys once (order-preserving u64
  transform + lax.sort)
* probe: vectorized binary search (searchsorted) — every probe row
  resolves its match range in log2(build) steps, fully parallel
* fact-dim join + aggregate (BASELINE config 3) fuses the probe with
  the MXU hash-aggregate so no join pairs ever materialize

Unique-key (dim) joins return exact matches; multi-match joins expose
(start, count) ranges for the caller to expand (host path) or to feed
range-aware aggregation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from eventql_tpu.kernels.groupby import sortable_u64


@jax.jit
def build_side(keys: jax.Array):
    """Sort the build side: returns (sorted_transformed_keys, perm)."""
    k = sortable_u64(keys)
    iota = jnp.arange(k.shape[0], dtype=jnp.int64)
    sk, perm = jax.lax.sort([k, iota], num_keys=1)
    return sk, perm


@jax.jit
def probe_ranges(sorted_keys: jax.Array, probe_keys: jax.Array):
    """For each probe key: (start, count) of its match range in the
    sorted build side."""
    pk = sortable_u64(probe_keys)
    start = jnp.searchsorted(sorted_keys, pk, side="left")
    end = jnp.searchsorted(sorted_keys, pk, side="right")
    return start, (end - start)


@jax.jit
def dim_join_gather(
    sorted_keys: jax.Array, perm: jax.Array, probe_keys: jax.Array
):
    """Unique-key join: per probe row, the build row index (or -1)."""
    pk = sortable_u64(probe_keys)
    pos = jnp.searchsorted(sorted_keys, pk, side="left")
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    matched = sorted_keys[pos] == pk
    idx = jnp.where(matched, perm[pos], -1)
    return idx, matched


@functools.partial(jax.jit, static_argnames=("num_buckets",))
def fact_dim_join_aggregate(
    fact_keys: jax.Array,
    fact_values: jax.Array,
    fact_mask: jax.Array,
    dim_keys: jax.Array,
    dim_bucket: jax.Array,
    num_buckets: int,
):
    """SELECT d.bucket, count(*), sum(f.value)
       FROM fact f JOIN dim d ON f.key = d.key [WHERE mask]
       GROUP BY d.bucket — as one device program.

    dim_bucket must be int32 in [0, num_buckets). Unmatched fact rows
    drop (inner join). Returns (counts u64[K], sums u64[K])."""
    from eventql_tpu.kernels.pallas_groupby import pallas_sum_count

    sk, perm = build_side(dim_keys)
    idx, matched = dim_join_gather(sk, perm, fact_keys)
    safe_idx = jnp.where(matched, idx, 0)
    gid = dim_bucket[safe_idx].astype(jnp.int32)
    mask = fact_mask & matched
    return pallas_sum_count(mask, gid, fact_values, num_buckets)
