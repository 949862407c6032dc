"""Device grouped aggregation (XLA path).

The reference's GroupBy is a per-row hash-map interpreter loop
(reference: sql/statements/select/groupby.cc:69-219). Here grouping is
a whole-column device program: lexicographic multi-key sort
(jax.lax.sort — bitonic on TPU), segment-boundary detection, and
segment reductions, all inside one jit. Shapes are static: aggregates
are returned padded to `num_segments` groups with a group-count scalar.

This is the correctness-grade device kernel; the Pallas hash-aggregate
(eventql_tpu.kernels.pallas_groupby) is the speed-of-light path for
low-cardinality keys.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

U64_SIGN = jnp.uint64(1 << 63)


def _sortable_u32_from_f32(x32: jax.Array) -> jax.Array:
    """IEEE-754 total-order trick on float32 (32-bit bitcasts compile
    everywhere, unlike 64-bit ones on TPU)."""
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    sign = bits >> jnp.uint32(31)
    return jnp.where(sign == 1, ~bits, bits ^ jnp.uint32(1 << 31))


def f64_sort_bits(data: jax.Array) -> jax.Array:
    """float64 -> uint64 keys whose unsigned ascending order equals the
    float order (and equality <-> key equality), for sort/group keys.

    On CPU this is the classic IEEE total-order bit trick. On TPU,
    float64 is emulated as a float-float (f32 hi + f32 residual) pair —
    the f64 bit pattern never exists on device and any 64-bit
    bitcast-convert is unimplemented in the X64-rewrite pass — so the
    key is built from the emulation's own parts: round to f32 (hi),
    take the residual (lo), and pack their 32-bit total-order keys as
    (k32(hi) << 32) | k32(lo). Rounding is monotone and the residual
    orders values sharing a hi, so key order equals FF value order;
    precision beyond the ~49-bit FF mantissa is the device's own
    arithmetic precision, not an artifact of the key."""
    if jax.default_backend() == "cpu":
        words = jax.lax.bitcast_convert_type(data, jnp.uint32)
        lo = words[..., 0].astype(jnp.uint64)
        hi = words[..., 1].astype(jnp.uint64)
        bits = (hi << jnp.uint64(32)) | lo
        sign = bits >> jnp.uint64(63)
        return jnp.where(sign == 1, ~bits, bits ^ U64_SIGN)
    hi = data.astype(jnp.float32)
    lo = (data - hi.astype(jnp.float64)).astype(jnp.float32)
    khi = _sortable_u32_from_f32(hi).astype(jnp.uint64)
    klo = _sortable_u32_from_f32(lo).astype(jnp.uint64)
    return (khi << jnp.uint64(32)) | klo


def sortable_u64(data: jax.Array, descending: bool = False) -> jax.Array:
    """Map a column to uint64 keys whose unsigned order equals the SQL
    order of the values (int64: flip sign bit; float64: IEEE-754 total
    order trick; bool/uint: identity)."""
    if data.dtype == jnp.uint64:
        k = data
    elif data.dtype == jnp.int64:
        k = data.astype(jnp.uint64) ^ U64_SIGN
    elif data.dtype == jnp.float64:
        k = f64_sort_bits(data)
    elif data.dtype == jnp.bool_:
        k = data.astype(jnp.uint64)
    elif data.dtype in (jnp.int32, jnp.uint32, jnp.int16, jnp.uint16):
        # via int64 so signed narrow values keep numeric order (a direct
        # uint64 cast would sign-extend negatives above every positive)
        k = data.astype(jnp.int64).astype(jnp.uint64) ^ U64_SIGN
    else:
        k = data.astype(jnp.uint64)
    if descending:
        k = ~k
    return k


def group_ids(
    key_arrays: Sequence[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Assign group ids by multi-key sort.

    Returns (perm, gid_sorted, num_groups):
      perm        — permutation sorting rows by key tuple
      gid_sorted  — group id of each sorted row (dense, sorted order)
      num_groups  — scalar count of distinct key tuples
    """
    n = key_arrays[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int64)
    operands = [sortable_u64(k) for k in key_arrays] + [iota]
    sorted_ops = jax.lax.sort(operands, num_keys=len(key_arrays))
    sorted_keys, perm = sorted_ops[:-1], sorted_ops[-1]

    diff = jnp.zeros(n, dtype=jnp.bool_)
    for sk in sorted_keys:
        diff = diff | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]]
        )
    gid = jnp.cumsum(diff.astype(jnp.int64)) - 1
    num_groups = gid[-1] + 1 if n > 0 else jnp.int64(0)
    return perm, gid, num_groups


@functools.partial(jax.jit, static_argnames=("agg_kinds",))
def grouped_aggregate(
    key_arrays: Tuple[jax.Array, ...],
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
):
    """Aggregate value_arrays per distinct key tuple.

    agg_kinds[i] applies to value_arrays[i]: one of
    'sum', 'count', 'min', 'max', 'mean'.

    Returns (group_keys, aggregates, first_index, num_groups); all
    outputs padded to n rows, groups ordered by sorted key order.
    first_index is each group's smallest original row index (for
    first-row-wins semantics and first-occurrence ordering).
    """
    n = key_arrays[0].shape[0]
    perm, gid, num_groups = group_ids(key_arrays)

    group_keys = tuple(k[perm] for k in key_arrays)
    # representative (first sorted row) of each group
    seg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), gid[1:] != gid[:-1]]
    )
    group_keys = tuple(
        jax.ops.segment_max(k, gid, num_segments=n) for k in group_keys
    )

    first_index = jax.ops.segment_min(perm, gid, num_segments=n)

    outs = []
    for vals, kind in zip(value_arrays, agg_kinds):
        v = vals[perm]
        if kind == "count":
            out = jax.ops.segment_sum(
                jnp.ones(n, dtype=jnp.uint64), gid, num_segments=n
            )
        elif kind == "sum":
            out = jax.ops.segment_sum(v, gid, num_segments=n)
        elif kind == "min":
            out = jax.ops.segment_min(v, gid, num_segments=n)
        elif kind == "max":
            out = jax.ops.segment_max(v, gid, num_segments=n)
        elif kind == "mean":
            s = jax.ops.segment_sum(v.astype(jnp.float64), gid, num_segments=n)
            c = jax.ops.segment_sum(
                jnp.ones(n, dtype=jnp.float64), gid, num_segments=n
            )
            out = s / c
        else:
            raise ValueError(f"unknown aggregate kind {kind}")
        outs.append(out)

    return group_keys, tuple(outs), first_index, num_groups


@functools.partial(jax.jit, static_argnames=("agg_kinds", "num_buckets"))
def direct_grouped_aggregate(
    mask: jax.Array,
    keys: jax.Array,
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
    num_buckets: int,
):
    """One-pass scatter aggregation for bounded integer keys
    (0 <= key < num_buckets) — no sort. This is the fast path for
    low-cardinality GROUP BY (dictionary-encoded strings, bucketed
    timestamps): a single fused scan computes every aggregate.

    Masked-out rows scatter to bucket `num_buckets` (dropped).
    Returns (bucket_occupied, aggregates) padded to num_buckets.
    """
    n = keys.shape[0]
    gid = jnp.where(mask, keys.astype(jnp.int32), num_buckets)
    nb = num_buckets + 1

    occupied = (
        jax.ops.segment_sum(jnp.ones(n, jnp.int32), gid, num_segments=nb)[:-1]
        > 0
    )

    outs = []
    for vals, kind in zip(value_arrays, agg_kinds):
        if kind == "count":
            out = jax.ops.segment_sum(
                jnp.ones(n, dtype=jnp.uint64), gid, num_segments=nb
            )
        elif kind == "sum":
            out = jax.ops.segment_sum(vals, gid, num_segments=nb)
        elif kind == "min":
            out = jax.ops.segment_min(vals, gid, num_segments=nb)
        elif kind == "max":
            out = jax.ops.segment_max(vals, gid, num_segments=nb)
        elif kind == "mean":
            s = jax.ops.segment_sum(
                vals.astype(jnp.float64), gid, num_segments=nb
            )
            c = jax.ops.segment_sum(jnp.ones(n, jnp.float64), gid, num_segments=nb)
            out = s / c
        else:
            raise ValueError(f"unknown aggregate kind {kind}")
        outs.append(out[:-1])

    return occupied, tuple(outs)


@functools.partial(jax.jit, static_argnames=("agg_kinds",))
def masked_grouped_aggregate(
    mask: jax.Array,
    key_arrays: Tuple[jax.Array, ...],
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
):
    """grouped_aggregate with a WHERE mask fused in: masked-out rows are
    routed to a sentinel key group that sorts last and is excluded from
    the group count — filter + aggregate in one device program, no
    host-side compaction (the reference evaluates the predicate vector
    then re-scans: sql/runtime/vm.cc:231-272)."""
    n = key_arrays[0].shape[0]
    # sentinel: all-ones keys sort last in unsigned order
    sentinel = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    keyed = tuple(
        jnp.where(mask, sortable_u64(k), sentinel) for k in key_arrays
    )
    # re-wrap: keys already sortable; use identity mapping below
    iota = jnp.arange(n, dtype=jnp.int64)
    operands = list(keyed) + [iota]
    sorted_ops = jax.lax.sort(operands, num_keys=len(keyed))
    sorted_keys, perm = sorted_ops[:-1], sorted_ops[-1]
    mask_sorted = mask[perm]

    diff = jnp.zeros(n, dtype=jnp.bool_)
    for sk in sorted_keys:
        diff = diff | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]]
        )
    gid = jnp.cumsum(diff.astype(jnp.int64)) - 1
    # number of groups among masked-in rows
    num_groups = jnp.where(
        mask_sorted.any(),
        jnp.max(jnp.where(mask_sorted, gid, -1)) + 1,
        0,
    )

    group_keys = tuple(
        jax.ops.segment_max(k[perm], gid, num_segments=n) for k in key_arrays
    )
    first_index = jax.ops.segment_min(
        jnp.where(mask_sorted, perm, jnp.int64(n)), gid, num_segments=n
    )

    outs = []
    ones = jnp.where(mask_sorted, 1, 0)
    for vals, kind in zip(value_arrays, agg_kinds):
        v = vals[perm]
        if kind == "count":
            out = jax.ops.segment_sum(
                ones.astype(jnp.uint64), gid, num_segments=n
            )
        elif kind == "sum":
            vz = jnp.where(mask_sorted, v, jnp.zeros((), v.dtype))
            out = jax.ops.segment_sum(vz, gid, num_segments=n)
        elif kind in ("min", "max"):
            out = (
                jax.ops.segment_min(v, gid, num_segments=n)
                if kind == "min"
                else jax.ops.segment_max(v, gid, num_segments=n)
            )
        elif kind == "mean":
            vz = jnp.where(mask_sorted, v.astype(jnp.float64), 0.0)
            s = jax.ops.segment_sum(vz, gid, num_segments=n)
            c = jax.ops.segment_sum(ones.astype(jnp.float64), gid, num_segments=n)
            out = s / c
        else:
            raise ValueError(f"unknown aggregate kind {kind}")
        outs.append(out)

    return group_keys, tuple(outs), first_index, num_groups


def masked_grouped_count_distinct(
    mask: jax.Array,
    key_arrays: Tuple[jax.Array, ...],
    values: jax.Array,
):
    """Per group: the number of distinct value payloads among masked-in
    rows (the reference's count_distinct is an exact hash-set per
    group, sql/expressions/aggregate.cc:74-120; the host engine
    np.uniques (gid, value) pairs). One extra sort keyed by
    (keys..., value); group order and count match
    masked_grouped_aggregate exactly (same key sort), so outputs align
    positionally with its groups."""
    n = key_arrays[0].shape[0]
    sentinel = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    keyed = tuple(
        jnp.where(mask, sortable_u64(k), sentinel) for k in key_arrays
    )
    vkey = jnp.where(mask, sortable_u64(values), sentinel)
    iota = jnp.arange(n, dtype=jnp.int64)
    sorted_ops = jax.lax.sort(
        list(keyed) + [vkey, iota], num_keys=len(keyed) + 1
    )
    skeys, svals, perm = sorted_ops[:-2], sorted_ops[-2], sorted_ops[-1]
    mask_sorted = mask[perm]

    group_diff = jnp.zeros(n, dtype=jnp.bool_)
    for sk in skeys:
        group_diff = group_diff | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]]
        )
    val_diff = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), svals[1:] != svals[:-1]]
    )
    new_distinct = (group_diff | val_diff) & mask_sorted
    gid = jnp.cumsum(group_diff.astype(jnp.int64)) - 1
    counts = jax.ops.segment_sum(
        new_distinct.astype(jnp.uint64), gid, num_segments=n
    )
    return counts
