"""MXU one-hot matmul aggregation — the TPU-native hash-aggregate.

TPU scatter is serialized (segment_sum measured ~5 Mrows/s) and 64-bit
bitonic sorts are emulated, so the fast GROUP BY path re-casts
aggregation as matrix multiplication on the MXU:

    partial(limb, bucket) = values_limbs(limb, B) @ one_hot(B, K)

with uint64 values decomposed into 8-bit limbs so every f32 MAC and
per-block partial sum is exact (limb < 2^8, block B <= 2^16 →
partials < 2^24 = f32's exact-integer range). Block partials are
accumulated in f64 (exact < 2^53) and recombined into uint64 with
wraparound. Counts ride along as a ones-row; float sums use a
compensated two-limb split.

This is the structural replacement for the reference's hash-map
aggregation loop (reference: sql/statements/select/groupby.cc:69-219),
shaped for the systolic array instead of a CPU hash table.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_BLOCK = 4096


def _u64_limbs(vals: jax.Array) -> jax.Array:
    """(8, N) f32 array of 8-bit limbs of uint64 values."""
    shifts = jnp.arange(8, dtype=jnp.uint64) * jnp.uint64(8)
    limbs = (vals[None, :] >> shifts[:, None]) & jnp.uint64(0xFF)
    return limbs.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("num_buckets", "block", "agg_kinds")
)
def onehot_grouped_aggregate(
    mask: jax.Array,
    gid: jax.Array,
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
):
    """Aggregate per bounded integer key (0 <= gid < num_buckets).

    agg_kinds: 'count' | 'sum' (uint64) | 'fsum' (float64).
    Returns (counts_occupancy, aggregates) with aggregates matching
    value_arrays/agg_kinds order; all arrays have num_buckets entries.
    """
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    gid_p = jnp.pad(gid.astype(jnp.int32), (0, pad))
    mask_p = jnp.pad(mask, (0, pad))

    # build the stacked limb matrix: one ones-row (occupancy/count) +
    # rows per aggregate
    rows = [jnp.ones((n,), jnp.float32)]
    row_map = []  # (kind, start_row, n_rows) per aggregate
    for vals, kind in zip(value_arrays, agg_kinds):
        if kind == "count":
            row_map.append(("count", 0, 1))
        elif kind == "sum":
            start = len(rows)
            limbs = _u64_limbs(vals.astype(jnp.uint64))
            rows.extend([limbs[i] for i in range(8)])
            row_map.append(("sum", start, 8))
        elif kind == "fsum":
            start = len(rows)
            rows.append(vals.astype(jnp.float32))
            # compensation row: the f32 rounding error, so the final
            # result is f32+f32 ~ f64-accurate
            err = (vals - vals.astype(jnp.float32).astype(jnp.float64)).astype(
                jnp.float32
            )
            rows.append(err)
            row_map.append(("fsum", start, 2))
        else:
            raise ValueError(f"unknown aggregate kind {kind}")

    R = len(rows)
    limb_mat = jnp.stack(rows, axis=0)
    limb_mat = jnp.pad(limb_mat, ((0, 0), (0, pad)))
    limb_mat = limb_mat * mask_p[None, :].astype(jnp.float32)

    limb_blocks = limb_mat.reshape(R, nb, block).transpose(1, 0, 2)
    gid_blocks = gid_p.reshape(nb, block)
    mask_blocks = mask_p.reshape(nb, block)

    iota_k = jnp.arange(num_buckets, dtype=jnp.int32)

    def step(acc, xs):
        limbs_b, gid_b, mask_b = xs
        onehot = (
            (gid_b[:, None] == iota_k[None, :]) & mask_b[:, None]
        ).astype(jnp.float32)
        partial = jnp.dot(
            limbs_b, onehot, preferred_element_type=jnp.float32
        )  # (R, K) — MXU
        return acc + partial.astype(jnp.float64), None

    acc0 = jnp.zeros((R, num_buckets), jnp.float64)
    acc, _ = jax.lax.scan(step, acc0, (limb_blocks, gid_blocks, mask_blocks))

    counts = acc[0].astype(jnp.uint64)
    outs = []
    for (kind, start, nrows) in row_map:
        if kind == "count":
            outs.append(counts)
        elif kind == "sum":
            total = jnp.zeros((num_buckets,), jnp.uint64)
            for i in range(8):
                limb_sum = acc[start + i].astype(jnp.uint64)
                total = total + (limb_sum << jnp.uint64(8 * i))
            outs.append(total)
        elif kind == "fsum":
            outs.append(acc[start] + acc[start + 1])
    return counts, tuple(outs)
