"""Pallas TPU hash-aggregate kernel.

Re-casts GROUP BY aggregation as MXU matrix multiplication:
for each row block, build a (B, K) one-hot of the bucket ids in VMEM
and multiply the value-limb matrix against it. TPU scatter serializes
(~5 Mrows/s measured) and 64-bit sorts are emulated, so this is the
speed-of-light shape for bounded-key aggregation — the structural
replacement for the reference's per-row hash-map loop (reference:
sql/statements/select/groupby.cc:69-219).

Exactness: uint64 values enter as two uint32 words and are split into
8-bit limbs inside the kernel, so every f32 MAC and per-flush partial
stays below 2^24 (exact); the cross-block combine runs in f64 (exact
< 2^53) and reassembles uint64 with wraparound.

Mosaic notes (this jax version, axon forward-compat mode):
* no 64-bit types in-kernel, and the i32→f32 / bool→f32 convert rules
  recurse — all int→float conversion uses the 2^23 magic-number bitcast
  trick instead
* the kernel is traced under jax.enable_x64(False) because x64 grid
  index arithmetic emits i64 converts
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024
FLUSH_EVERY = 4  # f32 partials stay exact: 4 * B * 255 < 2^24 for B=1024

_MAGIC_I = 0x4B000000  # f32 bit pattern of 2^23
_MAGIC_F = 8388608.0  # 2^23


def _i32_to_f32(v):
    """Exact int→float for 0 <= v < 2^23 without a convert op
    (mosaic's i32→f32 rule recurses): OR the value into the mantissa of
    2^23 and subtract."""
    bits = _MAGIC_I | v
    return pltpu.bitcast(bits, jnp.float32) - jnp.float32(_MAGIC_F)


def _agg_kernel(
    gid_ref, lo_ref, hi_ref, mask_ref, out_ref, acc_ref, *, num_buckets, flush_every, r_pad
):
    i = pl.program_id(0)

    @pl.when(i % flush_every == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    gid = gid_ref[0, :, :]  # (1, B) int32 — kept 2D for mosaic
    lo = lo_ref[0, :, :]  # (1, B) int32 (low u32 word)
    hi = hi_ref[0, :, :]  # (1, B) int32 (high u32 word)
    m = mask_ref[0, :, :]  # (1, B) int32 0/1

    B = gid.shape[1]
    mf = _i32_to_f32(m)  # (1, B) f32 0/1

    # value limbs: 8 rows of 8-bit limbs, masked
    rows = [mf]  # ones-row = count/occupancy
    for word in (lo, hi):
        for j in range(4):
            limb = (word >> (8 * j)) & 0xFF
            rows.append(_i32_to_f32(limb) * mf)
    while len(rows) < r_pad:
        rows.append(jnp.zeros((1, B), jnp.float32))
    limbs = jnp.concatenate(rows, axis=0)  # (r_pad, B)

    # one-hot as (K, B) so both matmul operands contract on B with no
    # in-kernel transposes
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (num_buckets, B), 0)
    # select in f32 then truncate to bf16: selecting bf16 directly off
    # an i1 mask trips a mosaic relayout bug ((8,128) mask vs (16,128)
    # bf16 tiling)
    onehot = jnp.where(gid == iota_k, jnp.float32(1), jnp.float32(0)).astype(
        jnp.bfloat16
    )
    # mask is folded into the limb rows, not the one-hot: masked rows
    # multiply in zeros everywhere. bf16 operands are exact here (both
    # the one-hot and 8-bit limbs are integers < 256, within bf16's
    # 8-bit significand) and run the MXU at its native rate; products
    # accumulate in f32.

    acc_ref[:, :] += jax.lax.dot_general(
        limbs.astype(jnp.bfloat16),
        onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when((i + 1) % flush_every == 0)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


R_PAD = 16  # ones-row + 8 limb rows, padded to the f32 sublane tile


def _call_kernel(gid_blocks, lo_blocks, hi_blocks, mask_blocks, num_buckets, nflush, block):
    nb = gid_blocks.shape[0]
    return pl.pallas_call(
        functools.partial(
            _agg_kernel,
            num_buckets=num_buckets,
            flush_every=FLUSH_EVERY,
            r_pad=R_PAD,
        ),
        interpret=jax.default_backend() != "tpu",
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R_PAD, num_buckets),
            lambda i: (i // FLUSH_EVERY, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nflush, R_PAD, num_buckets), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R_PAD, num_buckets), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block * R_PAD * num_buckets,
            bytes_accessed=nb * block * 16 + nflush * R_PAD * num_buckets * 4,
            transcendentals=0,
        ),
    )(gid_blocks, lo_blocks, hi_blocks, mask_blocks)


@functools.partial(jax.jit, static_argnames=("num_buckets", "block"))
def pallas_sum_count(
    mask: jax.Array,
    gid: jax.Array,
    values: jax.Array,
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
):
    """Fused filter + GROUP BY sum(values), count(*) for bounded keys.

    Returns (counts u64[K], sums u64[K]). Exact (see module docstring).
    """
    n = gid.shape[0]
    nflush = -(-n // (block * FLUSH_EVERY))
    nb = nflush * FLUSH_EVERY
    pad = nb * block - n

    vals = values.astype(jnp.uint64)
    lo = (vals & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (vals >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)

    gid_p = jnp.pad(gid.astype(jnp.int32), (0, pad)).reshape(nb, 1, block)
    lo_p = jnp.pad(lo, (0, pad)).reshape(nb, 1, block)
    hi_p = jnp.pad(hi, (0, pad)).reshape(nb, 1, block)
    mask_p = (
        jnp.pad(mask, (0, pad)).astype(jnp.int32).reshape(nb, 1, block)
    )

    with jax.enable_x64(False):
        out = _call_kernel(gid_p, lo_p, hi_p, mask_p, num_buckets, nflush, block)

    acc = out.astype(jnp.float64).sum(axis=0)  # (R_PAD, K), exact

    counts = acc[0].astype(jnp.uint64)
    total = jnp.zeros((num_buckets,), jnp.uint64)
    for i in range(8):
        total = total + (acc[1 + i].astype(jnp.uint64) << jnp.uint64(8 * i))
    return counts, total


@functools.partial(
    jax.jit, static_argnames=("num_buckets", "block", "agg_kinds")
)
def pallas_grouped_aggregate(
    mask: jax.Array,
    gid: jax.Array,
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
):
    """Compatibility wrapper over pallas_sum_count for ('sum','count')
    aggregate sets; other kinds fall back to the XLA one-hot kernel
    (kernels/onehot_agg.py)."""
    if set(agg_kinds) <= {"sum", "count"}:
        sum_vals = None
        for vals, kind in zip(value_arrays, agg_kinds):
            if kind == "sum":
                sum_vals = vals
        if sum_vals is None:
            sum_vals = jnp.zeros_like(gid, dtype=jnp.uint64)
        counts, sums = pallas_sum_count(
            mask, gid, sum_vals, num_buckets, block
        )
        outs = []
        for vals, kind in zip(value_arrays, agg_kinds):
            outs.append(counts if kind == "count" else sums)
        return counts, tuple(outs)

    from eventql_tpu.kernels.onehot_agg import onehot_grouped_aggregate

    return onehot_grouped_aggregate(
        mask, gid, value_arrays, agg_kinds, num_buckets
    )
