"""Pallas TPU hash-aggregate kernel.

Re-casts GROUP BY aggregation as MXU matrix multiplication:
for each row block, build a (K, B) one-hot of the bucket ids in VMEM
and multiply the value-limb matrix against it. TPU scatter serializes
(~5 Mrows/s measured) and 64-bit sorts are emulated, so this is the
speed-of-light shape for bounded-key aggregation — the structural
replacement for the reference's per-row hash-map loop (reference:
sql/statements/select/groupby.cc:69-219).

Exactness without 64-bit in-kernel types:
* uint64 values enter as two uint32 words, split into 8-bit limbs in
  the kernel; every bf16 operand (one-hot, limb) is an integer < 256 —
  exact in bf16's 8-bit significand — and MACs accumulate in f32
* each VMEM accumulator carries (hi, lo) f32 planes with a periodic
  carry lo → hi at 2^12, so both planes stay inside f32's exact-integer
  range (< 2^24) for up to 2^36 accumulated limb mass — one final tiny
  (2, R, K) output, no large f64 (emulated!) reductions
* the u64 result reassembles host-side as hi*2^12 + lo per limb

Mosaic notes (this jax version, axon forward-compat mode):
* i32→f32 / bool→f32 convert rules recurse — int→float uses the 2^23
  magic-number bitcast trick
* bf16 select off an i1 mask trips a relayout bug — select f32, then
  truncate to bf16
* traced under jax.enable_x64(False): x64 grid-index arithmetic emits
  unsupported i64 converts
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 4096
CARRY_EVERY = 4  # carry cadence: CARRY_EVERY * block * 255 must be < 2^24

_MAGIC_I = 0x4B000000  # f32 bit pattern of 2^23
_MAGIC_F = 8388608.0  # 2^23
_CARRY_BASE = 4096.0  # lo plane carries into hi at 2^12

R_PAD = 16  # ones-row + 8 limb rows, padded to the f32 sublane tile


def _i32_to_f32(v):
    """Exact int→float for 0 <= v < 2^23 without a convert op
    (mosaic's i32→f32 rule recurses): OR the value into the mantissa of
    2^23 and subtract."""
    bits = _MAGIC_I | v
    return pltpu.bitcast(bits, jnp.float32) - jnp.float32(_MAGIC_F)


def _agg_kernel(
    gid_ref, lo_ref, hi_ref, mask_ref, out_ref, acc_lo, acc_hi, *, num_buckets, carry_every
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_lo[:, :] = jnp.zeros_like(acc_lo)
        acc_hi[:, :] = jnp.zeros_like(acc_hi)

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
    while len(rows) < R_PAD:
        rows.append(jnp.zeros((1, B), jnp.float32))
    limbs = jnp.concatenate(rows, axis=0)  # (R_PAD, B)

    # one-hot as (K, B): both matmul operands contract on B, no
    # in-kernel transposes; f32 select then bf16 truncate (see notes)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (num_buckets, B), 0)
    onehot = jnp.where(gid == iota_k, jnp.float32(1), jnp.float32(0)).astype(
        jnp.bfloat16
    )

    acc_lo[:, :] += jax.lax.dot_general(
        limbs.astype(jnp.bfloat16),
        onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(((i + 1) % carry_every == 0) | (i == nb - 1))
    def _():
        # carry multiples of 2^12 from the lo plane into the hi plane;
        # floor(a * 2^-12) is exact for integer a < 2^24
        a = acc_lo[:, :]
        t = jnp.floor(a * jnp.float32(1.0 / _CARRY_BASE))
        acc_hi[:, :] += t
        acc_lo[:, :] = a - t * jnp.float32(_CARRY_BASE)

    @pl.when(i == nb - 1)
    def _():
        out_ref[0, :, :] = acc_lo[:, :]
        out_ref[1, :, :] = acc_hi[:, :]


K2 = 128  # default lanes of the small one-hot (k2 = gid % k2)


def _agg_kernel_v4(
    gid_ref, lo_ref, hi_ref, mask_ref, out_ref, acc_lo, acc_hi,
    *, k1, r_act, rows_pad, carry_every, k2
):
    """Factored one-hot kernel: gid = k1*128 + k2. Builds the (128, B)
    one-hot of k2 once, and replicates the limb planes masked by the k1
    bucket-group into a tall (k1*r_act, B) operand. One matmul
    (rows, B) @ (B, 128) then covers all k1*128 buckets — ~K2/K of the
    VPU compare work of a full-width one-hot, and an MXU tile that is
    ~rows/128 utilized instead of r_act/128."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_lo[:, :] = jnp.zeros_like(acc_lo)
        acc_hi[:, :] = jnp.zeros_like(acc_hi)

    gid = gid_ref[0, :, :]  # (1, B) int32
    lo = lo_ref[0, :, :]
    hi = hi_ref[0, :, :]
    m = mask_ref[0, :, :]

    B = gid.shape[1]
    mf = _i32_to_f32(m)

    # base rows: count + value limbs (8-bit), masked by the filter
    base = [mf]
    nlimbs = r_act - 1
    for j in range(nlimbs):
        word = lo if j < 4 else hi
        limb = (word >> (8 * (j % 4))) & 0xFF
        base.append(_i32_to_f32(limb) * mf)

    # bucket-group masks (k1 = gid // k2) and masked limb replication
    shift = (k2 - 1).bit_length()
    ghi = gid >> shift
    rows = []
    for j in range(k1):
        gmask = jnp.where(ghi == j, jnp.float32(1), jnp.float32(0))
        for r in base:
            rows.append(r * gmask)
    while len(rows) < rows_pad:
        rows.append(jnp.zeros((1, B), jnp.float32))
    limbs = jnp.concatenate(rows, axis=0)  # (rows_pad, B)

    # one-hot of the low bits only: (k2, B)
    glo = gid & (k2 - 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k2, B), 0)
    onehot = jnp.where(glo == iota_k, jnp.float32(1), jnp.float32(0)).astype(
        jnp.bfloat16
    )

    acc_lo[:, :] += jax.lax.dot_general(
        limbs.astype(jnp.bfloat16),
        onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(((i + 1) % carry_every == 0) | (i == nb - 1))
    def _():
        a = acc_lo[:, :]
        t = jnp.floor(a * jnp.float32(1.0 / _CARRY_BASE))
        acc_hi[:, :] += t
        acc_lo[:, :] = a - t * jnp.float32(_CARRY_BASE)

    @pl.when(i == nb - 1)
    def _():
        out_ref[0, :, :] = acc_lo[:, :]
        out_ref[1, :, :] = acc_hi[:, :]


def _call_kernel_v4(
    gid_blocks, lo_blocks, hi_blocks, mask_blocks, k1, r_act, block, k2
):
    nb = gid_blocks.shape[0]
    rows_pad = -(-(k1 * r_act) // 8) * 8
    return pl.pallas_call(
        functools.partial(
            _agg_kernel_v4,
            k1=k1,
            r_act=r_act,
            rows_pad=rows_pad,
            carry_every=CARRY_EVERY,
            k2=k2,
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
            (2, rows_pad, k2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, k2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, k2), jnp.float32),
            pltpu.VMEM((rows_pad, k2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block * rows_pad * k2,
            bytes_accessed=nb * block * 16 + 2 * rows_pad * k2 * 4,
            transcendentals=0,
        ),
    )(gid_blocks, lo_blocks, hi_blocks, mask_blocks)


def _call_kernel(gid_blocks, lo_blocks, hi_blocks, mask_blocks, num_buckets, block):
    nb = gid_blocks.shape[0]
    return pl.pallas_call(
        functools.partial(
            _agg_kernel, num_buckets=num_buckets, carry_every=CARRY_EVERY
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
            (2, R_PAD, num_buckets), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, R_PAD, num_buckets), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R_PAD, num_buckets), jnp.float32),
            pltpu.VMEM((R_PAD, num_buckets), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block * R_PAD * num_buckets,
            bytes_accessed=nb * block * 16 + 2 * R_PAD * num_buckets * 4,
            transcendentals=0,
        ),
    )(gid_blocks, lo_blocks, hi_blocks, mask_blocks)


# the factored kernel's tall operand is capped to bound VMEM; beyond it
# the full-width one-hot kernel takes over
_V4_MAX_ROWS = 512


@functools.partial(
    jax.jit, static_argnames=("num_buckets", "block", "value_bits", "k2")
)
def pallas_sum_count(
    mask: jax.Array,
    gid: jax.Array,
    values: jax.Array,
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
    value_bits: int = 64,
    k2: int = K2,
):
    """Fused filter + GROUP BY sum(values), count(*) for bounded keys
    (0 <= gid < num_buckets).

    value_bits: static bound on the value width (a column-statistics
    hint from the planner; 8..64). Fewer limb planes → less MXU work.

    Returns (counts u64[K], sums u64[K]). Exact for inputs up to ~2^36
    rows of limb mass (see module docstring).
    """
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    vals = values.astype(jnp.uint64)
    # bitcast u64 → (n, 2) u32 words: no emulated 64-bit shifts
    words = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    lo = words[:, 0].astype(jnp.int32)
    hi = words[:, 1].astype(jnp.int32)

    gid_p = jnp.pad(gid.astype(jnp.int32), (0, pad)).reshape(nb, 1, block)
    lo_p = jnp.pad(lo, (0, pad)).reshape(nb, 1, block)
    hi_p = jnp.pad(hi, (0, pad)).reshape(nb, 1, block)
    mask_p = jnp.pad(mask, (0, pad)).astype(jnp.int32).reshape(nb, 1, block)

    nlimbs = -(-max(1, min(value_bits, 64)) // 8)
    r_act = 1 + nlimbs
    k1 = -(-num_buckets // k2)

    if k1 * r_act <= _V4_MAX_ROWS:
        with jax.enable_x64(False):
            out = _call_kernel_v4(
                gid_p, lo_p, hi_p, mask_p, k1, r_act, block, k2
            )
        lo_t = out[0].astype(jnp.uint64)
        hi_t = out[1].astype(jnp.uint64)
        acc = hi_t * jnp.uint64(4096) + lo_t  # (rows_pad, k2)
        acc = acc[: k1 * r_act].reshape(k1, r_act, k2)
        counts = acc[:, 0, :].reshape(-1)[:num_buckets]
        total = jnp.zeros((k1 * k2,), jnp.uint64)
        for i in range(nlimbs):
            total = total + (
                acc[:, 1 + i, :].reshape(-1) << jnp.uint64(8 * i)
            )
        return counts, total[:num_buckets]

    with jax.enable_x64(False):
        out = _call_kernel(gid_p, lo_p, hi_p, mask_p, num_buckets, block)

    # (2, R_PAD, K) → per-limb u64 totals: hi*2^12 + lo (both exact ints)
    lo_t = out[0].astype(jnp.uint64)
    hi_t = out[1].astype(jnp.uint64)
    acc = hi_t * jnp.uint64(4096) + lo_t  # (R_PAD, K)

    counts = acc[0]
    total = jnp.zeros((num_buckets,), jnp.uint64)
    for i in range(8):
        total = total + (acc[1 + i] << jnp.uint64(8 * i))
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
        counts, sums = pallas_sum_count(mask, gid, sum_vals, num_buckets, block)
        outs = []
        for vals, kind in zip(value_arrays, agg_kinds):
            outs.append(counts if kind == "count" else sums)
        return counts, tuple(outs)

    from eventql_tpu.kernels.onehot_agg import onehot_grouped_aggregate

    return onehot_grouped_aggregate(
        mask, gid, value_arrays, agg_kinds, num_buckets
    )
