"""Race the shipping pallas_sum_count against an int8-dense variant:
one-hot and mask planes built with int8 compares + value-selects
(select_i8_value compiles on this toolchain — probe_int8_ops.py),
hoisting iota/ones into scratch filled once. If Mosaic packs int8
lanes 4x, the dominant 2*k2 one-hot build shrinks ~4x."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.pallas_groupby import pallas_sum_count, CARRY_EVERY_I32

K2 = 128


def _agg_kernel_i8(gid_ref, lo_ref, out_ref, acc_lo, acc_hi, iota8_k2,
                   iota8_k1, ones8, *, k1, k2, k2_shift, r_act, rows_pad,
                   carry_every):
    nlimbs = r_act - 1
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_lo[:, :] = jnp.zeros_like(acc_lo)
        acc_hi[:, :] = jnp.zeros_like(acc_hi)
        iota8_k2[:, :] = jax.lax.broadcasted_iota(
            jnp.int32, iota8_k2.shape, 0
        ).astype(jnp.int8)
        iota8_k1[:, :] = jax.lax.broadcasted_iota(
            jnp.int32, iota8_k1.shape, 0
        ).astype(jnp.int8)
        ones8[:, :] = jnp.ones(ones8.shape, jnp.int32).astype(jnp.int8)

    gid = gid_ref[0, :, :]  # (1, B) int32, -1 = filtered
    lo = lo_ref[0, :, :]
    B = gid.shape[1]

    # int8 operand forms of the id pieces (k1 <= 127 required)
    ghi8 = (gid >> k2_shift).astype(jnp.int8)  # (1, B)
    glo8 = (gid & (k2 - 1)).astype(jnp.int8)  # (1, B)

    zero8 = jnp.zeros((k1, B), jnp.int8)
    m_k1 = ghi8 == iota8_k1[:, :]  # (k1, B) i1 via int8 compare
    count_plane = jnp.where(m_k1, ones8[:k1, :], zero8)

    planes = [count_plane]
    for j in range(nlimbs):
        limb8 = (((lo >> (8 * (j % 4))) & 0xFF) - 128).astype(jnp.int8)
        planes.append(jnp.where(m_k1, jnp.broadcast_to(limb8, (k1, B)), zero8))
    tall = jnp.concatenate(planes, axis=0)
    pad = rows_pad - r_act * k1
    if pad:
        tall = jnp.concatenate(
            [tall, jnp.zeros((pad, B), jnp.int8)], axis=0
        )

    onehot = jnp.where(
        glo8 == iota8_k2[:, :], ones8[:k2, :], jnp.zeros((k2, B), jnp.int8)
    )

    acc_lo[:, :] += jax.lax.dot_general(
        tall, onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(((i + 1) % carry_every == 0) | (i == nb - 1))
    def _():
        a = acc_lo[:, :]
        acc_hi[:, :] += a >> 12
        acc_lo[:, :] = a & 4095

    @pl.when(i == nb - 1)
    def _():
        out_ref[0, :, :] = acc_lo[:, :]
        out_ref[1, :, :] = acc_hi[:, :]


@functools.partial(jax.jit, static_argnames=("num_buckets", "block", "value_bits"))
def sum_count_i8(mask, gid, values, num_buckets, block=8192, value_bits=16):
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    k2 = K2
    nlimbs = -(-value_bits // 8)
    r_act = 1 + nlimbs
    k1 = -(-num_buckets // k2)
    rows_pad = -(-(k1 * r_act) // 32) * 32

    vals = values.astype(jnp.uint64)
    words = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    lo = words[:, 0].astype(jnp.int32)
    gidm = jnp.where(mask, gid.astype(jnp.int32), -1)
    gid_p = jnp.pad(gidm, (0, pad), constant_values=-1).reshape(nb, 1, block)
    lo_p = jnp.pad(lo, (0, pad)).reshape(nb, 1, block)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _agg_kernel_i8, k1=k1, k2=k2, k2_shift=k2.bit_length() - 1,
                r_act=r_act, rows_pad=rows_pad, carry_every=CARRY_EVERY_I32,
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, rows_pad, k2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, rows_pad, k2), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, k2), jnp.int32),
                pltpu.VMEM((rows_pad, k2), jnp.int32),
                pltpu.VMEM((k2, block), jnp.int8),
                pltpu.VMEM((max(k1, 8), block), jnp.int8),
                pltpu.VMEM((k2, block), jnp.int8),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * nb * block * rows_pad * k2,
                bytes_accessed=nb * block * 2 * 4 + 2 * rows_pad * k2 * 4,
                transcendentals=0,
            ),
        )(gid_p, lo_p)

    acc = out[1].astype(jnp.int64) * jnp.int64(4096) + out[0].astype(jnp.int64)
    acc = acc[: r_act * k1].reshape(r_act, k1, k2)
    counts = acc[0].reshape(-1)
    acc_u = acc.astype(jnp.uint64)
    total = jnp.zeros((k1 * k2,), jnp.uint64)
    offset = 0
    for i in range(nlimbs):
        total = total + (acc_u[1 + i].reshape(-1) << jnp.uint64(8 * i))
        offset = (offset + (128 << (8 * i))) & 0xFFFFFFFFFFFFFFFF
    total = total + jnp.uint64(offset) * acc_u[0].reshape(-1)
    return counts[:num_buckets].astype(jnp.uint64), total[:num_buckets]


def main():
    n = int(os.environ.get("BENCH_ROWS", 1 << 24))
    n_keys = 1024
    reps = int(os.environ.get("BENCH_REPS", 8))

    rng = np.random.default_rng(42)
    gid_h = rng.integers(0, n_keys, n).astype(np.int32)
    values_h = rng.integers(0, 1000, n).astype(np.uint64)
    gid = jnp.asarray(gid_h)
    values = jnp.asarray(values_h)
    threshold = jnp.uint64(800)
    value_bits = max(8, int(values_h.max()).bit_length() + 1)
    value_bits = -(-value_bits // 8) * 8

    # correctness first
    mask_h = values_h < 800
    want_counts = np.bincount(gid_h[mask_h], minlength=n_keys)
    want_sums = np.bincount(gid_h[mask_h], weights=values_h[mask_h].astype(np.float64), minlength=n_keys).astype(np.uint64)
    c8, s8 = sum_count_i8(values < threshold, gid, values, n_keys, value_bits=value_bits)
    c8, s8 = np.asarray(c8), np.asarray(s8)
    print("i8 counts exact:", np.array_equal(c8, want_counts),
          "sums exact:", np.array_equal(s8, want_sums))

    def pipe(fn):
        @jax.jit
        def p(gid, values, threshold):
            def body(i, acc):
                mask = values + i.astype(jnp.uint64) < threshold
                counts, sums = fn(mask, gid, values, n_keys, value_bits=value_bits)
                return acc + counts.sum() + sums.sum() * 0
            return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))
        return p

    for name, fn in [("ship", pallas_sum_count), ("i8", sum_count_i8)]:
        p = pipe(fn)
        r = p(gid, values, threshold)
        r.block_until_ready()  # compile
        best = None
        for _ in range(3):
            t0 = time.time()
            r = p(gid, values, threshold)
            r.block_until_ready()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        grows = n * reps / best / 1e9
        print(f"{name}: {best*1e3:.1f} ms  {grows:.2f} Grows/s (uncorrected)")


if __name__ == "__main__":
    main()
