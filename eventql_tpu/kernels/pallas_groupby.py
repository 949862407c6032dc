"""Pallas TPU hash-aggregate kernel.

Fuses one-hot construction (VPU, in VMEM) with the aggregation matmul
(MXU) so the (block × buckets) one-hot matrix never touches HBM — the
XLA-level version (kernels/onehot_agg.py) materializes it per block and
is bandwidth-bound on that traffic.

Exactness contract matches onehot_agg: uint64 sums via 8-bit limb rows
(every f32 MAC and per-flush partial stays below 2^24), counts as a
ones-row; partial tables are flushed to HBM every `flush_every` blocks
and the final combine runs in f64 outside the kernel.

Layout: grid over row blocks; limb matrix (R_pad, B) f32 in VMEM; the
kernel computes limbs @ one_hot(gid) into a VMEM accumulator and
flushes to the (nb/flush_every, R_pad, K) output.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eventql_tpu.kernels.onehot_agg import _u64_limbs

DEFAULT_BLOCK = 1024
FLUSH_EVERY = 4  # f32 partials stay exact: 4 * B * 255 < 2^24 for B=1024


def _agg_kernel(gid_ref, limbs_ref, out_ref, acc_ref, *, num_buckets, flush_every):
    i = pl.program_id(0)

    @pl.when(i % flush_every == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    gid = gid_ref[0, 0, :]  # (B,)
    limbs = limbs_ref[0, :, :]  # (R_pad, B)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (gid.shape[0], num_buckets), 1)
    # (B, K) one-hot built in VMEM. Explicit f32 scalars: under x64 the
    # bare literals are weak f64 (mosaic has no 64-bit types), and
    # bool/i32→f32 asts hit a recursing mosaic convert rule.
    onehot = jnp.where(
        gid[:, None] == iota_k, jnp.float32(1), jnp.float32(0)
    )

    acc_ref[:, :] += jnp.dot(
        limbs, onehot, preferred_element_type=jnp.float32
    )

    @pl.when((i + 1) % flush_every == 0)
    def _():
        out_ref[0, :, :] = acc_ref[:, :]


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
    """Drop-in equivalent of onehot_grouped_aggregate (same contract)
    with the fused Pallas kernel on the hot loop."""
    n = gid.shape[0]
    nflush = -(-n // (block * FLUSH_EVERY))
    nb = nflush * FLUSH_EVERY
    pad = nb * block - n

    gid_p = jnp.pad(gid.astype(jnp.int32), (0, pad), constant_values=0)
    mask_p = jnp.pad(mask, (0, pad))
    # masked rows: one-hot row of a real bucket would corrupt it, so
    # masked rows zero their limb rows AND the ones-row
    rows = [jnp.ones((n,), jnp.float32)]
    row_map = []
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
            f32v = vals.astype(jnp.float32)
            rows.append(f32v)
            rows.append((vals - f32v.astype(jnp.float64)).astype(jnp.float32))
            row_map.append(("fsum", start, 2))
        else:
            raise ValueError(f"unknown aggregate kind {kind}")

    R = len(rows)
    R_pad = -(-R // 8) * 8  # f32 sublane tile
    limb_mat = jnp.stack(rows, axis=0)
    limb_mat = jnp.pad(limb_mat, ((0, R_pad - R), (0, pad)))
    limb_mat = limb_mat * mask_p[None, :].astype(jnp.float32)

    gid_blocks = gid_p.reshape(nb, 1, block)
    limb_blocks = limb_mat.reshape(R_pad, nb, block).transpose(1, 0, 2)

    # trace the kernel under x64=off: the engine runs with 64-bit types
    # enabled, but mosaic has no 64-bit support and its i64→i32 convert
    # rule recurses on x64 grid-index arithmetic
    with jax.enable_x64(False):
        out = _call_kernel(gid_blocks, limb_blocks, R_pad, num_buckets, nflush, block)

    acc = out.astype(jnp.float64).sum(axis=0)  # (R_pad, K) exact in f64

    counts = acc[0].astype(jnp.uint64)
    outs = []
    for (kind, start, _nrows) in row_map:
        if kind == "count":
            outs.append(counts)
        elif kind == "sum":
            total = jnp.zeros((num_buckets,), jnp.uint64)
            for i in range(8):
                total = total + (
                    acc[start + i].astype(jnp.uint64) << jnp.uint64(8 * i)
                )
            outs.append(total)
        elif kind == "fsum":
            outs.append(acc[start] + acc[start + 1])
    return counts, tuple(outs)


def _call_kernel(gid_blocks, limb_blocks, R_pad, num_buckets, nflush, block):
    nb = gid_blocks.shape[0]
    return pl.pallas_call(
        functools.partial(
            _agg_kernel, num_buckets=num_buckets, flush_every=FLUSH_EVERY
        ),
        interpret=jax.default_backend() != "tpu",
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, R_pad, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R_pad, num_buckets),
            lambda i: (i // FLUSH_EVERY, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nflush, R_pad, num_buckets), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R_pad, num_buckets), jnp.float32)],
    )(gid_blocks, limb_blocks)
