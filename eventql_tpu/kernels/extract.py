"""Pallas flagged-row extraction (stream compaction).

TPU has no fast scatter, so `jnp.nonzero` over 100M rows runs at
~14 Mrows/s. This kernel exploits two structural facts: the Pallas
grid executes SEQUENTIALLY on a core (a running append cursor in SMEM
is safe), and in threshold-selection workloads qualifying rows are
RARE — so each block does one cheap any?-reduction and only blocks
that contain matches pay for extraction (argmax + lane-mask per match,
no scalar scan over the block).

Used by the top-k pipeline (kernels/sort.py): histogram → threshold →
extract candidates → exact small top_k. The reference has no analog —
its ORDER BY LIMIT sorts all rows on the CPU
(sql/statements/select/orderby.cc:58-168).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 8192


def _extract_kernel(thresh_ref, vals_ref, out_ref, cursor, *, cap, block):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cursor[0] = 0
        out_ref[0, :] = jnp.full((cap,), -1, jnp.int32)

    t = thresh_ref[0]
    v = vals_ref[0, :, :]  # (1, B) int32
    flags = (v >= t).astype(jnp.int32)
    # NOTE: traced under the caller's x64 mode — jnp.sum would promote
    # to i64 (unsupported in mosaic); max/min reductions stay i32
    any_match = jnp.max(flags) > 0

    @pl.when(any_match)
    def _():
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

        def cond(carry):
            flags, cur = carry
            return (jnp.max(flags) > 0) & (cur < cap)

        def body(carry):
            flags, cur = carry
            # lane of the first remaining match
            masked = jnp.where(flags > 0, iota, block)
            lane = jnp.min(masked)
            gidx = i * block + lane
            # append at the cursor via a lane-masked vector store
            out_iota = jax.lax.iota(jnp.int32, cap)
            out_ref[0, :] = jnp.where(
                out_iota == cur, gidx, out_ref[0, :]
            )
            flags = flags * (iota != lane).astype(jnp.int32)
            return flags, cur + 1

        cur0 = cursor[0]
        _fl, cur1 = jax.lax.while_loop(cond, body, (flags, cur0))
        cursor[0] = cur1


@functools.partial(jax.jit, static_argnames=("cap", "block"))
def extract_ge(values: jax.Array, threshold: jax.Array, cap: int,
               block: int = DEFAULT_BLOCK):
    """Indices (ascending) of rows with values >= threshold, padded
    with -1 to `cap`. If more than cap rows qualify, the first cap (by
    row order) are returned — callers detect overflow by counting
    qualifiers separately. values: int32 [n]; threshold: int32 scalar."""
    n = values.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    INT_MIN = jnp.int32(-(2**31))
    v = jnp.pad(
        values.astype(jnp.int32), (0, pad), constant_values=INT_MIN
    ).reshape(nb, 1, block)
    thresh = jnp.reshape(threshold.astype(jnp.int32), (1,))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_extract_kernel, cap=cap, block=block),
            interpret=jax.default_backend() != "tpu",
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 1, block), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, cap), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, cap), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(thresh, v)
    return out[0]
