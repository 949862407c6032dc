"""Pallas TPU hash-aggregate kernel.

Re-casts GROUP BY aggregation as MXU matrix multiplication — the
structural replacement for the reference's per-row hash-map loop
(reference: sql/statements/select/groupby.cc:69-219). TPU scatter
serializes (~5 Mrows/s measured) and 64-bit sorts are emulated, so
bounded-key aggregation belongs on the MXU.

Kernel design (the "tall" factored one-hot):
* bucket ids factor as gid = k1 * 128 + k2. Only the 128-wide one-hot
  of k2 is materialized (a full K-wide one-hot costs K VPU compares
  per row — the measured bottleneck of the earlier design); the k1
  dimension is covered by replicating the value planes masked per
  bucket-group
* all k1 masks come from ONE (k1, B) iota-compare (full-sublane VPU
  efficiency; per-(1,B)-row ops waste 7/8 sublanes)
* operands are int8: value limbs are offset-encoded (limb - 128 fits
  int8's signed range; the count plane recovers the offset exactly:
  sum(limb) = acc + 128 * count), the one-hot is 0/1 — int8 MXU runs
  2x bf16 rate and accumulates exactly in int32
* int32 accumulators carry into a second plane every `carry_every`
  blocks (hi += lo >> 12; lo &= 4095 — exact in two's complement), so
  arbitrarily many rows accumulate without overflow
* filtered rows fold into gid = -1 (matches no bucket-group), so no
  separate mask operand is read from HBM

Measured on v5e (16.7M rows, K=1024, 16-bit values): 6.2 Grows/s —
4.7x the full-width bf16 one-hot design, ~1200x XLA scatter.

Mosaic notes (this jax version, axon forward-compat mode):
* i32→f32 / bool→f32 convert rules recurse — int→float needs the 2^23
  magic-number bitcast trick (kept in _i32_to_f32 for f32 kernels)
* bf16 select off an i1 mask trips a relayout bug — select f32/i32,
  then convert
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

DEFAULT_BLOCK = 8192
K2 = 128  # lanes of the factored one-hot (k2 = gid & 127)
# int32 carry cadence: carry_every * block * 128 must stay < 2^30
CARRY_EVERY_I32 = 512

_MAGIC_I = 0x4B000000  # f32 bit pattern of 2^23
_MAGIC_F = 8388608.0  # 2^23

# the tall operand is capped to bound VMEM; beyond it the XLA one-hot
# kernel takes over (kernels/onehot_agg.py)
_MAX_ROWS = 512


def _pick_k2(num_buckets: int, nlimbs: int) -> int:
    """One-hot width minimizing per-row VPU passes: ~2·k2 for the
    (k2, B) one-hot build vs ~2·r_act·k1 for the mask/limb planes
    (k1 = ceil(K / k2)); optimum near sqrt(r_act · K)."""
    r_act = 1 + nlimbs
    best, best_cost = K2, None
    for cand in (32, 64, 128):
        k1 = -(-num_buckets // cand)
        cost = 2 * cand + 2 * r_act * k1
        # ties break toward the LARGER k2: fewer k1 mask rows measure
        # faster at equal lane count (K=8192 r_act=1: k2=64 and 128
        # both cost 384 lanes; 128 measured 8.3 vs 6.9 Grows/s —
        # round-3 cost grid, scripts/probe_groupby_cost.py)
        if best_cost is None or cost <= best_cost:
            best, best_cost = cand, cost
    return best


def _i32_to_f32(v):
    """Exact int→float for 0 <= v < 2^23 without a convert op
    (mosaic's i32→f32 rule recurses): OR the value into the mantissa of
    2^23 and subtract."""
    bits = _MAGIC_I | v
    return pltpu.bitcast(bits, jnp.float32) - jnp.float32(_MAGIC_F)


_PRED_CMP = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}


def _load_i32(stream, u16: bool):
    """Load a (1, B) block as int32 lanes. 16-bit streams holding an
    unsigned payload sign-extend on the astype; masking the low 16 bits
    recovers the payload exactly (one extra VPU op per row — the whole
    point of halving the HBM bytes)."""
    v = stream.astype(jnp.int32) if stream.dtype != jnp.int32 else stream
    if u16:
        v = v & 0xFFFF
    return v


def _agg_kernel(
    *refs_all,
    k1,
    k2,
    k2_shift,
    r_act,
    rows_pad,
    carry_every,
    block,
    pred_mode=None,
    pred_op=None,
    pred2_src=None,
    pred2_op=None,
    pred_combine="and",
    pred_u16=False,
    pred2_u16=False,
    lo_u16=False,
    gid_u16=False,
):
    # operand order: [scal_ref (SMEM, fused only)] gid_ref [pred_ref]
    # [lo_ref] [hi_ref] out_ref acc_lo acc_hi. lo_ref only exists when
    # values are aggregated (count-only queries skip the value stream
    # entirely), hi_ref only for >32-bit values. In fused mode
    # (pred_mode) the WHERE compare, the row-pad mask, and the
    # filtered-row gid=-1 fold all happen HERE, so the kernel's input
    # streams are the raw (narrowed) column arrays — no XLA-side mask
    # or gid materialization pass touches HBM.
    refs = list(refs_all)
    scal_ref = refs.pop(0) if pred_mode else None
    gid_ref = refs.pop(0)
    pred_ref = refs.pop(0) if pred_mode == "stream" else None
    pred2_ref = refs.pop(0) if pred2_src == "stream" else None
    nlimbs = r_act - 1
    lo_ref = refs.pop(0) if nlimbs > 0 else None
    hi_ref = refs.pop(0) if nlimbs > 4 else None
    out_ref, acc_lo, acc_hi = refs
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_lo[:, :] = jnp.zeros_like(acc_lo)
        acc_hi[:, :] = jnp.zeros_like(acc_hi)

    gid = _load_i32(gid_ref[0, :, :], gid_u16)  # (1, B) int32
    lo = _load_i32(lo_ref[0, :, :], lo_u16) if lo_ref is not None else None
    hi = hi_ref[0, :, :] if hi_ref is not None else None
    B = gid.shape[1]

    if pred_mode:
        # scal_ref = [[thr, n_real, gid_base]] in SMEM
        thr = scal_ref[0, 0]
        n_real = scal_ref[0, 1]
        if pred_mode == "stream":
            p = _load_i32(pred_ref[0, :, :], pred_u16)
        elif pred_mode == "gid":
            # compare on the (pre-base) group-key stream itself — the
            # count-only always-true form (ge INT32_MIN) needs no
            # second stream
            p = gid
        else:  # "value": compare on the value stream itself
            p = lo
        keep = _PRED_CMP[pred_op](p, thr)
        if pred2_op is not None:
            # second compare fuses the same way (scal slot 3 holds its
            # literal); pred_combine picks AND-conjunction vs
            # OR-disjunction (round-5: WHERE a CMP x OR b CMP y)
            if pred2_src == "stream":
                p2 = _load_i32(pred2_ref[0, :, :], pred2_u16)
            elif pred2_src == "gid":
                p2 = gid
            else:
                p2 = lo
            keep2 = _PRED_CMP[pred2_op](p2, scal_ref[0, 3])
            keep = (keep | keep2) if pred_combine == "or" else (keep & keep2)
        # numeric keys bucket as (key - min): the base subtract happens
        # here, not in an XLA pass (modular i32 arithmetic — exact for
        # spans < 2^31)
        gid = gid - scal_ref[0, 2]
        # row-pad mask: rows at global index >= n_real are padding
        row = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1) + i * block
        keep = keep & (row < n_real)
        gid = jnp.where(keep, gid, jnp.int32(-1))

    # all k1 bucket-group masks in one full-sublane compare. Masking
    # stays int32 (Mosaic v5e has no int8 muli, and i1 masks from i32
    # compares can't relayout to int8 select operands); the single
    # astype on the concatenated tall converts to int8 for the MXU.
    ghi = gid >> k2_shift
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (k1, B), 0)
    gmask_all = jnp.where(ghi == iota_j, 1, 0)  # (k1, B) int32 0/1

    # planes, r-major: [count (k1 rows)] [limb0 (k1 rows)] [limb1 ...]
    planes = [gmask_all]
    for j in range(nlimbs):
        word = lo if j < 4 else hi
        limb = ((word >> (8 * (j % 4))) & 0xFF) - 128  # int8-safe offset
        planes.append(limb * gmask_all)
    tall = jnp.concatenate(planes, axis=0)  # (r_act * k1, B)
    pad = rows_pad - r_act * k1
    if pad:
        tall = jnp.concatenate(
            [tall, jnp.zeros((pad, B), jnp.int32)], axis=0
        )
    tall = tall.astype(jnp.int8)

    # one-hot of the low k2_shift bits only: (k2, B) int8 0/1
    glo = gid & (k2 - 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k2, B), 0)
    onehot = jnp.where(glo == iota_k, 1, 0).astype(jnp.int8)

    acc_lo[:, :] += jax.lax.dot_general(
        tall,
        onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(((i + 1) % carry_every == 0) | (i == nb - 1))
    def _():
        # exact in two's complement: a == (a >> 12) * 4096 + (a & 4095)
        a = acc_lo[:, :]
        acc_hi[:, :] += a >> 12
        acc_lo[:, :] = a & 4095

    @pl.when(i == nb - 1)
    def _():
        out_ref[0, :, :] = acc_lo[:, :]
        out_ref[1, :, :] = acc_hi[:, :]


def _call_kernel(gid_blocks, lo_blocks, hi_blocks, k1, r_act, block,
                 interpret=None, k2=K2, pred_blocks=None, scal=None,
                 pred_mode=None, pred_op=None, pred2_blocks=None,
                 pred2_src=None, pred2_op=None, pred_combine="and"):
    nb = gid_blocks.shape[0]
    rows_pad = -(-(k1 * r_act) // 32) * 32
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _is16(b):
        return b is not None and b.dtype.itemsize == 2

    inputs = []
    in_specs = []
    if pred_mode:
        # (1, 4) int32 [thr, n_real, gid_base, thr2]
        inputs.append(scal)
        in_specs.append(
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
    stream_blocks = [gid_blocks]
    if pred_mode == "stream":
        stream_blocks.append(pred_blocks)
    if pred2_src == "stream":
        stream_blocks.append(pred2_blocks)
    if lo_blocks is not None:
        stream_blocks.append(lo_blocks)
    if hi_blocks is not None:
        stream_blocks.append(hi_blocks)
    for b in stream_blocks:
        inputs.append(b)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
    return pl.pallas_call(
        functools.partial(
            _agg_kernel,
            k1=k1,
            k2=k2,
            k2_shift=k2.bit_length() - 1,
            r_act=r_act,
            rows_pad=rows_pad,
            carry_every=CARRY_EVERY_I32,
            block=block,
            pred_mode=pred_mode,
            pred_op=pred_op,
            pred2_src=pred2_src,
            pred2_op=pred2_op,
            pred_combine=pred_combine,
            pred_u16=_is16(pred_blocks)
            and pred_blocks.dtype in (jnp.uint16,),
            pred2_u16=_is16(pred2_blocks)
            and pred2_blocks.dtype in (jnp.uint16,),
            lo_u16=_is16(lo_blocks) and lo_blocks.dtype in (jnp.uint16,),
            gid_u16=_is16(gid_blocks) and gid_blocks.dtype in (jnp.uint16,),
        ),
        interpret=interpret,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, rows_pad, k2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, k2), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, k2), jnp.int32),
            pltpu.VMEM((rows_pad, k2), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * block * rows_pad * k2,
            bytes_accessed=nb
            * block
            * sum(b.dtype.itemsize for b in stream_blocks)
            + 2 * rows_pad * k2 * 4,
            transcendentals=0,
        ),
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("num_buckets", "block", "value_bits", "interpret", "k2"),
)
def pallas_sum_count(
    mask: jax.Array,
    gid: jax.Array,
    values: jax.Array,
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
    value_bits: int = 64,
    interpret: bool = None,
    k2: int = None,
):
    """Fused filter + GROUP BY sum(values), count(*) for bounded keys
    (0 <= gid < num_buckets).

    value_bits: static bound on the value width (a column-statistics
    hint from the planner; 8..64). Fewer limb planes → less MXU work.
    k2: one-hot width (power of two; default picked per num_buckets —
    the (k2, B) one-hot build dominates VPU time, but smaller k2 grows
    the k1 = K/k2 mask planes; the sweet spot balances them).

    Returns (counts u64[K], sums u64[K]); exact.
    """
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    nlimbs = -(-max(1, min(value_bits, 64)) // 8)
    if k2 is None:
        k2 = _pick_k2(num_buckets, nlimbs)

    vals = values.astype(jnp.uint64)
    # bitcast u64 → (n, 2) u32 words: no emulated 64-bit shifts
    words = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    lo = words[:, 0].astype(jnp.int32)

    # fold the filter into the bucket id: -1 matches no bucket-group
    gidm = jnp.where(mask, gid.astype(jnp.int32), -1)
    gid_p = jnp.pad(gidm, (0, pad), constant_values=-1).reshape(nb, 1, block)
    lo_p = jnp.pad(lo, (0, pad)).reshape(nb, 1, block)
    hi_p = None
    if nlimbs > 4:
        hi = words[:, 1].astype(jnp.int32)
        hi_p = jnp.pad(hi, (0, pad)).reshape(nb, 1, block)

    r_act = 1 + nlimbs
    k1 = -(-num_buckets // k2)

    def _decode(out, k1c):
        # un-carry: plane = hi * 2^12 + lo (both int32, exact in int64)
        acc = (
            out[1].astype(jnp.int64) * jnp.int64(4096)
            + out[0].astype(jnp.int64)
        )
        acc = acc[: r_act * k1c].reshape(r_act, k1c, k2)
        counts = acc[0].reshape(-1)
        # recombine in uint64 wraparound arithmetic (results are mod
        # 2^64; negative offset-encoded sums become two's complements)
        acc_u = acc.astype(jnp.uint64)
        total = jnp.zeros((k1c * k2,), jnp.uint64)
        offset = 0
        for i in range(nlimbs):
            total = total + (acc_u[1 + i].reshape(-1) << jnp.uint64(8 * i))
            offset = (offset + (128 << (8 * i))) & 0xFFFFFFFFFFFFFFFF
        # un-offset the -128 limb encoding via the exact counts
        total = total + jnp.uint64(offset) * acc_u[0].reshape(-1)
        return counts.astype(jnp.uint64), total

    if k1 * r_act <= _MAX_ROWS:
        with jax.enable_x64(False):
            out = _call_kernel(
                gid_p, lo_p, hi_p, k1, r_act, block, interpret=interpret,
                k2=k2,
            )
        counts, total = _decode(out, k1)
        return counts[:num_buckets], total[:num_buckets]

    # multi-pass for large key cardinality: chunk the bucket-group (k1)
    # range; gids outside a chunk match no iota mask (negative or past
    # the chunk's k1), so the only extra cost is re-reading the input
    # streams once per chunk. At K=64K/16-bit values that's 4 passes —
    # ~3 orders of magnitude faster than a K-wide XLA one-hot.
    k1_max = max(1, _MAX_ROWS // r_act)
    counts_parts = []
    total_parts = []
    for c0 in range(0, k1, k1_max):
        k1c = min(k1_max, k1 - c0)
        gid_c = gid_p - jnp.int32(c0 * k2)
        with jax.enable_x64(False):
            out = _call_kernel(
                gid_c, lo_p, hi_p, k1c, r_act, block, interpret=interpret,
                k2=k2,
            )
        c_part, t_part = _decode(out, k1c)
        counts_parts.append(c_part)
        total_parts.append(t_part)
    counts = jnp.concatenate(counts_parts)[:num_buckets]
    total = jnp.concatenate(total_parts)[:num_buckets]
    return counts, total


def _split_value_stream(values, value_bits):
    """Value stream → (lo, hi) kernel streams at their narrowest safe
    width. 64-bit values split into u32 words; <=32-bit values keep
    their storage dtype (16-bit streams ride VMEM as-is and widen
    in-kernel), so the HBM bytes/row match the narrowed storage."""
    nlimbs = -(-max(1, min(value_bits, 64)) // 8)
    if values.dtype.itemsize == 8:
        words = jax.lax.bitcast_convert_type(
            values.astype(jnp.uint64), jnp.uint32
        )
        lo = words[:, 0].astype(jnp.int32)
        hi = words[:, 1].astype(jnp.int32) if nlimbs > 4 else None
        return lo, hi
    if nlimbs > 4:
        raise ValueError("value_bits > 32 requires a 64-bit stream")
    if values.dtype.itemsize == 2:
        return values, None  # widened in-kernel (u16 payload mask)
    return values.astype(jnp.int32), None


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_buckets",
        "block",
        "value_bits",
        "interpret",
        "k2",
        "pred_op",
        "pred2_op",
        "pred2_is_value",
        "pred_combine",
    ),
)
def pallas_sum_count_fused(
    gid: jax.Array,
    values: jax.Array,
    thr: jax.Array,
    n_real: jax.Array,
    num_buckets: int,
    pred: jax.Array = None,
    block: int = DEFAULT_BLOCK,
    value_bits: int = 32,
    pred_op: str = "lt",
    interpret: bool = None,
    k2: int = None,
    gid_base: jax.Array = 0,
    pred2: jax.Array = None,
    pred2_op: str = None,
    thr2: jax.Array = 0,
    pred2_is_value: bool = False,
    pred_combine: str = "and",
):
    """Fully-fused scan + WHERE + GROUP BY sum(values), count(*): the
    predicate compare (`pred_stream <op> thr`), the row-validity mask
    (rows >= n_real are padding), and the filtered-row gid=-1 fold all
    run INSIDE the Pallas kernel, so the only HBM traffic is the raw
    (narrowed) column streams — no XLA-side mask or gid pass.

    gid: group ids [0, num_buckets), int32 or 16-bit narrowed (dict-id
      streams); values: the summed column at its narrowed width (u16 /
      i32 / u64); pred: the WHERE column stream (defaults to `values`
      itself); thr: int32 comparison literal (traced); n_real: real row
      count (rows beyond it are padding and fold to gid=-1).

    Caller contract: every pred-stream payload and thr fit int32
    (narrowed u16/i16 streams always do; u32 streams must be < 2^31).

    Replaces the reference's per-row WHERE eval + hash-map accumulate
    (sql/CSTableScan.cc:813 evaluatePredicateVector feeding
    groupby.cc:344-407) with one pass at VPU/MXU rate."""
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    nlimbs = -(-max(1, min(value_bits, 64)) // 8)
    if k2 is None:
        k2 = _pick_k2(num_buckets, nlimbs)

    lo, hi = _split_value_stream(values, value_bits)

    def _blocks(a):
        if a is None:
            return None
        ap = jnp.pad(a, (0, pad)) if pad else a
        return ap.reshape(nb, 1, block)

    gid_p = _blocks(gid if gid.dtype.itemsize != 8 else gid.astype(jnp.int32))
    lo_p = _blocks(lo)
    hi_p = _blocks(hi)
    pred_mode = "value"
    pred_p = None
    if pred is not None:
        pred_mode = "stream"
        if pred.dtype.itemsize == 8:
            pred = pred.astype(jnp.int32)
        pred_p = _blocks(pred)
    pred2_src = None
    pred2_p = None
    if pred2_op is not None:
        pred2_src = "value" if pred2_is_value else "stream"
        if pred2 is not None and pred2.dtype.itemsize == 8:
            pred2 = pred2.astype(jnp.int32)
        pred2_p = _blocks(pred2) if pred2_src == "stream" else None
    scal = jnp.stack(
        [
            jnp.asarray(thr).astype(jnp.int32),
            jnp.asarray(n_real).astype(jnp.int32),
            jnp.asarray(gid_base).astype(jnp.int32),
            jnp.asarray(thr2).astype(jnp.int32),
        ]
    ).reshape(1, 4)

    r_act = 1 + nlimbs
    k1 = -(-num_buckets // k2)

    def _decode(out, k1c):
        acc = (
            out[1].astype(jnp.int64) * jnp.int64(4096)
            + out[0].astype(jnp.int64)
        )
        acc = acc[: r_act * k1c].reshape(r_act, k1c, k2)
        counts = acc[0].reshape(-1)
        acc_u = acc.astype(jnp.uint64)
        total = jnp.zeros((k1c * k2,), jnp.uint64)
        offset = 0
        for i in range(nlimbs):
            total = total + (acc_u[1 + i].reshape(-1) << jnp.uint64(8 * i))
            offset = (offset + (128 << (8 * i))) & 0xFFFFFFFFFFFFFFFF
        total = total + jnp.uint64(offset) * acc_u[0].reshape(-1)
        return counts.astype(jnp.uint64), total

    kw = dict(
        interpret=interpret,
        k2=k2,
        pred_blocks=pred_p,
        scal=scal,
        pred_mode=pred_mode,
        pred_op=pred_op,
        pred2_blocks=pred2_p,
        pred2_src=pred2_src,
        pred2_op=pred2_op,
        pred_combine=pred_combine,
    )
    if k1 * r_act <= _MAX_ROWS:
        with jax.enable_x64(False):
            out = _call_kernel(gid_p, lo_p, hi_p, k1, r_act, block, **kw)
        counts, total = _decode(out, k1)
        return counts[:num_buckets], total[:num_buckets]

    k1_max = max(1, _MAX_ROWS // r_act)
    counts_parts = []
    total_parts = []
    for c0 in range(0, k1, k1_max):
        k1c = min(k1_max, k1 - c0)
        gid_c = gid_p.astype(jnp.int32) - jnp.int32(c0 * k2)
        with jax.enable_x64(False):
            out = _call_kernel(gid_c, lo_p, hi_p, k1c, r_act, block, **kw)
        c_part, t_part = _decode(out, k1c)
        counts_parts.append(c_part)
        total_parts.append(t_part)
    counts = jnp.concatenate(counts_parts)[:num_buckets]
    total = jnp.concatenate(total_parts)[:num_buckets]
    return counts, total


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_buckets",
        "block",
        "interpret",
        "k2",
        "pred_op",
        "pred_on_gid",
        "pred2_op",
        "pred_combine",
    ),
)
def pallas_count_fused(
    gid: jax.Array,
    thr: jax.Array,
    n_real: jax.Array,
    num_buckets: int,
    pred: jax.Array = None,
    block: int = DEFAULT_BLOCK,
    pred_op: str = "ge",
    interpret: bool = None,
    k2: int = None,
    gid_base: jax.Array = 0,
    pred_on_gid: bool = False,
    pred2: jax.Array = None,
    pred2_op: str = None,
    thr2: jax.Array = 0,
    pred_combine: str = "and",
):
    """Fully-fused count(*)-only GROUP BY: the fastest kernel shape —
    no value stream, no limb planes (r_act = 1), WHERE compare + pad
    mask + gid fold in-kernel. With no predicate column, pass
    pred=None, pred_op='ge', thr=INT32_MIN (always true). pred_on_gid
    compares on the group-key stream itself (pre-base), covering
    `WHERE k CMP lit GROUP BY k`. Returns counts u64[K]; exact."""
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if k2 is None:
        k2 = _pick_k2(num_buckets, 0)

    def _blocks(a):
        if a is None:
            return None
        ap = jnp.pad(a, (0, pad)) if pad else a
        return ap.reshape(nb, 1, block)

    gid_p = _blocks(gid if gid.dtype.itemsize != 8 else gid.astype(jnp.int32))
    pred_mode = "gid"
    pred_p = None
    if pred is not None and not pred_on_gid:
        pred_mode = "stream"
        if pred.dtype.itemsize == 8:
            pred = pred.astype(jnp.int32)
        pred_p = _blocks(pred)
    pred2_src = None
    pred2_p = None
    if pred2_op is not None:
        pred2_src = "stream" if pred2 is not None else "gid"
        if pred2 is not None and pred2.dtype.itemsize == 8:
            pred2 = pred2.astype(jnp.int32)
        pred2_p = _blocks(pred2) if pred2 is not None else None
    scal = jnp.stack(
        [
            jnp.asarray(thr).astype(jnp.int32),
            jnp.asarray(n_real).astype(jnp.int32),
            jnp.asarray(gid_base).astype(jnp.int32),
            jnp.asarray(thr2).astype(jnp.int32),
        ]
    ).reshape(1, 4)

    r_act = 1
    k1 = -(-num_buckets // k2)

    def _decode(out, k1c):
        acc = (
            out[1].astype(jnp.int64) * jnp.int64(4096)
            + out[0].astype(jnp.int64)
        )
        return acc[:k1c].reshape(-1).astype(jnp.uint64)

    kw = dict(
        interpret=interpret,
        k2=k2,
        pred_blocks=pred_p,
        scal=scal,
        pred_mode=pred_mode,
        pred_op=pred_op,
        pred2_blocks=pred2_p,
        pred2_src=pred2_src,
        pred2_op=pred2_op,
        pred_combine=pred_combine,
    )
    if k1 <= _MAX_ROWS:
        with jax.enable_x64(False):
            out = _call_kernel(gid_p, None, None, k1, r_act, block, **kw)
        return _decode(out, k1)[:num_buckets]

    parts = []
    for c0 in range(0, k1, _MAX_ROWS):
        k1c = min(_MAX_ROWS, k1 - c0)
        gid_c = gid_p.astype(jnp.int32) - jnp.int32(c0 * k2)
        with jax.enable_x64(False):
            out = _call_kernel(gid_c, None, None, k1c, r_act, block, **kw)
        parts.append(_decode(out, k1c))
    return jnp.concatenate(parts)[:num_buckets]


def _multi_agg_kernel(
    gid_ref, *rest, k1, k2, k2_shift, stream_limbs, rows_pad, carry_every
):
    """Multi-stream variant: several value streams (each an i32 word
    contributing 1..4 offset-encoded limb planes) aggregate under ONE
    shared one-hot — the operand layout the repairing unbounded-key
    GROUP BY design needs (count + key-projection limbs + per-limb
    squares + SQL value in a single MXU pass)."""
    refs = list(rest)
    stream_refs = [refs.pop(0) for _ in stream_limbs]
    out_ref, acc_lo, acc_hi = refs
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_lo[:, :] = jnp.zeros_like(acc_lo)
        acc_hi[:, :] = jnp.zeros_like(acc_hi)

    gid = gid_ref[0, :, :]
    B = gid.shape[1]

    ghi = gid >> k2_shift
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (k1, B), 0)
    gmask_all = jnp.where(ghi == iota_j, 1, 0)

    planes = [gmask_all]
    for s_ref, nl in zip(stream_refs, stream_limbs):
        w = s_ref[0, :, :]
        for j in range(nl):
            limb = ((w >> (8 * j)) & 0xFF) - 128
            planes.append(limb * gmask_all)
    tall = jnp.concatenate(planes, axis=0)
    pad = rows_pad - tall.shape[0]
    if pad:
        tall = jnp.concatenate(
            [tall, jnp.zeros((pad, B), jnp.int32)], axis=0
        )
    tall = tall.astype(jnp.int8)

    glo = gid & (k2 - 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k2, B), 0)
    onehot = jnp.where(glo == iota_k, 1, 0).astype(jnp.int8)

    acc_lo[:, :] += jax.lax.dot_general(
        tall,
        onehot,
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


@functools.partial(
    jax.jit,
    static_argnames=("num_buckets", "block", "stream_limbs", "interpret", "k2"),
)
def pallas_multi_sum(
    mask: jax.Array,
    gid: jax.Array,
    streams: Tuple[jax.Array, ...],
    stream_limbs: Tuple[int, ...],
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = None,
    k2: int = None,
):
    """Fused filter + GROUP BY of SEVERAL summed streams in one MXU
    pass (shared one-hot). Each stream is an i32 word whose low
    8*stream_limbs[i] bits are its payload; per-stream sums are exact
    mod 2^64 (full accumulation — NOT truncated to the payload width).
    Returns (counts u64[K], tuple of per-stream sums u64[K]).

    Built for the repairing unbounded-key GROUP BY probe
    (scripts/probe_repair_groupby.py — VERDICT r3 item 4); also the
    general multi-aggregate building block for bounded keys."""
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    r_act = 1 + sum(stream_limbs)
    if k2 is None:
        k2 = _pick_k2(num_buckets, sum(stream_limbs))

    gidm = jnp.where(mask, gid.astype(jnp.int32), -1)
    gid_p = jnp.pad(gidm, (0, pad), constant_values=-1).reshape(nb, 1, block)
    stream_ps = [
        jnp.pad(s.astype(jnp.int32), (0, pad)).reshape(nb, 1, block)
        for s in streams
    ]

    k1 = -(-num_buckets // k2)

    def _decode(out, k1c):
        acc = (
            out[1].astype(jnp.int64) * jnp.int64(4096)
            + out[0].astype(jnp.int64)
        )
        acc = acc[: r_act * k1c].reshape(r_act, k1c, k2)
        counts = acc[0].reshape(-1).astype(jnp.uint64)
        acc_u = acc.astype(jnp.uint64)
        totals = []
        p = 1
        for nl in stream_limbs:
            total = jnp.zeros((k1c * k2,), jnp.uint64)
            offset = 0
            for j in range(nl):
                total = total + (
                    acc_u[p + j].reshape(-1) << jnp.uint64(8 * j)
                )
                offset = (offset + (128 << (8 * j))) & 0xFFFFFFFFFFFFFFFF
            total = total + jnp.uint64(offset) * counts
            totals.append(total)
            p += nl
        return counts, totals

    def _call(gid_blocks, k1c):
        return pl.pallas_call(
            functools.partial(
                _multi_agg_kernel,
                k1=k1c,
                k2=k2,
                k2_shift=k2.bit_length() - 1,
                stream_limbs=stream_limbs,
                rows_pad=-(-(k1c * r_act) // 32) * 32,
                carry_every=CARRY_EVERY_I32,
            ),
            interpret=(
                jax.default_backend() != "tpu"
                if interpret is None
                else interpret
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(1 + len(stream_ps))
            ],
            out_specs=pl.BlockSpec(
                (2, -(-(k1c * r_act) // 32) * 32, k2),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (2, -(-(k1c * r_act) // 32) * 32, k2), jnp.int32
            ),
            scratch_shapes=[
                pltpu.VMEM((-(-(k1c * r_act) // 32) * 32, k2), jnp.int32),
                pltpu.VMEM((-(-(k1c * r_act) // 32) * 32, k2), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * nb * block * (-(-(k1c * r_act) // 32) * 32) * k2,
                bytes_accessed=nb * block * (1 + len(stream_ps)) * 4,
                transcendentals=0,
            ),
        )(gid_blocks, *stream_ps)

    k1_max = max(1, _MAX_ROWS // r_act)
    if k1 <= k1_max:
        with jax.enable_x64(False):
            out = _call(gid_p, k1)
        counts, totals = _decode(out, k1)
        return (
            counts[:num_buckets],
            tuple(t[:num_buckets] for t in totals),
        )

    counts_parts = []
    totals_parts = []
    for c0 in range(0, k1, k1_max):
        k1c = min(k1_max, k1 - c0)
        gid_c = gid_p - jnp.int32(c0 * k2)
        with jax.enable_x64(False):
            out = _call(gid_c, k1c)
        c_part, t_parts = _decode(out, k1c)
        counts_parts.append(c_part)
        totals_parts.append(t_parts)
    counts = jnp.concatenate(counts_parts)[:num_buckets]
    totals = tuple(
        jnp.concatenate([tp[i] for tp in totals_parts])[:num_buckets]
        for i in range(len(stream_limbs))
    )
    return counts, totals


@functools.partial(
    jax.jit,
    static_argnames=("num_buckets", "block", "interpret", "k2"),
)
def pallas_count(
    mask: jax.Array,
    gid: jax.Array,
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = None,
    k2: int = None,
):
    """Fused filter + GROUP BY count(*) — the count-only fast path:
    no value limbs means the tall operand is just the (k1, B) mask
    planes (r_act = 1) and the value words never stream from HBM.

    Returns counts u64[K]; exact."""
    n = gid.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if k2 is None:
        k2 = _pick_k2(num_buckets, 0)

    gidm = jnp.where(mask, gid.astype(jnp.int32), -1)
    gid_p = jnp.pad(gidm, (0, pad), constant_values=-1).reshape(nb, 1, block)

    r_act = 1
    k1 = -(-num_buckets // k2)

    def _decode(out, k1c):
        acc = (
            out[1].astype(jnp.int64) * jnp.int64(4096)
            + out[0].astype(jnp.int64)
        )
        return acc[:k1c].reshape(-1).astype(jnp.uint64)

    if k1 <= _MAX_ROWS:
        with jax.enable_x64(False):
            out = _call_kernel(
                gid_p, None, None, k1, r_act, block, interpret=interpret,
                k2=k2,
            )
        return _decode(out, k1)[:num_buckets]

    parts = []
    for c0 in range(0, k1, _MAX_ROWS):
        k1c = min(_MAX_ROWS, k1 - c0)
        gid_c = gid_p - jnp.int32(c0 * k2)
        with jax.enable_x64(False):
            out = _call_kernel(
                gid_c, None, None, k1c, r_act, block, interpret=interpret,
                k2=k2,
            )
        parts.append(_decode(out, k1c))
    return jnp.concatenate(parts)[:num_buckets]


@functools.partial(
    jax.jit,
    static_argnames=("num_buckets", "block", "agg_kinds", "value_bits"),
)
def pallas_grouped_aggregate(
    mask: jax.Array,
    gid: jax.Array,
    value_arrays: Tuple[jax.Array, ...],
    agg_kinds: Tuple[str, ...],
    num_buckets: int,
    block: int = DEFAULT_BLOCK,
    value_bits: int = 64,
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
            # count-only: skip the value planes and the value stream
            counts = pallas_count(mask, gid, num_buckets, block)
            return counts, tuple(counts for _ in agg_kinds)
        counts, sums = pallas_sum_count(
            mask, gid, sum_vals, num_buckets, block, value_bits=value_bits
        )
        outs = []
        for vals, kind in zip(value_arrays, agg_kinds):
            outs.append(counts if kind == "count" else sums)
        return counts, tuple(outs)

    from eventql_tpu.kernels.onehot_agg import onehot_grouped_aggregate

    return onehot_grouped_aggregate(
        mask, gid, value_arrays, agg_kinds, num_buckets
    )
