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

# the fingerprint-compare join kernel compares each fact block against
# ALL dims in 2048-dim VMEM chunks (O(D) per row); per-row cost grows
# linearly with D, crossing the sort-merge join's throughput around 8K
# dims (measured v5e — PERF.md), where that path takes over
MAX_COMPARE_DIMS = 8192
_COMPARE_CHUNK = 2048
_JOIN_BLOCK = 4096


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

    nd = dim_keys.shape[0]
    if nd <= MAX_COMPARE_DIMS and dim_fingerprints_unique(
        np.asarray(dim_keys)
    ):
        # gather-free probe: one (D, B) fingerprint compare + int8 MXU
        # payload extraction (see pallas_dim_join_gid)
        gid = pallas_dim_join_gid(fact_keys, dim_keys, dim_bucket)
        mask = fact_mask & (gid >= 0)
        gid = jnp.maximum(gid, 0)
        return pallas_sum_count(mask, gid, fact_values, num_buckets)

    if num_buckets <= (1 << 16):
        # large dim table: sort-merge join (gather-free; ~50x the
        # searchsorted+gather path measured on v5e)
        return sorted_merge_join_aggregate(
            fact_keys, fact_values, fact_mask, dim_keys, dim_bucket,
            num_buckets,
        )

    sk, perm = build_side(dim_keys)
    idx, matched = dim_join_gather(sk, perm, fact_keys)
    gid, mask = _gather_gid(dim_bucket, idx, matched, fact_mask)
    return pallas_sum_count(mask, gid, fact_values, num_buckets)


# -- gather-free dimension join (Pallas) ------------------------------------
#
# XLA dynamic gather runs ~0.14 Grows/s on v5e, which caps the
# binary-search probe at ~6 Mrows/s. For bounded dimension tables the
# probe re-casts as dense compute:
#   * each fact row's 32-bit key fingerprint compares against ALL dim
#    fingerprints at once — one (D, B) VPU compare, no gather
#   * the matched dim's payload (bucket id + full key for verification)
#    extracts through ONE int8 MXU matmul: planes(P, D) @ eq(D, B)
#   * the reconstructed dim key must equal the fact key (collisions of
#    the fingerprint across fact keys are caught exactly); the caller
#    pre-checks that dim fingerprints are mutually unique and falls
#    back to searchsorted otherwise

import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P_PLANES = 16  # ones + 2 bucket limbs + 8 key limbs, padded to 16


def _fingerprint(lo, hi):
    # cheap 32-bit mix of both words; arithmetic shifts are masked so
    # int32 (device) and uint32 (host check) agree bit for bit
    return (
        lo
        ^ ((hi << 13) | ((hi >> 19) & 0x1FFF))
        ^ ((hi >> 7) & 0x01FFFFFF)
    )


def _join_kernel(flo_ref, fhi_ref, dfp_ref, planes_ref, gid_ref, *, chunk):
    flo = flo_ref[0, :, :]  # (1, B) i32
    fhi = fhi_ref[0, :, :]
    B = flo.shape[1]
    D = dfp_ref.shape[0]

    h = _fingerprint(flo, fhi)  # (1, B)

    # chunk the (D, B) compare so the eq matrix stays VMEM-bounded for
    # D > 2048; the payload matmul accumulates across chunks (a match
    # hits exactly one chunk, the rest contribute zero)
    m = None
    for c0 in range(0, D, chunk):
        dfp_c = dfp_ref[c0 : c0 + chunk, :]  # (chunk, 1) fingerprints
        eq = jnp.where(dfp_c == h, 1, 0).astype(jnp.int8)  # (chunk, B)
        part = jax.lax.dot_general(
            planes_ref[:, c0 : c0 + chunk],  # (P, chunk) int8
            eq,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (P, B)
        m = part if m is None else m + part

    cnt = m[0:1, :]  # matches per row (0 or 1: dim fps unique)
    off = 128 * cnt  # un-offset the int8 encoding

    def limb(i):
        return m[i : i + 1, :] + off

    bucket = limb(1) | (limb(2) << 8)
    dlo = limb(3) | (limb(4) << 8) | (limb(5) << 16) | (limb(6) << 24)
    dhi = limb(7) | (limb(8) << 8) | (limb(9) << 16) | (limb(10) << 24)

    valid = (cnt == 1) & (dlo == flo) & (dhi == fhi)
    gid_ref[0, :, :] = jnp.where(valid, bucket, -1)


def _dim_planes(dim_keys: jax.Array, dim_bucket: jax.Array, D: int):
    """(P, D) int8 payload planes + (D, 1) fingerprints, zero-padded."""
    nd = dim_keys.shape[0]
    words = jax.lax.bitcast_convert_type(
        dim_keys.astype(jnp.uint64), jnp.uint32
    )
    dlo = words[:, 0].astype(jnp.int32)
    dhi = words[:, 1].astype(jnp.int32)
    db = dim_bucket.astype(jnp.int32)

    # ones plane stays unoffset (0/1 fits int8); payload limbs are
    # offset by -128 and recovered via 128 * match-count. Padded dim
    # slots are all-zero on every plane, so even a fact fingerprint
    # that collides with a padded slot contributes nothing.
    rows = [jnp.ones((nd,), jnp.int32)]
    for w, j in [(db, 0), (db, 1)]:
        rows.append(((w >> (8 * j)) & 0xFF) - 128)
    for w in (dlo, dhi):
        for j in range(4):
            rows.append(((w >> (8 * j)) & 0xFF) - 128)
    planes = jnp.stack(rows, axis=0)
    pad_rows = _P_PLANES - planes.shape[0]
    planes = jnp.concatenate(
        [planes, jnp.zeros((pad_rows, nd), jnp.int32)], axis=0
    )
    if D > nd:
        planes = jnp.concatenate(
            [planes, jnp.zeros((_P_PLANES, D - nd), jnp.int32)], axis=1
        )
    planes = planes.astype(jnp.int8)

    fp = _fingerprint(dlo, dhi)
    if D > nd:
        fp = jnp.concatenate(
            [fp, jnp.full((D - nd,), jnp.int32(-0x55AA55AB))]
        )
    return planes, fp.reshape(D, 1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_dim_join_gid(
    fact_keys: jax.Array,
    dim_keys: jax.Array,
    dim_bucket: jax.Array,
    block: int = _JOIN_BLOCK,
    interpret: bool = None,
):
    """Per fact row: the joined dim's bucket id, or -1 when the key has
    no dim match. Caller MUST ensure dim fingerprints are unique
    (dim_fingerprints_unique) — collisions between dims would double
    match; fact-side fingerprint collisions are verified exactly."""
    n = fact_keys.shape[0]
    nd = dim_keys.shape[0]
    D = max(128, -(-nd // 128) * 128)

    fwords = jax.lax.bitcast_convert_type(
        fact_keys.astype(jnp.uint64), jnp.uint32
    )
    flo = fwords[:, 0].astype(jnp.int32)
    fhi = fwords[:, 1].astype(jnp.int32)
    nb = -(-n // block)
    pad = nb * block - n
    flo_p = jnp.pad(flo, (0, pad)).reshape(nb, 1, block)
    fhi_p = jnp.pad(fhi, (0, pad)).reshape(nb, 1, block)

    planes, dfp = _dim_planes(dim_keys, dim_bucket, D)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        gid = pl.pallas_call(
            functools.partial(
                _join_kernel, chunk=min(D, _COMPARE_CHUNK)
            ),
            interpret=interpret,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_P_PLANES, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
        )(flo_p, fhi_p, dfp, planes)
    return gid.reshape(-1)[:n]


# -- sort-merge windowed join (large dimension tables) ----------------------
#
# Beyond the VMEM-bounded compare kernel, per-row table lookups on TPU
# are gather-bound (measured v5e: XLA gather 0.14 Grows/s flat in table
# size; searchsorted probe 0.004 Grows/s). lax.sort however runs
# 0.33 Grows/s on u64 keys WITH payloads riding free — so the scalable
# join sorts the fact side once and turns the probe into dense compute:
#
#   * facts sort by key (order-preserving u64 transform)
#   * each block of B sorted facts spans a narrow contiguous range of
#     the sorted dim table (~B * D / n dims for uniform keys); the
#     block's dim window of W entries is fetched with ONE dynamic_slice
#     (a contiguous DMA — not a gather)
#   * the (W, B) full-key equality compare is exact (no fingerprints,
#     no collision precondition); the matched dim's bucket id extracts
#     through an int8 matmul with offset-encoded limb planes, exactly
#     like the hash-aggregate kernel's encoding
#   * a block whose dim span overflows W (possible at hot-key
#     boundaries or when dims outnumber facts) takes a PER-BLOCK
#     lax.cond branch into binary search — only skewed blocks pay, and
#     exactness never depends on the window guess
#
# Downstream aggregation is order-free, so the sorted row order never
# needs to be undone (the reference's analog materializes a hash
# multimap per query: sql/statements/select/hash_join.cc:123-230).

_MERGE_BLOCK = 16384  # measured best on v5e (scan-step overhead amortized)
_MERGE_WINDOW = 512  # pallas window compare: 0.75 Grows/s at 512 vs 0.51 at 1024
_PALLAS_JOIN_BLOCK = 2048  # VMEM bound: (B, W) eq matrix + (B, 1) keys


@functools.partial(jax.jit, static_argnames=("block", "window"))
def merge_join_gid(
    fact_keys_sorted: jax.Array,
    dim_keys: jax.Array,
    dim_bucket: jax.Array,
    block: int = _MERGE_BLOCK,
    window: int = _MERGE_WINDOW,
):
    """Per sorted-fact row: the joined dim's bucket id, or -1 when the
    key has no dim match. fact_keys_sorted MUST be ascending in
    sortable_u64 order; dim keys must be unique (dimension contract).

    Returns gid int32 [n]."""
    n = fact_keys_sorted.shape[0]
    nd = dim_keys.shape[0]
    if nd == 0:
        return jnp.full((n,), -1, jnp.int32)
    nb = -(-n // block)
    pad = nb * block - n

    sfk = sortable_u64(fact_keys_sorted)
    sdk, dperm = build_side(dim_keys)  # sorted dim keys + permutation
    db_sorted = dim_bucket.astype(jnp.int32)[dperm]

    # pad the dim side to a 128-aligned, >=window length; padded slots
    # carry valid=0 planes so any key equality there contributes nothing
    d_pad = max(window, -(-nd // 128) * 128)
    dk_p = jnp.pad(sdk, (0, d_pad - nd))
    db_p = jnp.pad(db_sorted, (0, d_pad - nd))
    dvalid = jnp.pad(
        jnp.ones((nd,), jnp.int8), (0, d_pad - nd)
    )

    # offset-encoded int8 payload planes (cf. pallas_groupby.py:98-105):
    # [valid, bucket limb0, bucket limb1]; limbs recover via 128 * count
    planes = jnp.stack(
        [
            dvalid.astype(jnp.int32),
            (((db_p >> 0) & 0xFF) - 128) * dvalid,
            (((db_p >> 8) & 0xFF) - 128) * dvalid,
        ],
        axis=0,
    ).astype(jnp.int8)  # (3, d_pad)

    # pad facts with the max key (can only land in the last window and
    # match nothing real thanks to the valid plane)
    sfk_p = jnp.pad(
        sfk, (0, pad), constant_values=jnp.uint64(0xFFFFFFFFFFFFFFFF)
    ).reshape(nb, block)

    # per-block dim window starts: nb searches over the dim table, each
    # log2(d) steps on a tiny array — NOT a per-row probe
    first = sfk_p[:, 0]
    last = sfk_p[:, -1]
    starts_raw = jnp.searchsorted(dk_p[:nd], first, side="left")
    ends = jnp.searchsorted(dk_p[:nd], last, side="right")
    starts = jnp.clip(
        starts_raw.astype(jnp.int32) & ~jnp.int32(127),
        0,
        d_pad - window,
    )
    covered = (ends.astype(jnp.int32) - starts) <= window

    def window_branch(fk_blk, w):
        dw = jax.lax.dynamic_slice(dk_p, (w,), (window,))
        pw = jax.lax.dynamic_slice(planes, (jnp.int32(0), w), (3, window))
        eq = (dw[:, None] == fk_blk[None, :]).astype(jnp.int8)
        m = jax.lax.dot_general(
            pw,
            eq,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (3, B)
        cnt = m[0]
        off = 128 * cnt
        bucket = (m[1] + off) | ((m[2] + off) << 8)
        return jnp.where(cnt == 1, bucket, -1).astype(jnp.int32)

    def search_branch(fk_blk, _w):
        # block spans more than `window` dims: binary search this block
        pos = jnp.clip(
            jnp.searchsorted(sdk, fk_blk, side="left"), 0, max(nd - 1, 0)
        )
        matched = sdk[pos] == fk_blk
        return jnp.where(matched, db_sorted[pos], -1).astype(jnp.int32)

    def body(_carry, xs):
        fk_blk, w, ok = xs
        gid_blk = jax.lax.cond(
            ok, window_branch, search_branch, fk_blk, w.astype(jnp.int32)
        )
        return _carry, gid_blk

    def scan_path(_):
        _c, gids = jax.lax.scan(body, 0, (sfk_p, starts, covered))
        return gids.reshape(-1)[:n]

    def pallas_path(_):
        # the kernel re-blocks at a finer granularity than the scan
        # path (VMEM bound: the (B, W) eq matrix); a sub-block of a
        # covered block is itself covered (its aligned start is >= the
        # parent's, its end <= the parent's end <= parent start + W)
        pblock = min(block, _PALLAS_JOIN_BLOCK)
        nb2 = (nb * block) // pblock
        sfk_2 = sfk_p.reshape(nb2, pblock)
        starts_2 = jnp.clip(
            jnp.searchsorted(
                dk_p[:nd], sfk_2[:, 0], side="left"
            ).astype(jnp.int32)
            & ~jnp.int32(127),
            0,
            d_pad - window,
        )
        words = jax.lax.bitcast_convert_type(sfk_2, jnp.uint32)
        # facts as natural lane rows (1, pblock); dim words as lane rows
        # (1, d_pad) so the window DMA slices the 128-aligned lane dim
        flo_p = words[..., 0].astype(jnp.int32).reshape(nb2, 1, pblock)
        fhi_p = words[..., 1].astype(jnp.int32).reshape(nb2, 1, pblock)
        dwords = jax.lax.bitcast_convert_type(dk_p, jnp.uint32)
        dlo_row = dwords[:, 0].astype(jnp.int32).reshape(1, d_pad)
        dhi_row = dwords[:, 1].astype(jnp.int32).reshape(1, d_pad)
        gid = _window_join_pallas(
            flo_p, fhi_p, starts_2, dlo_row, dhi_row, planes, window
        )
        return gid.reshape(-1)[:n]

    # common case: every block's dim span fits its window → the Pallas
    # kernel (DMA'd windows, no scan-step/cond overhead); any overflow
    # block flips the program to the scan path whose per-block cond
    # handles mixed skew exactly
    return jax.lax.cond(jnp.all(covered), pallas_path, scan_path, 0)


def _window_dmas(starts_ref, dlo_hbm, dhi_hbm, planes_hbm,
                 dlo_s, dhi_s, pw_s, sems, slot, blk, window):
    w = pl.multiple_of(starts_ref[blk], 128)
    return (
        pltpu.make_async_copy(
            dlo_hbm.at[:, pl.ds(w, window)], dlo_s.at[slot], sems.at[slot, 0]
        ),
        pltpu.make_async_copy(
            dhi_hbm.at[:, pl.ds(w, window)], dhi_s.at[slot], sems.at[slot, 1]
        ),
        pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(w, window)], pw_s.at[slot], sems.at[slot, 2]
        ),
    )


def _window_join_kernel(
    starts_ref, flo_ref, fhi_ref, dlo_hbm, dhi_hbm, planes_hbm, gid_ref,
    dlo_s, dhi_s, pw_s, sems, *, window
):
    """Per sorted-fact block: DMA the block's dim window from HBM
    (double-buffered: block i+1's window prefetches during block i's
    compute) and run the exact full-key compare + int8-matmul bucket
    extraction."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        for dma in _window_dmas(
            starts_ref, dlo_hbm, dhi_hbm, planes_hbm,
            dlo_s, dhi_s, pw_s, sems, 0, 0, window,
        ):
            dma.start()

    @pl.when(i + 1 < nb)
    def _():
        for dma in _window_dmas(
            starts_ref, dlo_hbm, dhi_hbm, planes_hbm,
            dlo_s, dhi_s, pw_s, sems, nxt, i + 1, window,
        ):
            dma.start()

    for dma in _window_dmas(
        starts_ref, dlo_hbm, dhi_hbm, planes_hbm,
        dlo_s, dhi_s, pw_s, sems, slot, i, window,
    ):
        dma.wait()

    flo = flo_ref[0, :, :]  # (1, B) fact key words
    fhi = fhi_ref[0, :, :]
    # transpose the small window row (1, W) into a column (W, 1) so the
    # compare broadcasts to (W, B) without lane-padding the fact stream
    dlo_col = jnp.transpose(dlo_s[slot, :, :])
    dhi_col = jnp.transpose(dhi_s[slot, :, :])
    eq = (
        (dlo_col == flo) & (dhi_col == fhi)
    ).astype(jnp.int8)  # (window, B)
    m = jax.lax.dot_general(
        pw_s[slot, :, :],
        eq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (8, B)
    cnt = m[0:1, :]
    off = 128 * cnt
    bucket = (m[1:2, :] + off) | ((m[2:3, :] + off) << 8)
    gid_ref[0, :, :] = jnp.where(cnt == 1, bucket, -1)


def _window_join_pallas(
    flo_p, fhi_p, starts, dlo_row, dhi_row, planes, window
):
    nb, _one, block = flo_p.shape
    # pad the plane operand to 8 sublanes for the int8 matmul
    planes8 = jnp.concatenate(
        [planes, jnp.zeros((8 - planes.shape[0], planes.shape[1]), jnp.int8)],
        axis=0,
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_window_join_kernel, window=window),
            interpret=jax.default_backend() != "tpu",
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
                pl.BlockSpec(
                    (1, 1, block), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, block), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # dlo (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # dhi (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # planes (HBM)
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, 1, window), jnp.int32),
                pltpu.VMEM((2, 1, window), jnp.int32),
                pltpu.VMEM((2, 8, window), jnp.int8),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )(starts, flo_p, fhi_p, dlo_row, dhi_row, planes8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_buckets", "block", "window", "value_bits", "key_bound",
    ),
)
def sorted_merge_join_aggregate(
    fact_keys: jax.Array,
    fact_values: jax.Array,
    fact_mask: jax.Array,
    dim_keys: jax.Array,
    dim_bucket: jax.Array,
    num_buckets: int,
    block: int = _MERGE_BLOCK,
    window: int = _MERGE_WINDOW,
    value_bits: int = 64,
    key_bound=None,
):
    """fact-dim join + GROUP BY aggregate for dimension tables too large
    for the VMEM compare kernel: sort facts (payloads ride free), merge-
    join against the sorted dims, aggregate in sorted order (order-free).

    value_bits: static bound on the value width (planner column-stats
    hint). When < 64 the filter mask packs into the value word, cutting
    the sort to two operands (measured v5e: 0.33 vs 0.21 Grows/s).

    key_bound: optional static (lo, hi) bound on sortable_u64(fact_keys)
    (planner column-stats hint — dictionary-id or narrowed join keys).
    A span that fits 32 bits sorts as a uint32 key — the sort stage is
    operand-width bound (~65% of this pipeline's wall time) — and
    widens back before the window merge, so the merge kernel and the
    dim side are unchanged.

    Returns (counts u64[K], sums u64[K])."""
    from eventql_tpu.kernels.pallas_groupby import pallas_sum_count

    sk = sortable_u64(fact_keys)
    key_lo = None
    if key_bound is not None and (key_bound[1] - key_bound[0]) <= 0xFFFFFFFF:
        key_lo = key_bound[0]
        sk = (sk - jnp.uint64(key_lo)).astype(jnp.uint32)
    vals = fact_values.astype(jnp.uint64)
    if value_bits < 32:
        # narrow values: one u32 payload word (measured v5e: [u64, i32]
        # sorts at 0.33 Grows/s vs 0.21 for a u64 or third operand)
        packed32 = (
            (vals.astype(jnp.uint32) << jnp.uint32(1))
            | fact_mask.astype(jnp.uint32)
        )
        sk_s, packed_s = jax.lax.sort([sk, packed32], num_keys=1)
        vals_s = (packed_s >> jnp.uint32(1)).astype(jnp.uint64)
        mask_s = (packed_s & jnp.uint32(1)).astype(jnp.uint8)
    elif value_bits < 64:
        packed = (vals << jnp.uint64(1)) | fact_mask.astype(jnp.uint64)
        sk_s, packed_s = jax.lax.sort([sk, packed], num_keys=1)
        vals_s = packed_s >> jnp.uint64(1)
        mask_s = (packed_s & jnp.uint64(1)).astype(jnp.uint8)
    else:
        sk_s, vals_s, mask_s = jax.lax.sort(
            [sk, vals, fact_mask.astype(jnp.uint8)], num_keys=1
        )
    if key_lo is not None:
        # restore the u64 sortable keys for the window merge (order is
        # identical: the downcast is a monotonic bijection)
        sk_s = sk_s.astype(jnp.uint64) + jnp.uint64(key_lo)
    gid = merge_join_gid(sk_s, dim_keys, dim_bucket, block, window)
    mask = (mask_s > 0) & (gid >= 0)
    return pallas_sum_count(
        mask,
        jnp.maximum(gid, 0),
        vals_s,
        num_buckets,
        value_bits=value_bits,
    )


@jax.jit
def _gather_gid(dim_bucket, idx, matched, fact_mask):
    safe_idx = jnp.where(matched, idx, 0)
    gid = dim_bucket[safe_idx].astype(jnp.int32)
    return gid, fact_mask & matched


def dim_fingerprints_unique(dim_keys_host) -> bool:
    """Host-side precondition check for the fingerprint-compare join
    (bit-identical to the kernel's masked-shift fingerprint)."""
    dk = np.asarray(dim_keys_host, dtype=np.uint64)
    lo = (dk & np.uint64(0xFFFFFFFF)).astype(np.int64)
    hi = (dk >> np.uint64(32)).astype(np.int64)
    fp = (
        lo
        ^ (((hi << 13) & 0xFFFFFFFF) | ((hi >> 19) & 0x1FFF))
        ^ ((hi >> 7) & 0x01FFFFFF)
    ) & 0xFFFFFFFF
    return len(np.unique(fp)) == len(fp)
