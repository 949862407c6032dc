"""Probe: the repairing unbounded-key hash GROUP BY, MEASURED
(VERDICT r3 item 4).

The design under test (PERF.md "Unbounded-key hash GROUP BY"): hash
arbitrary u64 keys into B buckets with an invertible multiply
(pi = key * M mod 2^64, bucket = top bits), aggregate per bucket in
ONE MXU pass (pallas_multi_sum): count, the 8 byte-limbs of pi
(1 limb plane each), the 8 per-limb squares (3 limb planes each), and
the SQL value (2 planes) — 35 operand planes under a shared one-hot.
A bucket is COLLISION-FREE iff for every limb j:
    count * sum(limb_j^2) == (sum(limb_j))^2
(zero per-limb variance over exact integer sums — Cauchy-Schwarz
equality iff the limb is constant; pi invertible => key constant).
Clean buckets reconstruct exactly: limb_j = sum_j / count,
key = pi * M^-1. Repair is gather-free: a SECOND full round under an
independent multiplier M2 resolves keys whose first bucket collided
(per-row "was my bucket dirty" would be a gather — 0.14 Grows/s,
PERF.md — so re-hashing everything is the cheaper exact repair).

This probe (a) validates the full 2-round pipeline bit-exactly against
np.unique on a small n, (b) measures rounds at the VERDICT-prescribed
K in {4096, 16384, 65536} on 16.7M rows, against the shipping
sort-based general path (kernels/groupby.masked_grouped_aggregate) on
identical data. Ship bar: >= 1.5x the sort path.

Run: python scripts/probe_repair_groupby.py  (real chip)
     QUICK=1 for the correctness tier only (CPU ok)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M1 = 0x9E3779B97F4A7C15  # golden-ratio odd multiplier (invertible)
M2 = 0xC2B2AE3D27D4EB4F  # xxhash odd multiplier (independent)


def _minv(m):
    """Inverse of odd m mod 2^64 (Newton)."""
    x = m
    for _ in range(6):
        x = (x * (2 - m * x)) & 0xFFFFFFFFFFFFFFFF
    assert (x * m) & 0xFFFFFFFFFFFFFFFF == 1
    return x


def round_streams(keys_u64, values_u64, mult, bbits):
    """Device-side per-row stream construction for one round (counted
    in the measured cost: this is per-query work)."""
    import jax.numpy as jnp

    pi = keys_u64 * jnp.uint64(mult)  # mod 2^64
    gid = (pi >> jnp.uint64(64 - bbits)).astype(jnp.int32)
    streams = []
    limbs = []
    for j in range(8):
        lj = ((pi >> jnp.uint64(8 * j)) & jnp.uint64(0xFF)).astype(jnp.int32)
        streams.append(lj)
        limbs.append(1)
    for j in range(8):
        lj = streams[j]
        streams.append(lj * lj)
        limbs.append(3)
    streams.append(values_u64.astype(jnp.int32))
    limbs.append(2)
    return gid, tuple(streams), tuple(limbs)


def run_round(keys_u64, values_u64, mult, bbits):
    import jax.numpy as jnp

    from eventql_tpu.kernels.pallas_groupby import pallas_multi_sum

    n = keys_u64.shape[0]
    gid, streams, limbs = round_streams(keys_u64, values_u64, mult, bbits)
    mask = jnp.ones((n,), jnp.bool_)
    counts, totals = pallas_multi_sum(
        mask, gid, streams, limbs, 1 << bbits
    )
    return counts, totals


def reconstruct(counts_h, totals_h, mult):
    """Host O(B) postpass: clean detection + key/aggregate recovery."""
    counts = counts_h.astype(np.uint64)
    occ = counts > 0
    limb_sums = [totals_h[j].astype(np.uint64) for j in range(8)]
    sq_sums = [totals_h[8 + j].astype(np.uint64) for j in range(8)]
    val_sums = totals_h[16].astype(np.uint64)
    clean = occ.copy()
    for j in range(8):
        clean &= counts * sq_sums[j] == limb_sums[j] * limb_sums[j]
        clean &= np.where(counts > 0, limb_sums[j] % np.maximum(counts, 1), 1) == 0
    pi = np.zeros_like(counts)
    cnz = np.maximum(counts, 1)
    for j in range(8):
        pi |= (limb_sums[j] // cnz) << np.uint64(8 * j)
    keys = (pi * np.uint64(_minv(mult))).astype(np.uint64)
    return clean, keys, counts, val_sums


def full_pipeline_host_check(n=1 << 18, K=1500, seed=5):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    rng = np.random.default_rng(seed)
    uniq = rng.integers(0, 1 << 63, K, dtype=np.uint64) * 2 + 1
    uniq = np.unique(uniq)
    keys = uniq[rng.integers(0, len(uniq), n)]
    vals = rng.integers(0, 1 << 16, n).astype(np.uint64)
    bbits = max(8, int(np.ceil(np.log2(len(uniq) * 4))))

    kd, vd = jnp.asarray(keys), jnp.asarray(vals)
    resolved = {}
    residual = None
    for mult in (M1, M2):
        counts, totals = run_round(kd, vd, mult, bbits)
        counts_h = np.asarray(counts)
        totals_h = [np.asarray(t) for t in totals]
        clean, bkeys, bcounts, bvals = reconstruct(counts_h, totals_h, mult)
        for i in np.nonzero(clean)[0]:
            k = int(bkeys[i])
            if k not in resolved:
                resolved[k] = (int(bcounts[i]), int(bvals[i]))
        # dirty-key mask for reporting (derived exactly on host)
        pi = keys * np.uint64(mult)
        g = (pi >> np.uint64(64 - bbits)).astype(np.int64)
        key_dirty = ~clean[g] if residual is None else residual & ~clean[g]
        residual = key_dirty

    want = {}
    for k, v in zip(keys, vals):
        c, s = want.get(int(k), (0, 0))
        want[int(k)] = (c + 1, (s + int(v)) & 0xFFFFFFFFFFFFFFFF)
    n_unresolved = 0
    for k, cv in want.items():
        if k in resolved:
            assert resolved[k] == cv, (k, resolved[k], cv)
        else:
            n_unresolved += 1
    print(
        f"correctness: K={len(uniq)} B=2^{bbits}: "
        f"{len(want) - n_unresolved}/{len(want)} keys resolved exactly "
        f"across 2 rounds; residual {n_unresolved} "
        f"({100.0 * n_unresolved / len(want):.3f}% -> round 3 / "
        f"fallback in a shipped route)"
    )


def measure():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from eventql_tpu.kernels.groupby import masked_grouped_aggregate
    from eventql_tpu.kernels.pallas_groupby import pallas_multi_sum

    from bench import _relay_rtt

    n = int(os.environ.get("BENCH_ROWS", 1 << 24))
    reps = int(os.environ.get("BENCH_REPS", 8))
    rtt = _relay_rtt()
    print(f"n={n} reps={reps} relay rtt {rtt * 1e3:.1f} ms")

    for K in (4096, 16384, 65536):
        rng = np.random.default_rng(42)
        uniq = np.unique(
            rng.integers(0, 1 << 63, K, dtype=np.uint64) * 2 + 1
        )
        keys = uniq[rng.integers(0, len(uniq), n)]
        vals = rng.integers(0, 1 << 16, n).astype(np.uint64)
        bbits = int(np.ceil(np.log2(len(uniq) * 4)))
        kd, vd = jnp.asarray(keys), jnp.asarray(vals)

        # one hash round (the repair design pays TWO of these)
        @jax.jit
        def one_round(kd, vd, salt):
            def body(i, acc):
                counts, totals = pallas_multi_sum(
                    *_round_args(kd + i.astype(jnp.uint64), vd),
                )
                return acc + counts.sum() + totals[16].sum()

            return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

        def _round_args(kk, vv):
            gid, streams, limbs = round_streams(kk, vv, M1, bbits)
            return (
                jnp.ones((kk.shape[0],), jnp.bool_),
                gid,
                streams,
                limbs,
                1 << bbits,
            )

        out = one_round(kd, vd, 0)
        _ = np.asarray(out)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(one_round(kd, vd, _i))
            ts.append(time.perf_counter() - t0)
        t_round = max(min(ts) - rtt, 1e-9) / reps
        r1 = n / t_round / 1e9

        # shipping sort-based general path on identical data
        @jax.jit
        def sort_path(kd, vd):
            def body(i, acc):
                gk, outs, fi, ng = masked_grouped_aggregate(
                    jnp.ones((kd.shape[0],), jnp.bool_),
                    (kd + i.astype(jnp.uint64),),
                    (vd, vd),
                    ("count", "sum"),
                )
                return acc + outs[0].sum() + ng.astype(jnp.uint64)

            return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

        out = sort_path(kd, vd)
        _ = np.asarray(out)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(sort_path(kd, vd))
            ts.append(time.perf_counter() - t0)
        t_sort = max(min(ts) - rtt, 1e-9) / reps
        rs = n / t_sort / 1e9

        print(
            f"K={K:6d} B=2^{bbits}: hash round {r1:6.3f} Grows/s "
            f"-> 2-round repair {r1 / 2:6.3f} | sort path {rs:6.3f} "
            f"| repair/sort = {r1 / 2 / rs:5.2f}x"
        )


if __name__ == "__main__":
    if not os.environ.get("SKIP_CHECK"):
        full_pipeline_host_check()
    if not os.environ.get("QUICK"):
        measure()
