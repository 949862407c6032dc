"""Padded-bucket sample sort probe (round-5 VERDICT item 5).

The bitonic compare-split mesh sort pays log2(P)(log2(P)+1)/2 stages,
each a FULL-run exchange + merge-resort — its own projection says
0.195 weak-scaling efficiency at P=8 (PERF.md). The padded-bucket
sample sort (parallel/distributed.distributed_bucket_sort — exact on
the virtual mesh, fuzz + skew-fallback tested) replaces that with ONE
fixed-capacity exchange round:

    wall_bucket = t_sort(n) + t_partition(n) + X_bucket + t_sort(f*n)
    wall_bitonic = t_sort(n) + S * (t_merge(n) + X_stage)
      S = log2(P)(log2(P)+1)/2 stages, X_* = link model time

This probe MEASURES t_sort / t_merge / t_partition on the real chip
(48-deep chains, interleaved-RTT timing) and combines them with the
analytic exchange volumes (tally-verified on the virtual mesh:
bucket all-to-all per device = f*n rows x itemsize, hop-weighted by
the ring distance sum; bitonic stage s exchanges the full run at its
partner distance) and the v5e link model (45 GB/s/direction) into
projected P=8 walls. Ship bar from the VERDICT: >= 1.5x the bitonic
projection.

Run on the real TPU: python scripts/probe_bucket_sort.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPS = int(os.environ.get("BENCH_REPS", 16))
N = int(os.environ.get("BENCH_ROWS", 1 << 22))  # per-shard rows
P = 8
F = 2.0  # bucket capacity factor
LINK_GBPS = 45e9  # v5e ICI per direction (exchange_model.py assumption)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    @jax.jit
    def _nop(x):
        return x + 1

    _ = np.asarray(_nop(jnp.int32(0)))

    def timeit(fn, *args):
        out = fn(*args)
        _ = np.asarray(out)
        diffs = []
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(_nop(jnp.int32(i)))
            t1 = time.perf_counter()
            _ = np.asarray(fn(*args))
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        diffs.sort()
        return max(diffs[len(diffs) // 2], 1e-9) / REPS

    rng = np.random.default_rng(11)
    keys = jnp.asarray(rng.integers(0, 1 << 60, N).astype(np.uint64))
    pay = jnp.asarray(np.arange(N, dtype=np.uint64))
    n2 = int(F * N)
    keys2 = jnp.asarray(rng.integers(0, 1 << 60, n2).astype(np.uint64))
    pay2 = jnp.asarray(np.arange(n2, dtype=np.uint64))

    # t_sort(n): the 2-operand local sort both methods start with
    @jax.jit
    def sort_chain(k, p):
        def body(i, carry):
            kk, pp = carry
            out = jax.lax.sort([kk + i.astype(jnp.uint64), pp], num_keys=1)
            return (out[0], out[1])

        return jax.lax.fori_loop(0, REPS, body, (k, p))

    t_sort_n = timeit(sort_chain, keys, pay)
    t_sort_fn = timeit(sort_chain, keys2, pay2)
    print(f"t_sort(n={N}):    {t_sort_n * 1e3:8.2f} ms", flush=True)
    print(f"t_sort({F:.0f}n):      {t_sort_fn * 1e3:8.2f} ms", flush=True)

    # t_merge(n): one bitonic compare-split stage's local half
    # (elementwise keep + merge-resort of the kept bitonic run)
    from eventql_tpu.parallel.distributed import _bitonic_merge_resort

    ks = jax.lax.sort([keys, pay], num_keys=1)

    @jax.jit
    def merge_chain(k, p, other):
        def body(i, carry):
            kk, pp = carry
            keep = jnp.minimum(kk, other + i.astype(jnp.uint64))
            mk, (mp,) = _bitonic_merge_resort((keep,), (pp,), 1)
            return (mk[0], mp)

        return jax.lax.fori_loop(0, REPS, body, (k, p))

    t_merge = timeit(merge_chain, ks[0], ks[1], keys2[:N])
    print(f"t_merge(n):       {t_merge * 1e3:8.2f} ms", flush=True)

    # t_partition(n): sample + searchsorted + (P, C) capacity pack
    C = int(F * N / P)
    s = 64

    @jax.jit
    def partition_chain(k_sorted, p_sorted):
        def body(i, acc):
            ksz = k_sorted + i.astype(jnp.uint64)
            idx = (jnp.arange(s) * N) // s
            samples = jnp.sort(ksz[idx])
            q = (jnp.arange(1, P) * s) // P
            splitters = samples[q]
            starts = jnp.searchsorted(ksz, splitters)
            starts = jnp.concatenate(
                [jnp.zeros((1,), starts.dtype), starts]
            )
            ends = jnp.concatenate(
                [starts[1:], jnp.full((1,), N, starts.dtype)]
            )
            counts = ends - starts
            iota_c = jnp.arange(C)

            def pack(j):
                pos = jnp.minimum(starts[j] + iota_c, N - 1)
                v = ksz[pos]
                return jnp.where(
                    iota_c < counts[j], v, jnp.uint64(0xFFFFFFFFFFFFFFFF)
                )

            send = jax.vmap(pack)(jnp.arange(P))
            return acc + send.sum()

        return jax.lax.fori_loop(0, REPS, body, jnp.uint64(0))

    t_part = timeit(partition_chain, ks[0], ks[1])
    print(f"t_partition(n):   {t_part * 1e3:8.2f} ms", flush=True)

    # exchange volumes per device (16 B/row: u64 key + u64 payload),
    # hop-weighted for the 1D ring (tally-verified on the virtual mesh)
    row_bytes = 16
    ring_hops_total = sum(min(d, P - d) for d in range(1, P))  # 16 @ P=8
    x_bucket_bytes = (F * N / P) * row_bytes * ring_hops_total
    x_bucket = x_bucket_bytes / LINK_GBPS
    # bitonic stages at P=8: partner distances per compare-split stage
    stage_hops = [4, 2, 1, 2, 1, 1]  # XOR partners, ring-embedded
    x_bitonic = sum(h * N * row_bytes / LINK_GBPS for h in stage_hops)

    wall_bucket = t_sort_n + t_part + x_bucket + t_sort_fn
    n_stages = 6
    wall_bitonic = t_sort_n + n_stages * t_merge + x_bitonic
    t1 = t_sort_n  # single chip sorting its own n rows
    out = {
        "n_per_shard": N,
        "P": P,
        "t_sort_n_ms": round(t_sort_n * 1e3, 3),
        "t_sort_fn_ms": round(t_sort_fn * 1e3, 3),
        "t_merge_ms": round(t_merge * 1e3, 3),
        "t_partition_ms": round(t_part * 1e3, 3),
        "x_bucket_ms": round(x_bucket * 1e3, 3),
        "x_bitonic_ms": round(x_bitonic * 1e3, 3),
        "wall_bucket_ms": round(wall_bucket * 1e3, 3),
        "wall_bitonic_ms": round(wall_bitonic * 1e3, 3),
        "speedup_vs_bitonic": round(wall_bitonic / wall_bucket, 3),
        "eff_bucket_p8": round(t1 / wall_bucket, 3),
        "eff_bitonic_p8": round(t1 / wall_bitonic, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
