"""Headline benchmark: columnar scan + predicate filter + hash GROUP BY
aggregation throughput on one chip (BASELINE.json config 1).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is the fraction of per-chip speed-of-light, where SOL is
the HBM-bandwidth roofline for the minimum data movement of the query
(read keys u64 + values u64 = 16 B/row) at the chip's published
bandwidth. The reference publishes no numbers (BASELINE.md), so the
roofline is the denominator.
"""

import json
import os
import sys
import time

import numpy as np


def _hbm_bandwidth_bytes():
    # per-chip HBM bandwidth; v5e ≈ 819 GB/s (public spec)
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    table = {"v5e": 819e9, "v5p": 2765e9, "v4": 1228e9, "v6e": 1640e9}
    return table.get(gen, 819e9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from eventql_tpu.kernels.groupby import masked_grouped_aggregate

    n = int(os.environ.get("BENCH_ROWS", 1 << 22))
    n_keys = int(os.environ.get("BENCH_KEYS", 1024))

    rng = np.random.default_rng(42)
    keys = jnp.asarray(rng.integers(0, n_keys, n).astype(np.uint64))
    values = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint64))
    threshold = jnp.uint64(800)

    def pipeline(keys, values, threshold):
        mask = values < threshold
        gk, (sums, counts), first, ng = masked_grouped_aggregate(
            mask, (keys,), (values, values), ("sum", "count")
        )
        return gk[0], sums, counts, ng

    fn = jax.jit(pipeline)
    # warmup/compile
    out = fn(keys, values, threshold)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", 5))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(keys, values, threshold)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    rows_per_sec = n / dt
    sol_rows_per_sec = _hbm_bandwidth_bytes() / 16.0  # 16 B/row minimum
    print(
        json.dumps(
            {
                "metric": "scan_filter_groupby_rows_per_sec_per_chip",
                "value": round(rows_per_sec, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / sol_rows_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
