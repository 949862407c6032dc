"""Measure the count(*)-only GROUP BY fast path vs sum+count on v5e."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.pallas_groupby import pallas_count, pallas_sum_count


def main():
    n = int(os.environ.get("BENCH_ROWS", 1 << 24))
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(os.environ.get("BENCH_REPS", 8))

    rng = np.random.default_rng(42)
    gid = jnp.asarray(rng.integers(0, n_keys, n).astype(np.int32))
    values_h = rng.integers(0, 1000, n).astype(np.uint64)
    values = jnp.asarray(values_h)
    threshold = jnp.uint64(800)
    value_bits = max(8, int(values_h.max()).bit_length() + 1)

    @jax.jit
    def pipe_count(gid, values, threshold):
        def body(i, acc):
            mask = values + i.astype(jnp.uint64) < threshold
            counts = pallas_count(mask, gid, n_keys)
            return acc + counts.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    @jax.jit
    def pipe_sumcount(gid, values, threshold):
        def body(i, acc):
            mask = values + i.astype(jnp.uint64) < threshold
            counts, sums = pallas_sum_count(
                mask, gid, values, n_keys, value_bits=value_bits)
            return acc + counts.sum() + sums.sum() * 0
        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    for name, pipe in [("count_only", pipe_count),
                       ("sum_count", pipe_sumcount)]:
        t0 = time.time()
        out = np.asarray(pipe(gid, values, threshold))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(pipe(gid, values, threshold))
            ts.append(time.perf_counter() - t0)
        per = max(min(ts) - 0.030, 1e-9) / reps
        print(json.dumps({"name": name, "K": n_keys,
                          "grows_per_s": round(n / per / 1e9, 3),
                          "compile_s": round(compile_s, 1),
                          "check": int(out)}), flush=True)


if __name__ == "__main__":
    main()
