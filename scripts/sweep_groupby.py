"""On-hardware (k2, block) sweep for the Pallas hash-aggregate kernel.

NEXT.md item 1: the shipping k2 comes from an analytic VPU cost model;
this measures the real optimum per (K, value_bits) on the actual chip.
Each variant is one remote Pallas compile (2-6 min through the relay),
so run under nohup and read the log.

Usage: python scripts/sweep_groupby.py [K] [value_max]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.pallas_groupby import pallas_sum_count


def main():
    n = int(os.environ.get("BENCH_ROWS", 1 << 24))
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    value_max = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    reps = int(os.environ.get("BENCH_REPS", 8))

    rng = np.random.default_rng(42)
    gid = jnp.asarray(rng.integers(0, n_keys, n).astype(np.int32))
    values_h = rng.integers(0, value_max, n).astype(np.uint64)
    values = jnp.asarray(values_h)
    threshold = jnp.uint64(int(value_max * 0.8))
    value_bits = max(8, int(values_h.max()).bit_length() + 1)

    def make_pipe(k2, block):
        @jax.jit
        def pipe(gid, values, threshold):
            def body(i, acc):
                mask = values + i.astype(jnp.uint64) < threshold
                counts, sums = pallas_sum_count(
                    mask, gid, values, n_keys, block=block,
                    value_bits=value_bits, k2=k2,
                )
                return acc + sums.sum() + counts.sum()

            return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

        return pipe

    variants = []
    for k2 in (32, 64, 128):
        variants.append((k2, 8192))
    for block in (16384, 32768):
        variants.append((None, block))  # model-picked k2 at bigger blocks

    results = []
    expected = None
    for k2, block in variants:
        t_start = time.time()
        pipe = make_pipe(k2, block)
        try:
            out = np.asarray(pipe(gid, values, threshold))
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            print(json.dumps({"k2": k2, "block": block,
                              "error": repr(e)[:200]}), flush=True)
            continue
        compile_s = time.time() - t_start
        if expected is None:
            expected = out
        assert out == expected, (k2, block, out, expected)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(pipe(gid, values, threshold))
            ts.append(time.perf_counter() - t0)
        per = max(min(ts) - 0.030, 1e-9) / reps
        grows = n / per / 1e9
        rec = {"k2": k2, "block": block, "grows_per_s": round(grows, 3),
               "compile_s": round(compile_s, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    results.sort(key=lambda r: -r["grows_per_s"])
    print("BEST:", json.dumps(results[0]), flush=True)


if __name__ == "__main__":
    main()
