"""Probe 3: pallas window-join kernel configs on sorted input."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.join import merge_join_gid, sorted_merge_join_aggregate

ROUNDTRIP = 0.030
N = 1 << 24
NDIM = 1 << 18
K = 1024

rng = np.random.default_rng(11)
dim_keys = jnp.asarray(
    rng.permutation(np.arange(NDIM, dtype=np.uint64) * 2654435761 + 3)
)
dim_bucket = jnp.asarray(rng.integers(0, K, NDIM).astype(np.int32))
fact_sorted = jnp.sort(
    jnp.asarray(rng.integers(0, NDIM, N).astype(np.uint64) * 2654435761 + 3)
)
fact_keys = jnp.asarray(rng.integers(0, NDIM, N).astype(np.uint64) * 2654435761 + 3)
fact_vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.uint64))
fact_mask = jnp.asarray(rng.random(N) < 0.8)


def timeit(fn, *args, reps=2):
    out = fn(*args)
    _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - ROUNDTRIP, 1e-9) / reps


def probe_gid(block, window):
    @jax.jit
    def pipe(fs, dk, db):
        def body(i, acc):
            gid = merge_join_gid(fs + i.astype(jnp.uint64), dk, db,
                                 block=block, window=window)
            return acc + gid.sum()
        return jax.lax.fori_loop(0, 2, body, jnp.int64(0))

    per = timeit(pipe, fact_sorted, dim_keys, dim_bucket)
    print(json.dumps({"probe": "pallas_window_gid", "block": block,
                      "window": window, "sec": round(per, 4),
                      "grows_per_sec": round(N / per / 1e9, 4)}))


def probe_full(window):
    @jax.jit
    def pipe(fk, fv, fm, dk, db):
        def body(i, acc):
            counts, sums = sorted_merge_join_aggregate(
                fk + i.astype(jnp.uint64), fv, fm, dk, db, K,
                window=window, value_bits=11)
            return acc + counts.sum() + sums.sum()
        return jax.lax.fori_loop(0, 2, body, jnp.uint64(0))

    per = timeit(pipe, fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket)
    print(json.dumps({"probe": "full_agg", "window": window,
                      "sec": round(per, 4),
                      "grows_per_sec": round(N / per / 1e9, 4)}))


if __name__ == "__main__":
    probe_gid(16384, 1024)
    probe_gid(16384, 512)
    probe_full(512)
