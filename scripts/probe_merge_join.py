"""Probe: sort-merge windowed join throughput on the chip at several
dim-table sizes and window widths."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.join import sorted_merge_join_aggregate

ROUNDTRIP = 0.030


def probe(n=1 << 24, ndim=1 << 18, K=1024, window=2048, block=4096, reps=2):
    rng = np.random.default_rng(11)
    dim_keys = jnp.asarray(
        rng.permutation(np.arange(ndim, dtype=np.uint64) * 2654435761 + 3)
    )
    dim_bucket = jnp.asarray(rng.integers(0, K, ndim).astype(np.int32))
    fact_keys = jnp.asarray(
        rng.integers(0, ndim, n).astype(np.uint64) * 2654435761 + 3
    )
    fact_vals = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint64))
    fact_mask = jnp.asarray(rng.random(n) < 0.8)

    @jax.jit
    def pipe(fk, fv, fm, dk, db):
        def body(i, acc):
            counts, sums = sorted_merge_join_aggregate(
                fk + i.astype(jnp.uint64),  # perturb: defeat loop hoisting
                fv + i.astype(jnp.uint64),
                fm, dk, db, K, block=block, window=window,
            )
            return acc + counts.sum() + sums.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    out = pipe(fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket)
    _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(pipe(fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - ROUNDTRIP, 1e-9) / reps
    print(json.dumps({"probe": "merge_join", "n": n, "ndim": ndim,
                      "window": window, "block": block,
                      "sec": round(per, 4),
                      "grows_per_sec": round(n / per / 1e9, 4)}))


if __name__ == "__main__":
    probe(ndim=1 << 18, window=2048)
    probe(ndim=1 << 18, window=512)
    probe(ndim=1 << 18, window=256, block=8192)
    probe(ndim=1 << 14, window=512)
    probe(ndim=1 << 20, window=512)
