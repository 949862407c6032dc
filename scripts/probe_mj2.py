"""Probe 2: decompose merge-join cost (sort vs window scan) and try
bigger blocks."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from eventql_tpu.kernels.join import merge_join_gid

ROUNDTRIP = 0.030
N = 1 << 24
NDIM = 1 << 18
K = 1024

rng = np.random.default_rng(11)
dim_keys = jnp.asarray(
    rng.permutation(np.arange(NDIM, dtype=np.uint64) * 2654435761 + 3)
)
dim_bucket = jnp.asarray(rng.integers(0, K, NDIM).astype(np.int32))
fact_keys = jnp.asarray(
    rng.integers(0, NDIM, N).astype(np.uint64) * 2654435761 + 3
)
fact_vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.uint64))
fact_mask = jnp.asarray(rng.random(N) < 0.8)
fact_sorted = jnp.sort(fact_keys)


def timeit(fn, *args, reps=2):
    out = fn(*args)
    _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - ROUNDTRIP, 1e-9) / reps


def report(name, per, **kw):
    print(json.dumps({"probe": name, "sec": round(per, 4),
                      "grows_per_sec": round(N / per / 1e9, 4), **kw}))


@jax.jit
def sort3(fk, fv, fm):
    def body(i, acc):
        s = jax.lax.sort(
            [fk + i.astype(jnp.uint64), fv.astype(jnp.uint64),
             fm.astype(jnp.uint8)],
            num_keys=1,
        )
        return acc + s[0][0] + s[1][-1]

    return jax.lax.fori_loop(0, 2, body, jnp.uint64(0))


report("sort3", timeit(sort3, fact_keys, fact_vals, fact_mask))


def scan_only(block, window):
    @jax.jit
    def pipe(fs, dk, db):
        def body(i, acc):
            gid = merge_join_gid(
                fs + i.astype(jnp.uint64), dk, db,
                block=block, window=window,
            )
            return acc + gid.sum()

        return jax.lax.fori_loop(0, 2, body, jnp.int64(0))

    per = timeit(pipe, fact_sorted, dim_keys, dim_bucket)
    report("window_scan", per, block=block, window=window)


scan_only(4096, 512)
scan_only(16384, 1024)
scan_only(16384, 2048)
scan_only(32768, 2048)
