"""Probe: lax.sort / XLA gather / searchsorted throughput on the chip.

Decides the design for full ORDER BY sort and large-dim joins.
Methodology matches bench.py (fori_loop reps, perturbed inputs,
min-of-3 minus one relay round-trip).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

ROUNDTRIP = 0.030


def timeit(fn, *args, reps=1):
    out = fn(*args)
    _ = jax.tree_util.tree_map(np.asarray, out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = jax.tree_util.tree_map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - ROUNDTRIP, 1e-9) / reps


def probe_sort(n=1 << 24, reps=2, payload=False):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))

    @jax.jit
    def pipe(vals):
        def body(i, acc):
            v = vals + i.astype(jnp.uint64)
            if payload:
                iota = jnp.arange(n, dtype=jnp.int32)
                sv, sp = jax.lax.sort([v, iota], num_keys=1)
                return acc + sv[0] + sp[-1].astype(jnp.uint64)
            sv = jax.lax.sort(v)
            return acc + sv[0] + sv[-1]

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    per = timeit(pipe, vals, reps=reps)
    print(json.dumps({"probe": f"lax_sort_payload={payload}", "n": n,
                      "sec": round(per, 4),
                      "grows_per_sec": round(n / per / 1e9, 4)}))


def probe_sort32(n=1 << 24, reps=2):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))

    @jax.jit
    def pipe(vals):
        def body(i, acc):
            sv = jax.lax.sort(vals + i)
            return acc + sv[0] + sv[-1]

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    per = timeit(pipe, vals, reps=reps)
    print(json.dumps({"probe": "lax_sort_i32", "n": n,
                      "sec": round(per, 4),
                      "grows_per_sec": round(n / per / 1e9, 4)}))


def probe_gather(n=1 << 24, d=1024, reps=2):
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, d, n).astype(np.int32))
    table = jnp.asarray(rng.integers(0, 1 << 31, d).astype(np.int32))

    @jax.jit
    def pipe(idx, table):
        def body(i, acc):
            g = table[(idx + i) % d]
            return acc + g.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.int64(0))

    per = timeit(pipe, idx, table, reps=reps)
    print(json.dumps({"probe": "xla_gather", "n": n, "d": d,
                      "sec": round(per, 4),
                      "grows_per_sec": round(n / per / 1e9, 4)}))


def probe_searchsorted(n=1 << 24, d=1 << 14, reps=2):
    rng = np.random.default_rng(2)
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 62, d, dtype=np.uint64)))
    probes = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))

    @jax.jit
    def pipe(keys, probes):
        def body(i, acc):
            pos = jnp.searchsorted(keys, probes + i.astype(jnp.uint64))
            return acc + pos.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.int64(0))

    per = timeit(pipe, keys, probes, reps=reps)
    print(json.dumps({"probe": "searchsorted", "n": n, "d": d,
                      "sec": round(per, 4),
                      "grows_per_sec": round(n / per / 1e9, 4)}))


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sort"):
        probe_sort32()
        probe_sort()
        probe_sort(payload=True)
    if which in ("all", "gather"):
        probe_gather(d=1024)
        probe_gather(d=1 << 14)
        probe_gather(d=1 << 20)
    if which in ("all", "search"):
        probe_searchsorted()
