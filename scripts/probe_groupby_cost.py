"""Probe: pallas hash-aggregate cost grid (VERDICT r2 items 2 + 7).

Measures pallas_count / pallas_sum_count across (num_buckets,
value_bits, k2) so that
  * the unbounded-key hash-GROUP-BY design (item 2) can be costed with
    real numbers: bucket-space size vs the multi-chunk penalty of the
    value limb planes, and
  * the headline roofline bracket (item 7) collapses to measured
    per-stage costs: count-only isolates the one-hot build + mask
    planes; the value_bits ladder prices each extra limb plane.

Each config is timed as a REPS-deep chain inside one jit (a loop-
carried tweak defeats CSE) because single calls finish under the axon
relay round-trip and measure as noise.

Run: python scripts/probe_groupby_cost.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 8
_RTT = None


def rtt():
    global _RTT
    if _RTT is None:
        nop = jax.jit(lambda x: x + 1)
        _ = np.asarray(nop(jnp.int32(0)))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(nop(jnp.int32(i)))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def timeit_chain(f, *args, iters=3):
    out = f(*args)
    _ = np.asarray(out)
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt(), 1e-9) / REPS


def main():
    from eventql_tpu.kernels.pallas_groupby import (
        pallas_count,
        pallas_sum_count,
    )

    n = 1 << 24
    rng = np.random.default_rng(11)
    gid_full = rng.integers(0, 1 << 20, n).astype(np.int32)
    vals = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    mask = jnp.ones(n, bool)

    print(f"n={n/1e6:.1f}M  backend={jax.default_backend()}  "
          f"({REPS}-chained)")

    def chain_count(K):
        @jax.jit
        def run(m, g):
            def body(i, carry):
                gg = g + (carry % jnp.int32(1))
                c = pallas_count(m, gg, K)
                return carry + c[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        return run

    def chain_sum(K, vb, k2=None):
        @jax.jit
        def run(m, g, v):
            def body(i, carry):
                gg = g + (carry % jnp.int32(1))
                c, s = pallas_sum_count(
                    m, gg, v, K, value_bits=vb, k2=k2
                )
                return carry + c[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        return run

    print("\n-- count-only (r_act=1) --")
    for K in (1024, 8192, 16384, 65536):
        gid = jnp.asarray(gid_full % K)
        dt = timeit_chain(chain_count(K), mask, gid)
        print(f"  K={K:>6}: {n/dt/1e9:7.3f} Grows/s")

    print("\n-- sum+count value_bits ladder --")
    for K in (1024, 8192, 16384):
        for vb in (16, 32, 48, 64):
            gid = jnp.asarray(gid_full % K)
            dt = timeit_chain(chain_sum(K, vb), mask, gid, vals)
            print(f"  K={K:>6} vb={vb:>2}: {n/dt/1e9:7.3f} Grows/s")

    print("\n-- k2 sweep at K=1024, vb=16 (item 7 one-hot width cost) --")
    for k2 in (32, 64, 128):
        gid = jnp.asarray(gid_full % 1024)
        dt = timeit_chain(chain_sum(1024, 16, k2), mask, gid, vals)
        print(f"  k2={k2:>4}: {n/dt/1e9:7.3f} Grows/s")


if __name__ == "__main__":
    main()
