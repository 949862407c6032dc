"""Probe: fused-predicate GROUP BY kernel ladder (VERDICT r3 item 2).

Compares, at the headline config (16.7M rows, K=1024, 16-bit values):
  a) round-3 pipeline: XLA-side mask + gid fold + u64 value stream
     feeding pallas_sum_count            (the 7.05 Grows/s headline)
  b) fused kernel, int32 gid + int32 value streams
  c) fused kernel, 16-bit gid + 16-bit value streams (narrowed storage)

Run on the real chip: python scripts/probe_fused_groupby.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from eventql_tpu.kernels.pallas_groupby import (
        pallas_sum_count,
        pallas_sum_count_fused,
    )

    n = int(os.environ.get("BENCH_ROWS", 1 << 24))
    n_keys = int(os.environ.get("BENCH_KEYS", 1024))
    reps = int(os.environ.get("BENCH_REPS", 8))
    rng = np.random.default_rng(42)
    gid_h = rng.integers(0, n_keys, n).astype(np.int32)
    values_h = rng.integers(0, 1000, n).astype(np.uint64)
    value_bits = max(8, int(values_h.max()).bit_length() + 1)
    thr0 = 800

    # host reference at thr0
    mask_h = values_h < thr0
    want_counts = np.bincount(gid_h[mask_h], minlength=n_keys)
    want_sums = np.bincount(
        gid_h[mask_h], weights=values_h[mask_h].astype(np.float64),
        minlength=n_keys,
    ).astype(np.uint64)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _relay_rtt

    rtt = _relay_rtt()
    print(f"relay rtt: {rtt*1e3:.2f} ms")

    def timeit(fn, *args):
        # np.asarray forces a real device->host readback (the axon
        # relay acks block_until_ready before compute completes); the
        # single relay round trip is subtracted like bench.py does
        out = fn(*args)
        _ = np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 1e-9) / reps, out

    # (a) round-3 pipeline
    gid = jnp.asarray(gid_h)
    values = jnp.asarray(values_h)
    thr = jnp.uint64(thr0)

    @jax.jit
    def pipe_a(gid, values, thr):
        def body(i, acc):
            mask = values + i.astype(jnp.uint64) < thr
            counts, sums = pallas_sum_count(
                mask, gid, values, n_keys, value_bits=value_bits
            )
            return acc + sums.sum() + counts.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    ta, _ = timeit(pipe_a, gid, values, thr)
    print(f"a) r3 pipeline (XLA mask + u64 stream): {n/ta/1e9:.2f} Grows/s")

    # (b) fused, i32 streams
    lo32 = jnp.asarray(values_h.astype(np.int32))
    gid32 = gid

    @jax.jit
    def pipe_b(gid, lo, thr):
        def body(i, acc):
            counts, sums = pallas_sum_count_fused(
                gid, lo, thr - i, jnp.int32(n), n_keys,
                value_bits=value_bits, pred_op="lt",
            )
            return acc + sums.sum() + counts.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    tb, _ = timeit(pipe_b, gid32, lo32, jnp.int32(thr0))
    print(f"b) fused kernel, i32 streams:           {n/tb/1e9:.2f} Grows/s")

    # correctness of fused at thr0
    c, s = pallas_sum_count_fused(
        gid32, lo32, jnp.int32(thr0), jnp.int32(n), n_keys,
        value_bits=value_bits, pred_op="lt",
    )
    assert np.array_equal(np.asarray(c), want_counts), "counts mismatch"
    assert np.array_equal(np.asarray(s), want_sums), "sums mismatch"
    print("   fused i32 exact vs host: OK")

    # (c) fused, 16-bit streams (narrowed storage widths)
    gid16 = jnp.asarray(gid_h.astype(np.int16))
    lo16 = jnp.asarray(values_h.astype(np.uint16))

    @jax.jit
    def pipe_c(gid, lo, thr):
        def body(i, acc):
            counts, sums = pallas_sum_count_fused(
                gid, lo, thr - i, jnp.int32(n), n_keys,
                value_bits=value_bits, pred_op="lt",
            )
            return acc + sums.sum() + counts.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    tc, _ = timeit(pipe_c, gid16, lo16, jnp.int32(thr0))
    print(f"c) fused kernel, 16-bit streams:        {n/tc/1e9:.2f} Grows/s")

    c, s = pallas_sum_count_fused(
        gid16, lo16, jnp.int32(thr0), jnp.int32(n), n_keys,
        value_bits=value_bits, pred_op="lt",
    )
    assert np.array_equal(np.asarray(c), want_counts), "counts mismatch(16)"
    assert np.array_equal(np.asarray(s), want_sums), "sums mismatch(16)"
    print("   fused 16-bit exact vs host: OK")

    # model denominator (bench.py): measured alpha/beta
    from eventql_tpu.kernels.pallas_groupby import _pick_k2

    nlimbs = -(-value_bits // 8)
    r_act = 1 + nlimbs
    k2 = _pick_k2(n_keys, nlimbs)
    lanes = 2 * k2 + 2 * r_act * (-(-n_keys // k2))
    attainable = 1.0 / (0.040e-9 + 254e-15 * lanes)
    print(f"model attainable: {attainable/1e9:.2f} Grows/s; fractions: "
          f"a={n/ta/attainable:.3f} b={n/tb/attainable:.3f} "
          f"c={n/tc/attainable:.3f}")


if __name__ == "__main__":
    main()
