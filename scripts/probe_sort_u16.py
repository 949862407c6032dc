"""Probe: does a u16 sort key beat the u32 tier for the full ORDER BY
permutation sort? The bitonic lax.sort is operand-width bound (PERF.md:
u64+i64 0.21 -> u32+i32 0.414 at 33M). Dictionary-id sort keys (string
ORDER BY) are often < 2^16, so a u16 key tier would apply to most
string sorts. Same methodology as the other probes: REPS inside one
jit with dynamic-slice perturbation, min-of-3, relay RTT subtracted.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

n = int(os.environ.get("BENCH_ROWS", 1 << 25))
reps = int(os.environ.get("BENCH_REPS", 4))
pad = 1024
rng = np.random.default_rng(5)
k_h = rng.integers(0, 1 << 14, n + reps * pad).astype(np.uint64)


def make_pipe(key_dtype):
    @jax.jit
    def pipe(k):
        def body(i, acc):
            kv = jax.lax.dynamic_slice(k, (i * pad,), (n,))
            iota = jnp.arange(n, dtype=jnp.int32)
            out = jax.lax.sort([kv, iota], num_keys=1, is_stable=True)
            return acc + out[1][0].astype(jnp.int64)

        return jax.lax.fori_loop(0, reps, body, jnp.int64(0))

    return pipe


CASES = [
    ("u64", jnp.asarray(k_h)),
    ("u32", jnp.asarray(k_h.astype(np.uint32))),
    ("u16", jnp.asarray(k_h.astype(np.uint16))),
]


@jax.jit
def _nop(x):
    return x + 1


_ = np.asarray(_nop(jnp.int32(0)))
rtts = []
for _i in range(5):
    t0 = time.perf_counter()
    _ = np.asarray(_nop(jnp.int32(_i)))
    rtts.append(time.perf_counter() - t0)
rtt = min(rtts)

for name, arr in CASES:
    pipe = make_pipe(arr.dtype)
    _ = np.asarray(pipe(arr))  # compile
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(pipe(arr))
        best = min(best, time.perf_counter() - t0 - rtt)
    rate = n * reps / best
    print(
        json.dumps(
            {"case": name, "grows_per_sec": round(rate / 1e9, 4), "n": n}
        )
    )
