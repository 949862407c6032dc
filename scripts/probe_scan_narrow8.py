"""Extend the physical-narrowing probe below 32 bits: u16 / u8 column
streams widened in-register (same methodology as probe_scan_narrow.py:
dynamic-slice per rep to force fresh HBM streams, relay RTT
calibration). If XLA streams sub-32-bit planes at full HBM rate, a
scan over narrow-valued columns runs 2-4x the u32 roofline."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

n = int(os.environ.get("BENCH_ROWS", 1 << 26))
reps = int(os.environ.get("BENCH_REPS", 32))
pad = 1024
rng = np.random.default_rng(3)
a_h = rng.integers(0, 1000, n + reps * pad).astype(np.uint64)  # fits u16
b_h = rng.integers(0, 1000, n + reps * pad).astype(np.uint64)
a8_h = rng.integers(0, 200, n + reps * pad).astype(np.uint64)  # fits u8
b8_h = rng.integers(0, 200, n + reps * pad).astype(np.uint64)


def make_pipe(thresh_a, thresh_b):
    @jax.jit
    def pipe(a, b):
        def body(i, acc):
            av = jax.lax.dynamic_slice(a, (i * pad,), (n,)).astype(jnp.uint64)
            bv = jax.lax.dynamic_slice(b, (i * pad,), (n,)).astype(jnp.uint64)
            ii = i.astype(jnp.uint64)
            mask = ((av + ii) < jnp.uint64(thresh_a)) & (bv >= jnp.uint64(thresh_b))
            return acc + mask.sum(dtype=jnp.int64)
        return jax.lax.fori_loop(0, reps, body, jnp.int64(0))
    return pipe


CASES = [
    ("u32", make_pipe(800, 100),
     (jnp.asarray(a_h.astype(np.uint32)), jnp.asarray(b_h.astype(np.uint32))), 8),
    ("u16", make_pipe(800, 100),
     (jnp.asarray(a_h.astype(np.uint16)), jnp.asarray(b_h.astype(np.uint16))), 4),
    ("u8", make_pipe(150, 20),
     (jnp.asarray(a8_h.astype(np.uint8)), jnp.asarray(b8_h.astype(np.uint8))), 2),
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
print(json.dumps({"relay_rtt_ms": round(rtt * 1e3, 2)}), flush=True)

for name, pipe, args, bpr in CASES:
    out = np.asarray(pipe(*args)); ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = np.asarray(pipe(*args))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - rtt, 1e-9) / reps
    print(json.dumps({
        "name": name,
        "grows_per_s": round(n / per / 1e9, 2),
        "sol_frac_at_own_bytes": round(n / per / (819e9 / bpr), 3),
        "wall_ms": round(min(ts) * 1e3, 1),
        "check": int(out),
    }), flush=True)
