"""Probe: bounded-key sort stage for the sort-merge big-dim join.
Same shapes as bench_join_bigdim (16.7M facts x 256K dims) but fact
keys confined to a < 2^32 span (dictionary-id-like), run with and
without the key_bound hint: the u32 sort key should lift the sort
stage (~65% of pipeline wall time, PERF.md)."""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from eventql_tpu.kernels.join import sorted_merge_join_aggregate

n = int(os.environ.get("BENCH_ROWS", 1 << 24))
ndim = int(os.environ.get("BENCH_DIM", 1 << 18))
n_keys = 1024
reps = int(os.environ.get("BENCH_REPS", 2))
rng = np.random.default_rng(17)
# bounded key universe: span = ndim * 977 ~ 2^28 < 2^32
dim_keys = jnp.asarray(
    rng.permutation(np.arange(ndim, dtype=np.uint64) * 977 + 3)
)
dim_bucket = jnp.asarray(rng.integers(0, n_keys, ndim).astype(np.int32))
fk_h = rng.integers(0, ndim, n).astype(np.uint64) * 977 + 3
fact_keys = jnp.asarray(fk_h)
vals_h = rng.integers(0, 1000, n).astype(np.uint64)
fact_vals = jnp.asarray(vals_h)
fact_mask = jnp.asarray(rng.random(n) < 0.8)
value_bits = max(8, int(vals_h.max()).bit_length() + 1)
bound = (int(fk_h.min()), int(fk_h.max()) + reps)


def make_pipe(key_bound):
    @jax.jit
    def pipe(fk, fv, fm, dk, db):
        def body(i, acc):
            counts, sums = sorted_merge_join_aggregate(
                fk + i.astype(jnp.uint64), fv, fm, dk, db, n_keys,
                value_bits=value_bits, key_bound=key_bound,
            )
            return acc + counts.sum() + sums.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.uint64(0))

    return pipe


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

results = {}
for name, kb in (("u64_key", None), ("u32_key", bound)):
    pipe = make_pipe(kb)
    out = np.asarray(pipe(fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket))
    results.setdefault("check", out.item())
    assert out.item() == results["check"], (name, out, results["check"])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(
            pipe(fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket)
        )
        best = min(best, time.perf_counter() - t0 - rtt)
    rate = n * reps / best
    print(json.dumps({"case": name, "grows_per_sec": round(rate / 1e9, 4)}))
