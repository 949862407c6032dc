"""Probe: distributed_sort step time on the virtual 8-device CPU mesh
(VERDICT r2 item 10 — record the exchange/compute restructuring's
step-time reduction).

Compares the bitonic-merge re-sort (log2 n rounds on the kept half)
against the previous full lax.sort per stage, same inputs, exactness
checked against a host argsort.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/probe_dist_sort.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from jax.sharding import Mesh

import eventql_tpu.parallel.distributed as D


def run(n_per_shard, use_merge, iters=3):
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("shards",))
    P = len(devs)
    n = n_per_shard * P
    rng = np.random.default_rng(42)
    keys = jnp.asarray(rng.integers(0, 1 << 63, n, dtype=np.uint64))
    pay = jnp.arange(n, dtype=jnp.int64)

    orig = D._bitonic_merge_resort
    if not use_merge:
        # force the old full-lax.sort path
        def full_sort(keys_l, pays_l, nk):
            ops = jax.lax.sort(
                list(keys_l) + list(pays_l), num_keys=nk
            )
            return tuple(ops[:nk]), tuple(ops[nk:])

        D._bitonic_merge_resort = full_sort
    try:
        f = lambda: D.distributed_sort(mesh, (keys,), (pay,))
        (ok,), (op,) = f()
        jax.block_until_ready(op)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            (ok,), (op,) = f()
            jax.block_until_ready(op)
            ts.append(time.perf_counter() - t0)
    finally:
        D._bitonic_merge_resort = orig
    # exactness
    kh = np.asarray(ok)
    want = np.sort(np.asarray(keys))
    assert (kh == want).all(), "sort mismatch"
    ph = np.asarray(op)
    assert (np.asarray(keys)[ph] == kh).all(), "payload mismatch"
    return min(ts), n


if __name__ == "__main__":
    for n_per_shard in (1 << 18, 1 << 20):
        t_old, n = run(n_per_shard, use_merge=False)
        t_new, _ = run(n_per_shard, use_merge=True)
        print(
            f"n={n/1e6:5.1f}M ({n_per_shard} per shard): "
            f"full-sort/stage {t_old*1000:7.1f} ms  "
            f"bitonic-merge/stage {t_new*1000:7.1f} ms  "
            f"speedup {t_old/t_new:4.2f}x"
        )
