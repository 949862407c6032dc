"""Worker for BENCH_CONFIG=scaling_ici: run one distributed op on an
N-virtual-device CPU mesh and print the min wall time (seconds).

argv: n_devices op n_per_shard
ops: groupby | sort | topk
"""

import os
import sys
import time

n_devices = int(sys.argv[1])
op = sys.argv[2]
n_per_shard = int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_devices} "
    + os.environ.get("XLA_FLAGS", "")
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_enable_x64", True)

from jax.sharding import Mesh  # noqa: E402

from eventql_tpu.parallel import distributed as D  # noqa: E402

devs = np.array(jax.devices())
assert len(devs) == n_devices, (len(devs), n_devices)
mesh = Mesh(devs, ("shards",))
n = n_per_shard * n_devices
rng = np.random.default_rng(7)

if op == "groupby":
    K = 1024
    gid = jnp.asarray(rng.integers(0, K, n).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1000, n, dtype=np.uint64))
    mask = jnp.ones(n, bool)

    def run():
        c, s = D.distributed_pallas_sum_count(mesh, mask, gid, vals, K)
        jax.block_until_ready(s)
        return s
elif op == "sort":
    keys = jnp.asarray(rng.integers(0, 1 << 63, n, dtype=np.uint64))
    pay = jnp.arange(n, dtype=jnp.int64)

    def run():
        (ok,), (opay,) = D.distributed_sort(mesh, (keys,), (pay,))
        jax.block_until_ready(opay)
        return opay
elif op == "topk":
    keys = jnp.asarray(rng.integers(0, 1 << 63, n, dtype=np.uint64))
    idx = jnp.arange(n, dtype=jnp.int64)

    def run():
        v, i = D.distributed_topk(mesh, keys, idx, 100)
        jax.block_until_ready(i)
        return i
else:
    raise SystemExit(f"unknown op {op}")

run()  # compile + warm
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    run()
    ts.append(time.perf_counter() - t0)
print(min(ts))
