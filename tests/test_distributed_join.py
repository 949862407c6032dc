"""Distributed fact-dim join + aggregate over the device mesh
(broadcast join: facts sharded, dims replicated, accumulators psum'd
over ICI). The reference's analog re-joins remote row streams on the
coordinator (hash_join.cc + ops/query_remote.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from eventql_tpu.parallel.distributed import (
    distributed_join_aggregate,
    make_mesh,
    shard_table,
)


def _expected(fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket, K):
    lut = {int(k): int(b) for k, b in zip(dim_keys, dim_bucket)}
    counts = np.zeros(K, np.uint64)
    sums = np.zeros(K, np.uint64)
    for k, v, m in zip(fact_keys, fact_vals, fact_mask):
        if not m or int(k) not in lut:
            continue
        b = lut[int(k)]
        counts[b] += 1
        sums[b] += np.uint64(v)
    return counts, sums


def test_distributed_join_aggregate_exact():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    n, n_dim, K = 8 * 4096, 300, 16
    rng = np.random.default_rng(2)
    dim_keys = rng.permutation(np.arange(n_dim, dtype=np.uint64) * 13 + 7)
    dim_bucket = rng.integers(0, K, n_dim).astype(np.int32)
    fact_keys = rng.integers(0, n_dim * 2, n).astype(np.uint64) * 13 + 7
    fact_vals = rng.integers(0, 1000, n).astype(np.uint64)
    fact_mask = rng.random(n) < 0.8

    fk, fv, fm = shard_table(mesh, [fact_keys, fact_vals, fact_mask])
    counts, sums = distributed_join_aggregate(
        mesh, fk, fv, fm,
        jnp.asarray(dim_keys), jnp.asarray(dim_bucket), K,
    )
    exp_counts, exp_sums = _expected(
        fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket, K
    )
    assert list(np.asarray(counts)) == list(exp_counts)
    assert list(np.asarray(sums)) == list(exp_sums)


def test_distributed_join_aggregate_compare_probe():
    """The gather-free compare probe under shard_map (interpret mode on
    the CPU mesh) must agree with the search probe."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    n, n_dim, K = 8 * 1024, 64, 8
    rng = np.random.default_rng(3)
    dim_keys = rng.permutation(np.arange(n_dim, dtype=np.uint64) * 9 + 1)
    dim_bucket = (np.arange(n_dim) % K).astype(np.int32)
    fact_keys = rng.integers(0, n_dim, n).astype(np.uint64) * 9 + 1
    fact_vals = rng.integers(0, 100, n).astype(np.uint64)
    fact_mask = np.ones(n, bool)

    from eventql_tpu.kernels.join import dim_fingerprints_unique

    assert dim_fingerprints_unique(dim_keys)

    fk, fv, fm = shard_table(mesh, [fact_keys, fact_vals, fact_mask])
    out = {}
    for probe in ("compare", "search"):
        counts, sums = distributed_join_aggregate(
            mesh, fk, fv, fm,
            jnp.asarray(dim_keys), jnp.asarray(dim_bucket), K, probe=probe,
        )
        out[probe] = (list(np.asarray(counts)), list(np.asarray(sums)))
    assert out["compare"] == out["search"]
    exp_counts, exp_sums = _expected(
        fact_keys, fact_vals, fact_mask, dim_keys, dim_bucket, K
    )
    assert out["search"] == (list(exp_counts), list(exp_sums))
