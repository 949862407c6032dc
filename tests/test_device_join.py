"""Device join kernel tests."""

import jax.numpy as jnp
import numpy as np

from eventql_tpu.kernels.join import (
    build_side,
    dim_join_gather,
    fact_dim_join_aggregate,
    probe_ranges,
)


def test_probe_ranges():
    build = jnp.asarray(np.array([5, 1, 5, 9, 5, 1], dtype=np.uint64))
    sk, perm = build_side(build)
    probe = jnp.asarray(np.array([5, 2, 1, 9], dtype=np.uint64))
    start, count = probe_ranges(sk, probe)
    assert list(np.asarray(count)) == [3, 0, 2, 1]


def test_dim_join_gather():
    dim = jnp.asarray(np.array([10, 20, 30], dtype=np.uint64))
    sk, perm = build_side(dim)
    probe = jnp.asarray(np.array([20, 99, 10, 30, 30], dtype=np.uint64))
    idx, matched = dim_join_gather(sk, perm, probe)
    idx, matched = np.asarray(idx), np.asarray(matched)
    assert list(matched) == [True, False, True, True, True]
    assert list(idx[matched]) == [1, 0, 2, 2]


def test_fact_dim_join_aggregate():
    rng = np.random.default_rng(0)
    n_dim, n_fact, K = 200, 5000, 16
    dim_keys = rng.permutation(np.arange(1000, 1000 + n_dim)).astype(np.uint64)
    dim_bucket = rng.integers(0, K, n_dim).astype(np.int32)
    fact_keys = rng.integers(900, 1300, n_fact).astype(np.uint64)  # ~50% match
    fact_vals = rng.integers(0, 1000, n_fact).astype(np.uint64)
    fact_mask = rng.random(n_fact) < 0.8

    counts, sums = fact_dim_join_aggregate(
        jnp.asarray(fact_keys),
        jnp.asarray(fact_vals),
        jnp.asarray(fact_mask),
        jnp.asarray(dim_keys),
        jnp.asarray(dim_bucket),
        K,
    )
    counts, sums = np.asarray(counts), np.asarray(sums)

    dim_map = {int(k): int(b) for k, b in zip(dim_keys, dim_bucket)}
    exp_counts = np.zeros(K, np.uint64)
    exp_sums = np.zeros(K, np.uint64)
    for k, v, m in zip(fact_keys, fact_vals, fact_mask):
        if m and int(k) in dim_map:
            b = dim_map[int(k)]
            exp_counts[b] += 1
            exp_sums[b] += v
    assert (counts == exp_counts).all()
    assert (sums == exp_sums).all()


def test_fingerprint_join_gid():
    """Gather-free probe: fingerprint compare + int8 MXU payload
    extraction, exact incl. misses (kernels/join.py pallas_dim_join_gid)."""
    import numpy as np

    from eventql_tpu.kernels.join import (
        dim_fingerprints_unique,
        pallas_dim_join_gid,
    )

    rng = np.random.default_rng(13)
    nd, n = 777, 20000
    dim_keys = rng.permutation(np.arange(nd, dtype=np.uint64) * 104729 + 11)
    assert dim_fingerprints_unique(dim_keys)
    dim_bucket = rng.integers(0, 512, nd).astype(np.int32)
    fact = rng.integers(0, nd * 3, n).astype(np.uint64) * 104729 + 11
    gid = np.asarray(
        pallas_dim_join_gid(
            jnp.asarray(fact), jnp.asarray(dim_keys), jnp.asarray(dim_bucket)
        )
    )
    lut = {int(k): int(b) for k, b in zip(dim_keys, dim_bucket)}
    ref = np.array([lut.get(int(k), -1) for k in fact], dtype=np.int32)
    np.testing.assert_array_equal(gid, ref)
