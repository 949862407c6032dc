"""Sharded high-cardinality distributed GROUP BY
(parallel/distributed.py distributed_grouped_aggregate_sharded).

The replicated path mirrors the reference's coordinator merge
(sql/statements/select/groupby.cc:552-637); this one keeps the group
table sharded end to end for key counts beyond one chip. Exactness is
checked against a host reference on the virtual CPU mesh (conftest)."""

import numpy as np
import pytest

from eventql_tpu.parallel.distributed import (
    distributed_grouped_aggregate_sharded,
    make_mesh,
    shard_table,
)


def _host_expected(keys, vals, mask, kinds):
    out = {}
    for k, v, m in zip(keys, vals, mask):
        if not m:
            continue
        cur = out.get(int(k))
        if cur is None:
            cur = [0 if kd in ("sum", "count") else None for kd in kinds]
            out[int(k)] = cur
        for i, kd in enumerate(kinds):
            if kd == "sum":
                cur[i] += int(v)
            elif kd == "count":
                cur[i] += 1
            elif kd == "min":
                cur[i] = int(v) if cur[i] is None else min(cur[i], int(v))
            elif kd == "max":
                cur[i] = int(v) if cur[i] is None else max(cur[i], int(v))
    return out


def _collect(gk, aggs, valid):
    gk0 = np.asarray(gk[0])
    valid = np.asarray(valid)
    cols = [np.asarray(a) for a in aggs]
    got = {}
    keys_in_order = []
    for i in range(len(valid)):
        if valid[i]:
            k = int(gk0[i])
            assert k not in got, f"duplicate group {k} across shards"
            got[k] = [int(c[i]) for c in cols]
            keys_in_order.append(k)
    return got, keys_in_order


def _run(n_dev, keys, vals, mask, kinds):
    mesh = make_mesh(n_dev)
    keys_d, vals_d, mask_d = shard_table(mesh, [keys, vals, mask])
    gk, aggs, valid = distributed_grouped_aggregate_sharded(
        mesh, mask_d, (keys_d,), tuple(vals_d for _ in kinds), kinds
    )
    return _collect(gk, aggs, valid)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_exact_vs_host(n_dev):
    n = n_dev * 64
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 37, n).astype(np.uint64)
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    mask = rng.random(n) < 0.8
    kinds = ("sum", "count", "min", "max")
    got, order = _run(n_dev, keys, vals, mask, kinds)
    want = _host_expected(keys, vals, mask, kinds)
    assert got == want
    assert order == sorted(order)  # globally key-ordered across shards


def test_high_cardinality_groups_stay_sharded():
    # more distinct groups than one shard's table could hold after the
    # exchange: every row its own group
    n = 8 * 32
    keys = np.arange(n, dtype=np.uint64)
    vals = np.ones(n, dtype=np.uint64)
    mask = np.ones(n, dtype=bool)
    got, order = _run(8, keys, vals, mask, ("sum", "count"))
    assert len(got) == n
    assert all(v == [1, 1] for v in got.values())


def test_single_hot_key_spanning_every_shard():
    # one key owns 90% of rows: after pre-combine it is one entry per
    # shard; the sorted run of that key spans shards and the boundary
    # merge must chain through the middle shards
    n = 8 * 64
    rng = np.random.default_rng(5)
    keys = np.where(
        rng.random(n) < 0.9, 7, rng.integers(100, 140, n)
    ).astype(np.uint64)
    vals = rng.integers(0, 50, n).astype(np.uint64)
    mask = np.ones(n, dtype=bool)
    kinds = ("sum", "count", "min", "max")
    got, _ = _run(8, keys, vals, mask, kinds)
    assert got == _host_expected(keys, vals, mask, kinds)


def test_all_rows_one_group():
    n = 8 * 16
    keys = np.full(n, 3, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint64)
    mask = np.ones(n, dtype=bool)
    got, _ = _run(8, keys, vals, mask, ("sum", "count", "min", "max"))
    assert got == {3: [int(vals.sum()), n, 0, n - 1]}


def test_all_rows_filtered_out():
    n = 8 * 16
    keys = np.arange(n, dtype=np.uint64)
    vals = np.ones(n, dtype=np.uint64)
    mask = np.zeros(n, dtype=bool)
    got, _ = _run(8, keys, vals, mask, ("sum",))
    assert got == {}


def test_multi_key_group():
    n = 4 * 64
    rng = np.random.default_rng(9)
    k1 = rng.integers(0, 5, n).astype(np.uint64)
    k2 = rng.integers(0, 7, n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.uint64)
    mask = rng.random(n) < 0.9
    mesh = make_mesh(4)
    k1_d, k2_d, vals_d, mask_d = shard_table(mesh, [k1, k2, vals, mask])
    gk, aggs, valid = distributed_grouped_aggregate_sharded(
        mesh, mask_d, (k1_d, k2_d), (vals_d,), ("sum",)
    )
    g1, g2 = np.asarray(gk[0]), np.asarray(gk[1])
    v = np.asarray(valid)
    s = np.asarray(aggs[0])
    got = {
        (int(g1[i]), int(g2[i])): int(s[i]) for i in range(len(v)) if v[i]
    }
    want = {}
    for a, b, x, m in zip(k1, k2, vals, mask):
        if m:
            want[(int(a), int(b))] = want.get((int(a), int(b)), 0) + int(x)
    assert got == want


@pytest.mark.parametrize("dtype", [np.int32, np.int16])
def test_narrow_dtype_keys_exact(dtype):
    # dictionary-id / narrowed-column group keys: the mesh sort runs
    # them as uint32 via the static dtype bound — results must be
    # exact, including negative keys and masked rows
    n = 8 * 64
    rng = np.random.default_rng(31)
    info = np.iinfo(dtype)
    keys = rng.integers(info.min, int(info.max) + 1, n).astype(dtype)
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    mask = rng.random(n) < 0.8
    kinds = ("sum", "count", "min", "max")
    got, order = _run(8, keys, vals, mask, kinds)
    want = _host_expected(keys, vals, mask, kinds)
    assert got == want
    assert order == sorted(order)
