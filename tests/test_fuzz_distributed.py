"""Seeded randomized fuzz of the distributed tier on the virtual
8-device CPU mesh (conftest): distributed_grouped_aggregate,
distributed_grouped_aggregate_sharded, distributed_sort,
distributed_topk, and distributed_count_distinct against pure-numpy
references, over random shapes, masks, cardinalities (1 → beyond the
per-shard table), duplicate/adversarial key patterns, and mesh sizes
{1, 2, 4, 8}. Deterministic per seed.

These are the primitives every distributed SQL plan lowers to
(reference analogs: groupby.cc GroupByMerge, orderby.cc coordinator
sort, aggregate.cc count_distinct set-merge)."""

import random

import numpy as np
import pytest

import jax

from eventql_tpu.parallel.distributed import (
    distributed_count_distinct,
    distributed_grouped_aggregate,
    distributed_grouped_aggregate_sharded,
    distributed_sort,
    distributed_topk,
    make_mesh,
    shard_table,
)

AGG_KINDS = ["sum", "count", "min", "max"]


def _np_grouped(keys_cols, vals_cols, mask, kinds):
    """Pure-numpy reference: dict keyed by the key tuple."""
    out = {}
    n = len(mask)
    for i in range(n):
        if not mask[i]:
            continue
        kt = tuple(int(kc[i]) for kc in keys_cols)
        cur = out.get(kt)
        if cur is None:
            cur = []
            for kd in kinds:
                cur.append(0 if kd in ("sum", "count") else None)
            out[kt] = cur
        for j, kd in enumerate(kinds):
            v = int(vals_cols[j][i])
            if kd == "sum":
                cur[j] = (cur[j] + v) & 0xFFFFFFFFFFFFFFFF
            elif kd == "count":
                cur[j] += 1
            elif kd == "min":
                cur[j] = v if cur[j] is None else min(cur[j], v)
            elif kd == "max":
                cur[j] = v if cur[j] is None else max(cur[j], v)
    return out


def _gen_grouped_case(rng: random.Random):
    n_dev = rng.choice([1, 2, 4, 8])
    mesh = make_mesh(n_dev)
    per = rng.choice([8, 64, 512])
    n = n_dev * per
    npr = np.random.default_rng(rng.randrange(1 << 30))
    card = rng.choice([1, 2, 17, per, 4 * n])  # incl. nearly-all-distinct
    nkeys = rng.choice([1, 2])
    keys = [npr.integers(0, card, n).astype(np.uint64) for _ in range(nkeys)]
    if rng.random() < 0.2:  # near-wrap keys
        keys[0] = keys[0] + np.uint64((1 << 64) - 5 * card - 1)
    nvals = rng.randint(1, 3)
    vals = [npr.integers(0, 1 << 40, n).astype(np.uint64) for _ in range(nvals)]
    kinds = [rng.choice(AGG_KINDS) for _ in range(nvals)]
    mask = npr.random(n) < rng.choice([0.0, 0.3, 1.0])
    return mesh, n, keys, vals, kinds, mask


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_distributed_grouped_aggregate(seed):
    rng = random.Random(100 + seed)
    mesh, n, keys, vals, kinds, mask = _gen_grouped_case(rng)
    sharded = shard_table(mesh, [mask] + keys + vals)
    mask_d, keys_d, vals_d = sharded[0], sharded[1:1 + len(keys)], sharded[1 + len(keys):]
    gk, aggs, valid = distributed_grouped_aggregate(
        mesh, mask_d, tuple(keys_d), tuple(vals_d), tuple(kinds)
    )
    gk = [np.asarray(k) for k in gk]
    aggs = [np.asarray(a) for a in aggs]
    valid = np.asarray(valid)
    got = {}
    for i in range(len(valid)):
        if valid[i]:
            kt = tuple(int(k[i]) for k in gk)
            assert kt not in got, f"seed={seed}: duplicate group {kt}"
            got[kt] = [int(a[i]) & 0xFFFFFFFFFFFFFFFF for a in aggs]
    expected = _np_grouped(keys, vals, mask, kinds)
    assert got == expected, f"seed={seed} n={n} kinds={kinds}"


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_distributed_grouped_aggregate_sharded(seed):
    rng = random.Random(300 + seed)
    mesh, n, keys, vals, kinds, mask = _gen_grouped_case(rng)
    if mesh.shape["shards"] & (mesh.shape["shards"] - 1):
        pytest.skip("power-of-two meshes only")
    sharded = shard_table(mesh, [mask] + keys + vals)
    mask_d, keys_d, vals_d = sharded[0], sharded[1:1 + len(keys)], sharded[1 + len(keys):]
    gk, aggs, valid = distributed_grouped_aggregate_sharded(
        mesh, mask_d, tuple(keys_d), tuple(vals_d), tuple(kinds)
    )
    gk = [np.asarray(k) for k in gk]
    aggs = [np.asarray(a) for a in aggs]
    valid = np.asarray(valid)
    got = {}
    for i in range(len(valid)):
        if valid[i]:
            kt = tuple(int(k[i]) for k in gk)
            assert kt not in got, f"seed={seed}: group {kt} on two shards"
            got[kt] = [int(a[i]) & 0xFFFFFFFFFFFFFFFF for a in aggs]
    expected = _np_grouped(keys, vals, mask, kinds)
    assert got == expected, f"seed={seed} n={n} kinds={kinds}"


KEY_PATTERNS = ["uniform", "dups", "sorted", "reverse", "equal", "zipf"]


def _gen_keys(npr, pattern: str, n: int) -> np.ndarray:
    if pattern == "uniform":
        return npr.integers(0, 1 << 62, n).astype(np.uint64)
    if pattern == "dups":
        return npr.integers(0, 20, n).astype(np.uint64)
    if pattern == "sorted":
        return np.sort(npr.integers(0, 1 << 30, n)).astype(np.uint64)
    if pattern == "reverse":
        return np.sort(npr.integers(0, 1 << 30, n))[::-1].astype(np.uint64)
    if pattern == "equal":
        return np.full(n, 42, np.uint64)
    # zipf: heavy skew
    z = np.minimum(npr.zipf(1.3, n), 1 << 20)
    return z.astype(np.uint64)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_distributed_sort(seed):
    rng = random.Random(700 + seed)
    n_dev = rng.choice([1, 2, 4, 8])
    mesh = make_mesh(n_dev)
    n = n_dev * rng.choice([16, 64, 256])
    npr = np.random.default_rng(rng.randrange(1 << 30))
    nk = rng.choice([1, 2])
    keys = [_gen_keys(npr, rng.choice(KEY_PATTERNS), n) for _ in range(nk)]
    ids = np.arange(n, dtype=np.int64)
    sharded = shard_table(mesh, keys + [ids])
    keys_d, ids_d = sharded[:nk], sharded[nk]
    sk, (sp,) = distributed_sort(mesh, tuple(keys_d), (ids_d,))
    sk = [np.asarray(k) for k in sk]
    sp = np.asarray(sp)
    # globally ascending lexicographic
    for i in range(n - 1):
        a = tuple(int(k[i]) for k in sk)
        b = tuple(int(k[i + 1]) for k in sk)
        assert a <= b, f"seed={seed}: out of order at {i}"
    # exact multiset permutation of the input (keys, id) tuples
    got = sorted(zip(*[k.tolist() for k in sk], sp.tolist()))
    want = sorted(zip(*[k.tolist() for k in keys], ids.tolist()))
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_distributed_topk(seed):
    rng = random.Random(900 + seed)
    n_dev = rng.choice([1, 2, 4, 8])
    mesh = make_mesh(n_dev)
    n = n_dev * rng.choice([16, 128])
    k = rng.choice([1, 5, 16])
    npr = np.random.default_rng(rng.randrange(1 << 30))
    keys = _gen_keys(npr, rng.choice(KEY_PATTERNS), n)
    ids = np.arange(n, dtype=np.int64)
    keys_d, ids_d = shard_table(mesh, [keys, ids])
    tv, ti = distributed_topk(mesh, keys_d, ids_d, k)
    tv, ti = np.asarray(tv), np.asarray(ti)
    # top-k values must match the numpy top-k multiset (ids may permute
    # on ties, like the reference's unstable sort)
    want_vals = np.sort(keys)[::-1][:k]
    assert np.array_equal(tv, want_vals), f"seed={seed}"
    # each returned id must actually hold the returned key
    for v, i in zip(tv.tolist(), ti.tolist()):
        assert int(keys[i]) == v, f"seed={seed}: id {i} has {keys[i]} != {v}"


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_distributed_count_distinct(seed):
    rng = random.Random(1100 + seed)
    n_dev = rng.choice([1, 2, 4, 8])
    mesh = make_mesh(n_dev)
    n = n_dev * rng.choice([16, 64, 512])
    npr = np.random.default_rng(rng.randrange(1 << 30))
    keys = npr.integers(0, rng.choice([1, 7, 40]), n).astype(np.uint64)
    vals = npr.integers(0, rng.choice([2, 25, 1 << 30]), n).astype(np.uint64)
    mask = npr.random(n) < rng.choice([0.0, 0.5, 1.0])
    mask_d, keys_d, vals_d = shard_table(mesh, [mask, keys, vals])
    gk, counts, valid = distributed_count_distinct(
        mesh, mask_d, (keys_d,), vals_d
    )
    gk0 = np.asarray(gk[0])
    counts = np.asarray(counts)
    valid = np.asarray(valid)
    got = {
        int(gk0[i]): int(counts[i]) for i in range(len(valid)) if valid[i]
    }
    expected = {}
    for k_, v_, m_ in zip(keys, vals, mask):
        if m_:
            expected.setdefault(int(k_), set()).add(int(v_))
    expected = {k_: len(s) for k_, s in expected.items()}
    assert got == expected, f"seed={seed}"
