"""Device ORDER BY ... LIMIT (top-k scan) route: host parity.

The route (device_exec.try_execute_device_scan_topk) evaluates scan +
WHERE + sort keys on device, picks the window with the top-k kernel
(single key) or the masked bitonic full sort (multi-key / the
passing-zero-key corner), and materializes the winning rows through
the host evaluator. These tests require IDENTICAL ResultLists vs the
pure host engine on every corner the key construction encodes:
NULL ordering, descending transforms (incl. INT64_MIN), string
dictionary ranks with the "NULL" literal, float -0.0/NaN, filters that
underfill the window, offsets, and the zero-key fallback.
"""

import os
import random

import numpy as np
import pytest

from eventql_tpu.core.types import SType
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.exec.runtime import RelationTableProvider, Runtime


def _run(provider, query: str, device: bool):
    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1" if device else "0"
    try:
        rt = Runtime()
        txn = rt.new_transaction(provider)
        res = rt.build_query_plan(txn, query).execute(0)
        return (res.columns, res.rows)
    finally:
        if prev is None:
            os.environ.pop("EVENTQL_TPU_DEVICE", None)
        else:
            os.environ["EVENTQL_TPU_DEVICE"] = prev


def _parity(provider, query: str):
    host = _run(provider, query, device=False)
    dev = _run(provider, query, device=True)
    assert host == dev, f"query={query!r}\nhost={host[1][:10]}\ndev ={dev[1][:10]}"
    return host


def _routed(provider, query: str) -> bool:
    """The device route actually fires for this plan (non-vacuity)."""
    from eventql_tpu.exec.device_exec import try_execute_device_scan_topk

    rt = Runtime()
    txn = rt.new_transaction(provider)
    plan = rt.build_query_plan(txn, query)
    node = plan.nodes[0]
    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1"
    try:
        return try_execute_device_scan_topk(node, txn) is not None
    finally:
        if prev is None:
            os.environ.pop("EVENTQL_TPU_DEVICE", None)
        else:
            os.environ["EVENTQL_TPU_DEVICE"] = prev


def _table(n=200, seed=7, with_nulls=True):
    npr = np.random.default_rng(seed)
    u = npr.integers(0, 50, n).astype(np.uint64)
    i = npr.integers(-25, 25, n).astype(np.int64)
    f = (npr.integers(-256, 256, n) / 32.0).astype(np.float64)
    b = npr.random(n) < 0.5
    sv = [
        [b"alpha", b"Beta", b"NULL", b"", b"zeta", b"m"][k]
        for k in npr.integers(0, 6, n)
    ]
    if with_nulls:
        null_at = npr.random(n) < 0.2
        u_valid = ~(npr.random(n) < 0.15)
        f_valid = ~(npr.random(n) < 0.15)
        sv = [None if m else v for v, m in zip(sv, null_at)]
    else:
        u_valid = np.ones(n, bool)
        f_valid = np.ones(n, bool)
    rel = Relation(
        ["u", "i", "f", "b", "s"],
        [
            Column(SType.UINT64, np.where(u_valid, u, 0).astype(np.uint64), u_valid),
            Column(SType.INT64, i, np.ones(n, bool)),
            Column(SType.FLOAT64, np.where(f_valid, f, 0.0), f_valid),
            Column(SType.BOOL, b, np.ones(n, bool)),
            Column.from_strings(sv),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    return p


def test_route_fires():
    p = _table()
    assert _routed(p, "select u, i from t order by u limit 5;")


@pytest.mark.parametrize(
    "key",
    ["u", "i", "f", "b", "s", "u desc", "i desc", "f desc", "s desc", "b desc"],
)
def test_single_key_parity(key):
    p = _table()
    # order by every remaining column too so ties are deterministic on
    # both engines (multi-key -> exercises the full-sort path as well)
    _parity(p, f"select u, i, f, b, s from t order by {key}, u, i, f, s limit 23;")


@pytest.mark.parametrize("key", ["u", "i desc", "f", "s"])
def test_single_key_only(key):
    """Pure single-key queries (the top-k fast path) on tie-free keys."""
    n = 64
    npr = np.random.default_rng(3)
    u = npr.permutation(n).astype(np.uint64)
    i = (npr.permutation(n) - 32).astype(np.int64)
    f = ((npr.permutation(n) - 31.5) / 8.0).astype(np.float64)
    sv = [b"s%03d" % k for k in npr.permutation(n)]
    rel = Relation(
        ["u", "i", "f", "s"],
        [
            Column(SType.UINT64, u, np.ones(n, bool)),
            Column(SType.INT64, i, np.ones(n, bool)),
            Column(SType.FLOAT64, f, np.ones(n, bool)),
            Column.from_strings(sv),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    _parity(p, f"select u, i, f, s from t order by {key} limit 10;")


def test_where_and_offset():
    p = _table()
    _parity(
        p,
        "select u, i from t where i > 0 and u < 40"
        " order by i desc, u, f, s limit 7 offset 5;",
    )
    _parity(p, "select u from t where u > 1000 order by u limit 5;")  # empty
    _parity(p, "select u from t order by u, i, f, s limit 0;")
    _parity(p, "select u from t order by u, i, f, s limit 10000;")
    _parity(p, "select u from t order by u, i, f, s limit 3 offset 10000;")


def test_computed_sort_exprs():
    p = _table()
    _parity(
        p,
        "select u, i, f from t where f > -5.0"
        " order by (i * -3) + u, f desc, u, s limit 19;",
    )


def test_int64_min_desc():
    """Descending INT64_MIN must sort LAST (the reference's compiled
    cmp); plain int64 negation would wrap it to first."""
    vals = np.array([5, -3, np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max],
                    dtype=np.int64)
    rel = Relation(
        ["i"], [Column(SType.INT64, vals, np.ones(len(vals), bool))], len(vals)
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    host = _parity(p, "select i from t order by i desc limit 5;")
    assert host[1][0][0] == str(np.iinfo(np.int64).max)
    assert host[1][-1][0] == str(np.iinfo(np.int64).min)


def test_string_null_vs_null_literal():
    """NULL strings sort as the literal "NULL" among the entries; a
    real b"NULL" value ties with it (host: stable, real entry first)."""
    sv = [b"NULL", None, b"NULA", b"NULM", None, b"NULL"]
    rel = Relation(["s"], [Column.from_strings(sv)], len(sv))
    p = RelationTableProvider()
    p.add_table("t", rel)
    _parity(p, "select s from t order by s limit 6;")
    _parity(p, "select s from t order by s desc limit 6;")


def test_passing_zero_key_corner():
    """A PASSING row whose top-key is 0 (host-LAST value: UINT64_MAX
    under ASC) while the filter underfills the window — the route must
    detect the tie with filtered rows and fall back to the exact sort."""
    n = 40
    u = np.arange(n).astype(np.uint64)
    u[-3:] = np.iinfo(np.uint64).max  # host-last values, passing
    flt = np.zeros(n, np.uint64)
    flt[: n // 2] = 1  # WHERE drops half -> window underfills
    rel = Relation(
        ["u", "flt"],
        [
            Column(SType.UINT64, u, np.ones(n, bool)),
            Column(SType.UINT64, flt, np.ones(n, bool)),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    # window w=40 >= n_pass: the max-valued rows are filtered IN only
    # partially; ask for everything so zero-key passing rows matter
    u2 = u.copy()
    flt2 = np.ones(n, np.uint64)
    flt2[5:10] = 0
    rel2 = Relation(
        ["u", "flt"],
        [
            Column(SType.UINT64, u2, np.ones(n, bool)),
            Column(SType.UINT64, flt2, np.ones(n, bool)),
        ],
        n,
    )
    p2 = RelationTableProvider()
    p2.add_table("t", rel2)
    for prov in (p, p2):
        _parity(prov, "select u from t where flt = 1 order by u limit 40;")
        _parity(prov, "select u from t where flt = 1 order by u limit 4;")


def test_full_order_route_fires():
    from eventql_tpu.exec.device_exec import try_execute_device_scan_order

    p = _table()
    rt = Runtime()
    txn = rt.new_transaction(p)
    plan = rt.build_query_plan(
        txn, "select u, i from t order by u, i, f, s;"
    )
    assert try_execute_device_scan_order(plan.nodes[0], txn) is not None


def test_full_order_parity():
    p = _table()
    _parity(p, "select u, i, f, b, s from t order by i desc, u, f, s;")
    _parity(p, "select u, s from t where u < 30 order by s, u, i, f;")
    _parity(p, "select u from t where u > 1000 order by u;")  # empty
    _parity(p, "select f, u from t order by f desc, u, i, s;")


def test_fuzz_scan_topk_parity():
    keys = ["u", "i", "f", "s", "b"]
    wheres = ["u < 30", "i >= 0", "f > 0.0", "u % 3 = 1"]
    for seed in range(25):
        rng = random.Random(4000 + seed)
        p = _table(n=rng.choice([1, 9, 100, 1500]), seed=seed)
        nk = rng.choice([1, 1, 2, 3])
        order = ", ".join(
            f"{k}{' desc' if rng.random() < 0.4 else ''}"
            for k in rng.sample(keys, nk)
        )
        # tiebreak on all columns for determinism
        rest = ", ".join(k for k in keys if k not in order)
        q = "select u, i, f, b, s from t"
        if rng.random() < 0.6:
            q += " where " + rng.choice(wheres)
        q += f" order by {order}, {rest}"
        if rng.random() < 0.75:
            q += f" limit {rng.choice([1, 3, 17, 400])}"
            if rng.random() < 0.3:
                q += f" offset {rng.choice([1, 5, 50])}"
        _parity(p, q + ";")
